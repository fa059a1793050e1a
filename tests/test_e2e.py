"""End-to-end driver tests on a synthetic ShapeNet-format tree (CPU, tiny).

Covers the full two-stage capability path:
  stage 1: train CoarseNet via the generic driver -> checkpoint families
  submodule split: best_IME_test / best_PD_test
  stage 2: warm-start LIST training with freezing
  inference: full-split test_all -> meshes + per-category CSV
"""

import os

import numpy as np
import pytest

from list_tpu.config import default_config
from list_tpu.data import generate_synthetic_shapenet
from list_tpu.train import checkpoints
from list_tpu.train.trainer import train
from list_tpu.infer.pipeline import test_all as run_test_all


@pytest.fixture(scope='module')
def env(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('e2e'))
    data_root = os.path.join(root, 'shapenet')
    generate_synthetic_shapenet(data_root, cats=('03001627',), n_shapes=2,
                                n_views=2, img_res=32, n_surface=1200)
    return root, data_root


def _cfg(root, data_root, **kw):
    base = dict(
        image_dir=os.path.join(data_root, 'images') + '/',
        h5_dir=os.path.join(data_root, 'sampled_points') + '/',
        mesh_dir=os.path.join(data_root, 'mesh') + '/',
        split_dir=os.path.join(data_root, 'split'),
        testlist_file=os.path.join(data_root, 'split', 'testlist_all.lst'),
        output_dir=os.path.join(root, 'results') + '/',
        catlist=['03001627'], viewnum=2, img_res=32, vox_res=16,
        sample_point_density=128, coarse_point_density=1000,
        train_batch_size=2, epochs=1, save_every_epoch=1,
        test_every_epoch=100,  # skip in-training eval for speed
        point_feat=[128, 8, 8, 3], point_degree=[2, 2, 4],
        im_enc_layers=[1, 1, 1, 1, 2, 4, 4, 4], sdf_scale=10.0,
        test_pointnum=1024, lr=1e-3, num_workers=2, chunk_l=2,
        test_cam_id=0)  # synthetic tree has views 00/01 only
    base.update(kw)
    return default_config(**base)


def test_stage1_coarsenet_training(env):
    root, data_root = env
    cfg = _cfg(root, data_root, exp_name='coarse_prediciton',
               model='network.models.CoarseNet',
               dataset='datasets.Datasets.IM2PointFarthest')
    train(cfg)
    assert os.path.exists(os.path.join(cfg.checkpoint_dir, 'model_1.ckpt'))
    assert os.path.exists(os.path.join(cfg.checkpoint_dir,
                                       'best_model_train.ckpt'))


def test_stage2_warmstart_list_training(env):
    root, data_root = env
    # split submodule checkpoints out of the stage-1 best model
    # (the reference's manual recipe, models.py:115-127)
    cfg1 = _cfg(root, data_root, exp_name='coarse_prediciton',
                model='network.models.CoarseNet',
                dataset='datasets.Datasets.IM2PointFarthest')
    from list_tpu.train.split_coarse import split_coarse_checkpoint
    split_coarse_checkpoint(
        os.path.join(cfg1.checkpoint_dir, 'best_model_train.ckpt'),
        cfg1.checkpoint_dir)
    assert os.path.exists(os.path.join(cfg1.checkpoint_dir,
                                       'best_IME_test.ckpt'))

    cfg2 = _cfg(root, data_root, exp_name='list_stage2',
                model='network.models.LIST',
                dataset='datasets.Datasets.IM2SDF', warm_start=True,
                sample_distribution=[0.45, 0.44, 0.1])
    train(cfg2)
    assert os.path.exists(os.path.join(cfg2.checkpoint_dir,
                                       'best_model_train.ckpt'))


def test_stage2_inference_pipeline(env):
    root, data_root = env
    cfg = _cfg(root, data_root, exp_name='list_stage2',
               model='network.models.LIST',
               dataset='datasets.Datasets.IM2SDF', eval_pred=True,
               test_checkpoint='best_model_train.ckpt',
               sample_distribution=[0.45, 0.44, 0.1])
    csv_path = run_test_all(cfg)
    assert csv_path is not None and os.path.exists(csv_path)
    with open(csv_path) as f:
        content = f.read()
    # one epoch of training on 2 shapes may legitimately produce an empty
    # iso-surface (eval returns {}, test.py:24-26 reference behavior), so
    # only the CSV structure is asserted, not specific metric columns.
    assert 'Mean' in content
    # meshes were written
    found = False
    for base, _, files in os.walk(cfg.results_dir):
        if any(f.endswith('_pred.obj') for f in files):
            found = True
    assert found


def test_stage2_inference_batched(env):
    """--infer_batch 2: grouped device decode produces the same sweep
    artifacts (meshes + CSV) as the per-shape path; cached meshes from the
    previous sweep exercise the mixed cached/uncached grouping."""
    root, data_root = env
    cfg = _cfg(root, data_root, exp_name='list_stage2',
               model='network.models.LIST',
               dataset='datasets.Datasets.IM2SDF', eval_pred=True,
               test_checkpoint='best_model_train.ckpt',
               sample_distribution=[0.45, 0.44, 0.1], infer_batch=2)
    # first sweep already ran in test_stage2_inference_pipeline -> cached
    # meshes; drop one pred to force a (cached, fresh) mixed group
    removed = 0
    for base, _, files in os.walk(cfg.results_dir):
        for f in files:
            if f.endswith('_pred.obj') and not removed:
                os.remove(os.path.join(base, f))
                removed += 1
    csv_path = run_test_all(cfg)
    assert csv_path is not None and os.path.exists(csv_path)
    n_meshes = sum(f.endswith('_pred.obj')
                   for base, _, files in os.walk(cfg.results_dir)
                   for f in files)
    assert n_meshes >= 2
