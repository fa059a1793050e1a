"""Pix3D dataset tests on a synthetic Pix3D-format tree
(reference layout: datasets/Datasets.py:307-497)."""

import json
import os

import h5py
import numpy as np
import pytest

from list_tpu.config import default_config
from list_tpu.data import Pix3D
from list_tpu.data.synthetic import SyntheticShape


@pytest.fixture(scope='module')
def pix3d_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('pix3d'))
    rng = np.random.RandomState(333)
    data = os.path.join(root, 'data')
    os.makedirs(os.path.join(root, 'splits'), exist_ok=True)

    metadatas = []
    split_train = []
    for i in range(2):
        cat = 'chair'
        model_folder = f'model{i:03d}.model'
        img_name = f'{i:04d}'
        shape = SyntheticShape(rng)
        mesh = shape.mesh(32)

        img_dir = os.path.join(data, 'img', cat, model_folder)
        sp_dir = os.path.join(data, 'sampled_points', cat, model_folder)
        iso_dir = os.path.join(data, 'isosurface', cat, model_folder)
        for d in (img_dir, sp_dir, iso_dir):
            os.makedirs(d, exist_ok=True)

        img = (shape.render(64) * 255).astype(np.uint8)
        np.save(os.path.join(img_dir, img_name + '.npy'), img)

        surface = mesh.sample(1200, rng=rng)
        with h5py.File(os.path.join(sp_dir, 'sampled_points.h5'), 'w') as f:
            f.create_dataset('grid_points', data=surface)
            for s in (0.003, 0.01, 0.07):
                q = surface + s * rng.randn(len(surface), 3)
                sdf = shape.sdf(q)
                f.create_dataset(f'query_points_sigma_{s}',
                                 data=np.concatenate([q, sdf[:, None]], 1))
        mesh.export(os.path.join(iso_dir, 'isosurf_scaled.obj'))
        from list_tpu.utils.meshio import write_ply
        write_ply(os.path.join(iso_dir, 'mesh_org.ply'), mesh.vertices,
                  mesh.faces)

        # pix3d.json metadata entry (img path format: img/<cat>/<file>)
        metadatas.append({'category': cat,
                          'img': f'img/{cat}/{img_name}.png',
                          'model': f'model/{cat}/model{i:03d}/model.obj'})
        split_train.append(f'img/{img_name}.png')

    # NOTE: model_folder in the reference is derived as
    # '.'.join(splitext(model)[0].split('/')[-2:]) -> 'model000.model'
    with open(os.path.join(data, 'pix3d.json'), 'w') as f:
        json.dump(metadatas, f)
    for mode in ('train', 'test'):
        with open(os.path.join(root, 'splits', mode + '.json'), 'w') as f:
            json.dump(split_train, f)
    return root


def _cfg(root):
    return default_config(data_dir=root, catlist=['chair'], vox_res=16,
                          sample_point_density=128,
                          coarse_point_density=500)


def test_pix3d_loading(pix3d_root):
    ds = Pix3D(_cfg(pix3d_root), 'train')
    assert len(ds) == 2
    item = ds[0]
    assert item['rgb_image'].shape == (224, 224, 3)
    n = int(np.rint(np.asarray([0.5, 0.49, 0.01]) * 128).sum())
    assert item['points'].shape == (n, 3)
    assert item['occ'].shape == (16, 16, 16)
    assert item['pc'].shape == (500, 3)


def test_pix3d_get_testdata(pix3d_root):
    ds = Pix3D(_cfg(pix3d_root), 'test')
    info = ds.datalist[0]
    batch = ds.get_testdata(info['cat_id'], info['shape_id'],
                            os.path.splitext(info['img_id'])[0])
    assert batch['rgb_image'].shape == (1, 224, 224, 3)
    assert len(batch['gt_mesh'].vertices) > 10
    assert batch['pc'].shape == (500, 3)


def test_pix3d_occ_cached(pix3d_root):
    cfg = _cfg(pix3d_root)
    ds = Pix3D(cfg, 'train')
    _ = ds[0]
    occ_file = os.path.join(os.path.dirname(ds.datalist[0]['query_path']),
                            'occupancies.h5')
    assert os.path.exists(occ_file)


def test_pix3d_ensure_occupancies(pix3d_root):
    cfg = _cfg(pix3d_root)
    ds = Pix3D(cfg, 'train')
    ds.ensure_occupancies()
    for d in ds.datalist:
        occ_file, key = ds._occ_cache(d['query_path'])
        with h5py.File(occ_file, 'r') as f:
            assert key in f
    # __getitem__ must now be a pure read (no mid-epoch h5 writes)
    mtimes = {d['query_path']: os.path.getmtime(
        ds._occ_cache(d['query_path'])[0]) for d in ds.datalist}
    for i in range(len(ds)):
        _ = ds[i]
    for d in ds.datalist:
        assert os.path.getmtime(ds._occ_cache(d['query_path'])[0]) \
            == mtimes[d['query_path']]


def test_pix3d_train_and_infer_smoke(pix3d_root, tmp_path):
    """Stage-2 LIST training + full-split inference on the Pix3D pipeline
    (reference recipe: README.md:110; the e2e gap flagged in round 1)."""
    from list_tpu.train.trainer import train
    from list_tpu.infer.pipeline import test_all

    cfg = default_config(
        data_dir=pix3d_root, catlist=['chair'], vox_res=16, img_res=32,
        sample_point_density=128, coarse_point_density=500,
        point_feat=[128, 8, 8, 3], point_degree=[2, 2, 4],
        im_enc_layers=[1, 1, 1, 1, 2, 4, 4, 4], sdf_scale=10.0,
        train_batch_size=2, epochs=1, save_every_epoch=1,
        test_every_epoch=100, test_pointnum=512, num_workers=2,
        output_dir=str(tmp_path) + '/', exp_name='pix3d_smoke',
        model='network.models.LIST', dataset='datasets.Datasets.Pix3D',
        testlist_file='', chunk_l=2)
    train(cfg)
    assert os.path.exists(os.path.join(cfg.checkpoint_dir,
                                       'best_model_train.ckpt'))
    csv = test_all(cfg)
    preds = [os.path.join(p, f)
             for p, _, fs in os.walk(cfg.results_dir) for f in fs
             if f.endswith('_pred.obj')]
    assert preds, 'no predicted meshes written'
    assert csv is None  # eval_pred off -> no CSV, but meshes exist
