"""Config/registry parity with the reference CLI (arguments.py:4-133)."""

import os

from list_tpu import registry
from list_tpu.config import CATLIST_13, default_config, get_args


def test_reference_defaults():
    cfg = default_config()
    # spot-check reference defaults (arguments.py)
    assert cfg.viewnum == 36
    assert cfg.img_res == 224
    assert cfg.test_pointnum == 65536
    assert cfg.lr == 0.0001
    assert cfg.beta1 == 0.9
    assert cfg.train_batch_size == 12
    assert cfg.epochs == 300
    assert cfg.coarse_point_density == 10000
    assert cfg.sample_point_density == 32768
    assert cfg.sdf_scale == 1.0
    assert cfg.weight_decay == 1e-5
    assert cfg.sigmas == [0.003, 0.01, 0.07]
    assert cfg.sample_distribution == [0.5, 0.49, 0.01]
    assert cfg.point_feat == [128, 128, 256, 256, 256, 128, 128, 3]
    assert cfg.point_degree == [2, 2, 2, 2, 2, 2, 64]
    assert cfg.im_enc_layers == [1, 1, 1, 1, 16, 32, 64, 128, 128]
    assert cfg.bb_min == -0.5 and cfg.bb_max == 0.5
    assert cfg.vox_res == 128
    assert len(cfg.catlist) == 13 and cfg.catlist == CATLIST_13


def test_cli_parsing_reference_command():
    """The reference's stage-2 command parses unchanged (README.md:104)."""
    argv = ['--model', 'network.models.LIST',
            '--dataset', 'datasets.Datasets.IM2SDF',
            '--exp_name', 'list', '--train_batch_size', '8',
            '--sample_distribution', '0.45', '0.44', '0.1',
            '--sdf_scale', '10', '--warm_start', '--color_jitter',
            '--normalize', '--eval_pred']
    cfg = get_args(argv)
    assert cfg.model == 'network.models.LIST'
    assert cfg.sample_distribution == [0.45, 0.44, 0.1]
    assert cfg.sdf_scale == 10.0
    assert cfg.warm_start and cfg.color_jitter and cfg.eval_pred
    assert cfg.checkpoint_dir == './results/list/checkpoints/'


def test_testlist_loading():
    """First 30 lines of testlist_all.lst filtered by catlist
    (arguments.py:110-125)."""
    cfg = default_config()
    if os.path.exists(cfg.testlist_file):
        assert 0 < len(cfg.testlist) <= 30
        item = cfg.testlist[0]
        assert set(item) == {'cat_id', 'shape_id', 'cam_id'}
        assert item['cat_id'] in cfg.catlist


def test_registry_reference_paths():
    from list_tpu.models import CoarseNet, LIST
    from list_tpu.train.executors import CoarseNetExecutor, LISTExecutor
    from list_tpu.data import IM2SDF, Pix3D
    assert registry.get_class('network.models.LIST') is LIST
    assert registry.get_class('network.models.CoarseNet') is CoarseNet
    assert registry.get_class('datasets.Datasets.IM2SDF') is IM2SDF
    assert registry.get_class('datasets.Datasets.Pix3D') is Pix3D
    assert registry.get_class(
        registry.executor_for('network.models.LIST')) is LISTExecutor
    assert registry.get_class(
        registry.executor_for('list_tpu.models.CoarseNet')) \
        is CoarseNetExecutor


def test_alias_package_imports():
    import learning_implicitly_from_spatial_transformers_network_tpu as pkg
    assert hasattr(pkg, 'models') and hasattr(pkg, 'ops')
    from learning_implicitly_from_spatial_transformers_network_tpu.models \
        import LIST  # noqa: F401


def test_compiler_hostile_values_rejected():
    """Values measured to crash the XLA TPU compiler fail at parse time
    (r3 A/B: fuse_sample_gathers in (3, 6) -> remote-compile abort)."""
    import warnings

    import pytest

    with pytest.raises(ValueError, match='fuse_sample_gathers'):
        default_config(fuse_sample_gathers=3)
    with pytest.raises(ValueError, match='fuse_sample_gathers'):
        get_args(['--fuse_sample_gathers', '6'])
    with pytest.raises(ValueError, match='train_query_chunks'):
        default_config(train_query_chunks=0)
    with pytest.warns(RuntimeWarning, match='train_query_chunks 2'):
        default_config(train_query_chunks=2, train_batch_size=8)
    # safe combos stay silent
    with warnings.catch_warnings():
        warnings.simplefilter('error')
        default_config(fuse_sample_gathers=1, train_query_chunks=2,
                       train_batch_size=4)
        default_config(train_query_chunks=4, train_batch_size=8)
