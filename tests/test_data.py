"""Data pipeline tests: formats, transforms, loader, synthetic tree."""

import os

import numpy as np
import pytest

from list_tpu.config import default_config
from list_tpu.data import (DataLoader, IM2PointFarthest, IM2SDF,
                           SyntheticSDFDataset, generate_synthetic_shapenet)
from list_tpu.data.transforms import (ImageTransform, adjust_hue,
                                      adjust_saturation, to_float)


@pytest.fixture(scope='module')
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('synthnet'))
    generate_synthetic_shapenet(root, cats=('03001627',), n_shapes=2,
                                n_views=2, img_res=64, n_surface=1500)
    return root


def _config_for(root, **kw):
    return default_config(
        image_dir=os.path.join(root, 'images') + '/',
        h5_dir=os.path.join(root, 'sampled_points') + '/',
        mesh_dir=os.path.join(root, 'mesh') + '/',
        split_dir=os.path.join(root, 'split'),
        testlist_file=os.path.join(root, 'split', 'testlist_all.lst'),
        catlist=['03001627'], viewnum=2, img_res=64, vox_res=16,
        sample_point_density=256, coarse_point_density=1000, **kw)


def test_im2sdf_dataset(synth_root):
    cfg = _config_for(synth_root)
    ds = IM2SDF(cfg, 'train')
    assert len(ds) == 2
    item = ds[0]
    assert item['rgb_image'].shape == (64, 64, 3)
    # query mixing: rint([0.5,0.49,0.01] * 256) points
    expected_n = int(np.rint(np.array(cfg.sample_distribution) * 256).sum())
    assert item['points'].shape == (expected_n, 3)
    assert item['values'].shape == (expected_n,)
    assert item['occ'].shape == (16, 16, 16)
    assert set(np.unique(item['occ'])) <= {0.0, 1.0}


def test_im2sdf_occupancy_cached(synth_root):
    cfg = _config_for(synth_root)
    ds = IM2SDF(cfg, 'train')
    ds.ensure_occupancies()
    occ_file = os.path.join(os.path.dirname(ds.datalist[0]['h5_fn']),
                            'occupancies.h5')
    assert os.path.exists(occ_file)
    import h5py
    with h5py.File(occ_file, 'r') as f:
        assert f'res_{cfg.vox_res}_points_{cfg.coarse_point_density}' in f


def test_im2sdf_get_testdata(synth_root):
    cfg = _config_for(synth_root)
    ds = IM2SDF(cfg, 'test')
    batch = ds.get_testdata('03001627', 'synth0000', '00')
    assert batch['rgb_image'].shape == (1, 64, 64, 3)
    assert len(batch['gt_mesh'].vertices) > 10


def test_im2pointfarthest(synth_root):
    cfg = _config_for(synth_root)
    ds = IM2PointFarthest(cfg, 'train')
    item = ds[0]
    assert item['rgb_image'].shape == (64, 64, 3)
    assert item['pc'].shape == (5000, 3)
    img, pc = ds.get_testdata('03001627', 'synth0000', '01')
    assert img.shape == (1, 64, 64, 3) and pc.shape == (1, 5000, 3)


def test_dataloader_batching(synth_root):
    cfg = _config_for(synth_root)
    ds = IM2SDF(cfg, 'train')
    dl = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2)
    batches = list(dl)
    assert len(batches) == 1
    b = batches[0]
    assert b['rgb_image'].shape[0] == 2
    assert b['points'].ndim == 3


def test_synthetic_dataset_consistency():
    cfg = default_config(vox_res=16, sample_point_density=128, img_res=32)
    ds = SyntheticSDFDataset(cfg, 'train', n_shapes=2)
    item = ds[0]
    assert item['rgb_image'].shape == (32, 32, 3)
    # SDF near surface points should be small
    assert np.abs(item['values']).mean() < 0.1
    td = ds.get_testdata('synthetic', '0', 0)
    assert len(td['gt_mesh'].vertices) > 10


def test_transform_determinism(rng):
    img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
    t = ImageTransform(random_h_flip=True, color_jitter=True)
    a = t(img, np.random.default_rng(7))
    b = t(img, np.random.default_rng(7))
    np.testing.assert_array_equal(a, b)
    c = t(img, np.random.default_rng(8))
    assert not np.array_equal(a, c)


def test_hue_shift_roundtrip(rng):
    img = rng.rand(8, 8, 3).astype(np.float32)
    out = adjust_hue(adjust_hue(img, 0.3), -0.3)
    np.testing.assert_allclose(out, img, atol=1e-4)


def test_saturation_zero_is_gray(rng):
    img = rng.rand(8, 8, 3).astype(np.float32)
    g = adjust_saturation(img, 0.0)
    np.testing.assert_allclose(g[..., 0], g[..., 1], atol=1e-6)
    np.testing.assert_allclose(g[..., 1], g[..., 2], atol=1e-6)
