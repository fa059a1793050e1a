"""Evaluation metric parity on analytic shapes."""

import numpy as np

from list_tpu.eval import eval_mesh, eval_pointcloud, implicit_waterproofing
from list_tpu.utils import Mesh, generate_mesh, make_box, make_icosphere


def test_eval_pointcloud_identical(rng):
    pc = rng.rand(2000, 3).astype(np.float32)
    out = eval_pointcloud(pc, pc)
    assert out['chamfer_l2'] < 1e-9
    assert out['completeness'] < 1e-9
    for p in (0.5, 1.0, 5.0):
        assert out[f'fscore_{p}'] > 0.99


def test_eval_pointcloud_formulas(rng):
    """Cross-check chamfer/precision against direct NumPy computation."""
    pred = rng.rand(300, 3)
    gt = rng.rand(400, 3)
    out = eval_pointcloud(pred, gt)
    d2 = ((pred[:, None, :] - gt[None, :, :]) ** 2).sum(-1)
    acc = np.sqrt(d2.min(1))       # pred -> gt
    comp = np.sqrt(d2.min(0))      # gt -> pred
    chamfer = (0.5 * (comp ** 2).mean() + 0.5 * (acc ** 2).mean()) * 10000
    np.testing.assert_allclose(out['chamfer_l2'], chamfer, rtol=1e-6)
    np.testing.assert_allclose(out['accuracy'], acc.mean(), rtol=1e-6)
    np.testing.assert_allclose(out['completeness'], comp.mean(), rtol=1e-6)
    # NOTE reference quirk: precision normalized by len(pred) too
    np.testing.assert_allclose(out['precision_5.0'],
                               (comp < 0.05).sum() / len(pred), rtol=1e-6)
    np.testing.assert_allclose(out['recall_5.0'],
                               (acc < 0.05).sum() / len(pred), rtol=1e-6)


def test_implicit_waterproofing_sphere(rng):
    sph = make_icosphere(3, 0.4)
    pts = rng.uniform(-0.5, 0.5, (5000, 3))
    occ, holes = implicit_waterproofing(sph, pts)
    expected = np.linalg.norm(pts, axis=1) < 0.4
    # small disagreement only near the polyhedral surface
    assert (occ == expected).mean() > 0.995


def test_eval_mesh_self_iou():
    sph = make_icosphere(2, 0.35)
    out = eval_mesh(sph, sph, -0.5, 0.5, n_points=5000,
                    rng=np.random.RandomState(0))
    assert out['iou'] > 0.95
    # 5k samples on a r=0.35 sphere have ~0.017 spacing -> chamfer_l2 ~ 1.0
    assert out['chamfer_l2'] < 2.0
    assert out['fscore_5.0'] > 0.99


def test_eval_mesh_different_radii():
    a = make_icosphere(3, 0.30)
    b = make_icosphere(3, 0.40)
    out = eval_mesh(a, b, -0.5, 0.5, n_points=5000,
                    rng=np.random.RandomState(0))
    # analytic IoU of concentric spheres: (r1/r2)^3
    expected_iou = (0.30 / 0.40) ** 3
    assert abs(out['iou'] - expected_iou) < 0.03
    # chamfer: every point ~0.1 from the other surface -> 0.5*(0.01+0.01)*1e4=100
    assert 70 < out['chamfer_l2'] < 130


def test_generate_mesh_roundtrip_eval():
    """SDF grid -> mesh -> metrics vs the analytic sphere."""
    res = 64
    x = np.linspace(-0.5, 0.5, res)
    X, Y, Z = np.meshgrid(x, x, x, indexing='ij')
    sdf = np.sqrt(X ** 2 + Y ** 2 + Z ** 2) - 0.35
    mesh = generate_mesh(sdf, -0.5, 0.5, as_trimesh_obj=True, renorm='exact')
    gt = make_icosphere(4, 0.35)
    out = eval_mesh(mesh, gt, -0.5, 0.5, n_points=10000,
                    rng=np.random.RandomState(0))
    assert out['iou'] > 0.95
    assert out['chamfer_l2'] < 0.5
