"""Grid generation and voxelization parity vs the reference formulas."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial import cKDTree

from list_tpu.ops import (create_grid_points_from_bounds, sample_grid_points,
                          voxelize, voxel_indices, reorder_and_scale_query)


def test_grid_points_ij_order():
    res = 4
    pts = create_grid_points_from_bounds(-0.5, 0.5, res)
    assert pts.shape == (64, 3)
    # x-major ('ij') ordering: flat index i*res^2 + j*res + k -> (x_i, y_j, z_k)
    x = np.linspace(-0.5, 0.5, res)
    np.testing.assert_allclose(pts[1], [x[0], x[0], x[1]])
    np.testing.assert_allclose(pts[res], [x[0], x[1], x[0]])
    np.testing.assert_allclose(pts[res * res], [x[1], x[0], x[0]])


def test_sample_grid_points_cell_centered():
    pts = sample_grid_points(2, 2, 2)
    assert pts.shape == (8, 3)
    np.testing.assert_allclose(pts[0], [-0.25, -0.25, -0.25])
    np.testing.assert_allclose(pts[-1], [0.25, 0.25, 0.25])


def test_voxelize_matches_kdtree(rng):
    """Quantization scatter == reference cKDTree NN on the regular grid
    (reference: network/models.py:102-112)."""
    res = 16
    grid = create_grid_points_from_bounds(-0.5, 0.5, res)
    tree = cKDTree(grid)
    pc = rng.uniform(-0.6, 0.6, size=(1, 200, 3)).astype(np.float32)

    # Reference path
    occ_ref = np.zeros(res ** 3, dtype=np.float32)
    _, idx = tree.query(pc[0])
    occ_ref[idx] = 1
    occ_ref = occ_ref.reshape(res, res, res)

    occ = np.asarray(voxelize(jnp.asarray(pc), -0.5, 0.5, res))[0]
    np.testing.assert_array_equal(occ, occ_ref)


def test_voxel_indices_clamping():
    pts = jnp.array([[-10.0, 0.0, 10.0]])
    idx = np.asarray(voxel_indices(pts, -0.5, 0.5, 8))
    assert idx[0, 0] == 0 and idx[0, 2] == 7


def test_reorder_and_scale():
    q = jnp.array([[[0.1, 0.2, 0.3]]])
    out = np.asarray(reorder_and_scale_query(q))
    np.testing.assert_allclose(out[0, 0], [0.6, 0.4, 0.2], rtol=1e-6)
