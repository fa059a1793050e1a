"""Grid generation and point-cloud voxelization.

Numerics match the reference exactly:
- ``create_grid_points_from_bounds`` (reference: utils.py:84-95): ``np.linspace``
  + ``'ij'`` meshgrid, flattened x-major, so flat index ``i*res**2 + j*res + k``
  is the grid point ``(x_i, y_j, z_k)``.
- The reference voxelizes a point cloud by nearest-neighbour lookup into a
  cKDTree built over that regular grid (reference: network/models.py:102-112,
  datasets/Datasets.py:286-291).  On a regular axis-aligned grid the Euclidean
  nearest neighbour decomposes per axis, so the same result is pure
  quantization ``round((p - bb_min)/step)`` with clamping — implemented here
  as an in-jit scatter.  This removes the reference's device->host->device
  round trip inside ``LIST.forward``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def create_grid_points_from_bounds(minimum: float, maximum: float, res: int) -> np.ndarray:
    """(res**3, 3) float64 grid points, x-major ('ij') order."""
    x = np.linspace(minimum, maximum, res)
    X, Y, Z = np.meshgrid(x, x, x, indexing='ij')
    return np.column_stack((X.ravel(), Y.ravel(), Z.ravel()))


def sample_grid_points(xnum: int, ynum: int, znum: int) -> np.ndarray:
    """Cell-centered grid points in [-0.5, 0.5]^3 (reference: utils.py:101-110)."""
    i, j, k = np.meshgrid(np.arange(xnum), np.arange(ynum), np.arange(znum),
                          indexing='ij')
    pts = np.stack([(i + 0.5) / xnum - 0.5,
                    (j + 0.5) / ynum - 0.5,
                    (k + 0.5) / znum - 0.5], axis=-1)
    return pts.reshape(-1, 3)


def voxel_indices(points: jnp.ndarray, bb_min: float, bb_max: float,
                  res: int) -> jnp.ndarray:
    """Nearest grid-point index per axis: (..., 3) int32 in [0, res-1].

    Equivalent to cKDTree(grid).query(points) on the regular grid from
    ``create_grid_points_from_bounds`` (separable Euclidean NN).
    """
    step = (bb_max - bb_min) / (res - 1)
    idx = jnp.round((points - bb_min) / step)
    return jnp.clip(idx, 0, res - 1).astype(jnp.int32)


def voxelize(points: jnp.ndarray, bb_min: float, bb_max: float, res: int,
             dtype=jnp.float32) -> jnp.ndarray:
    """Occupancy grid (..., res, res, res) from a point cloud (..., N, 3).

    Gradients are stopped, matching the reference's ``pc.detach()`` before
    voxelization (network/models.py:104).  Works under jit/vmap; the grid
    axis order is (x, y, z), identical to reshaping the reference's flat
    ``occ`` of grid-point indices (models.py:111).
    """
    points = jax.lax.stop_gradient(points)

    def _one(pc):  # pc: (N, 3)
        ijk = voxel_indices(pc, bb_min, bb_max, res)
        flat = (ijk[:, 0] * res + ijk[:, 1]) * res + ijk[:, 2]
        occ = jnp.zeros((res * res * res,), dtype=dtype)
        occ = occ.at[flat].set(jnp.ones((), dtype))
        return occ.reshape(res, res, res)

    batch_shape = points.shape[:-2]
    flat_pts = points.reshape((-1,) + points.shape[-2:])
    occ = jax.vmap(_one)(flat_pts)
    return occ.reshape(batch_shape + (res, res, res))


def reorder_and_scale_query(query: jnp.ndarray) -> jnp.ndarray:
    """The reference's query remap before the SDF decoder: ``q[:, :, [2,1,0]] * 2``
    (network/models.py:91-92, executors.py:217-218).

    World coords live in [-0.5, 0.5]; after the remap the first component is
    world-z scaled to [-1, 1], which is the normalized sampling coordinate for
    the last (z) axis of the (x, y, z)-ordered occupancy volume.
    """
    return query[..., [2, 1, 0]] * 2.0
