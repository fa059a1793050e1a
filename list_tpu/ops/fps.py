"""Farthest point sampling in pure JAX.

TPU-native replacement for ``pytorch3d.ops.sample_farthest_points`` (reference:
preprocessing/farthest_pointcloud.py:22), used by the offline FPS
preprocessing CLI.  Iterative argmax-of-min-distance under ``lax.fori_loop``;
O(K*N) distance updates vectorize on the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=('k',))
def farthest_point_sampling(points: jnp.ndarray, k: int,
                            start_idx: int = 0) -> jnp.ndarray:
    """Select ``k`` farthest points. points: (N, 3) -> indices (k,) int32.

    Deterministic: starts from ``start_idx`` (pytorch3d uses a random start
    unless given; we pin it for reproducibility).
    """
    n = points.shape[0]
    min_d2 = jnp.full((n,), jnp.inf, dtype=points.dtype)
    idxs = jnp.zeros((k,), dtype=jnp.int32).at[0].set(start_idx)

    def body(i, state):
        min_d2, idxs = state
        last = points[idxs[i - 1]]
        d2 = jnp.sum((points - last) ** 2, axis=-1)
        min_d2 = jnp.minimum(min_d2, d2)
        idxs = idxs.at[i].set(jnp.argmax(min_d2).astype(jnp.int32))
        return min_d2, idxs

    _, idxs = jax.lax.fori_loop(1, k, body, (min_d2, idxs))
    return idxs


def sample_farthest_points(points: jnp.ndarray, k: int) -> jnp.ndarray:
    """(N, 3) -> (k, 3) farthest point subset."""
    return points[farthest_point_sampling(points, k)]
