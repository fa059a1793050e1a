"""Pallas TPU kernel: fused 4-layer SDF decoder MLP.

The decoder tail 3610 -> 512 -> 256 -> 256 -> 1 (VoxelDecoder2 fc_0..fc_out,
reference network/modules.py:276-281) is evaluated over millions of query
points.  Running it as separate XLA matmuls materializes the 512/256/256
hidden activations in HBM (~8 GB of traffic per 128^3 grid).  This kernel
keeps ALL weights (~4.2 MB bf16) and the per-tile activations resident in
VMEM and streams query tiles: one HBM read of the 3610-d features, one HBM
write of the scalar SDF per query.

Grid: 1-D over query tiles.  Weights use constant index maps so Mosaic keeps
them in VMEM across grid steps; matmuls hit the MXU with f32 accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
            w4_ref, b4_ref, out_ref):
    x = x_ref[:]
    h = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b1_ref[:], 0.0).astype(x.dtype)
    h = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b2_ref[:], 0.0).astype(x.dtype)
    h = jnp.dot(h, w3_ref[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b3_ref[:], 0.0).astype(x.dtype)
    # final layer: (T, 256) @ (256, 1) -> keep 2-D (T, 1)
    o = jnp.dot(h, w4_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = o + b4_ref[:]


@functools.partial(jax.jit, static_argnames=('tile', 'interpret'))
def fused_sdf_mlp(x: jnp.ndarray, w1, b1, w2, b2, w3, b3, w4, b4,
                  tile: int = 1024, interpret: bool = False) -> jnp.ndarray:
    """x: (N, K) features; returns (N,) f32 SDF.

    N must be a multiple of ``tile`` (the dense-grid slab sizes are powers of
    two); weights are passed in the flax Dense layout (in, out).
    """
    n, k = x.shape
    assert n % tile == 0, (n, tile)
    d1 = w1.shape[1]
    d2 = w2.shape[1]
    d3 = w3.shape[1]
    dt = x.dtype

    def cdt(w):
        return w.astype(dt)

    grid = (n // tile,)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d1, d2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d2, d3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d3, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, cdt(w1), b1.reshape(1, -1).astype(jnp.float32),
      cdt(w2), b2.reshape(1, -1).astype(jnp.float32),
      cdt(w3), b3.reshape(1, -1).astype(jnp.float32),
      cdt(w4), b4.reshape(1, -1).astype(jnp.float32))
    return out[:, 0]


def sdf_mlp_reference(x, w1, b1, w2, b2, w3, b3, w4, b4) -> jnp.ndarray:
    """Plain-XLA fallback with identical numerics (tests compare both)."""
    dt = x.dtype
    h = jnp.maximum(
        jnp.dot(x, w1.astype(dt), preferred_element_type=jnp.float32)
        + b1.astype(jnp.float32), 0.0).astype(dt)
    h = jnp.maximum(
        jnp.dot(h, w2.astype(dt), preferred_element_type=jnp.float32)
        + b2.astype(jnp.float32), 0.0).astype(dt)
    h = jnp.maximum(
        jnp.dot(h, w3.astype(dt), preferred_element_type=jnp.float32)
        + b3.astype(jnp.float32), 0.0).astype(dt)
    o = jnp.dot(h, w4.astype(dt), preferred_element_type=jnp.float32) \
        + b4.astype(jnp.float32)
    return o[:, 0]
