"""Pallas TPU kernel: fused SDF-decoder head for the dense-grid path.

Consumes what the dense-grid pipeline (ops/dense_grid.py) already produces
per slab — per-scale displacement-tap stacks in **t-major** layout
(7, n, C_s), the pre-projected perceptual features (n, 512) and the
normalized query coords (n, 3) — and evaluates fc_0 (42 per-tap partial
matmuls accumulated in VMEM), bias + ReLU, and the fc_1/fc_2/fc_out tail,
all without touching HBM between layers.

Why t-major: the banded tap einsum is a batched-over-tap matmul whose
natural output layout is (t, n, C).  Round 2 transposed it to (n, 7*C) to
feed one matmul per scale — profiling showed that transpose materializing
~21 GB per 128^3 grid was the single largest decode cost (~0.2 s).  Here
the kernel accepts the einsum's native layout and contracts tap-by-tap:
acc += stack[t] @ W1[t] (K = C_s, up to 128 — fine MXU shapes for the
scales that carry the FLOPs).

Reference semantics: VoxelDecoder2 (network/modules.py:247-282) — the tap
stacks and fc_0 row blocks are produced by ops/dense_grid.py with the
reference (scale, disp, channel) ordering.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OUT_PAD = 128  # fc_out padded to 128 lanes; caller slices column 0.


def _kernel(n_scales, channels):
    def kernel(*refs):
        # refs: [stack_0..stack_{S-1} (7, T, C_s), percep, qxyz,
        #        w1_0..w1_{S-1} (7, C_s, 512), w1_xyz, b1,
        #        w2, b2, w3, b3, w4pad, b4pad, out, acc_scratch]
        stacks = refs[:n_scales]
        percep = refs[n_scales]
        qxyz = refs[n_scales + 1]
        w1s = refs[n_scales + 2:2 * n_scales + 2]
        (w1_xyz, b1, w2, b2, w3, b3, w4, b4, out, acc) = \
            refs[2 * n_scales + 2:]

        # perceptual part is pre-projected through fc_0's percep rows
        acc[:] = percep[:].astype(jnp.float32)
        for s in range(n_scales):
            for t in range(7):
                if channels[s] == 1:
                    # K=1 matmul legalizes poorly; broadcast FMA instead
                    acc[:] += (stacks[s][t].astype(jnp.float32)
                               * w1s[s][t].astype(jnp.float32))
                else:
                    acc[:] += jnp.dot(stacks[s][t], w1s[s][t],
                                      preferred_element_type=jnp.float32)
        # xyz rows: (T, 3) @ (3, 512) — tiny, do as explicit broadcast sum
        q = qxyz[:].astype(jnp.float32)  # (T, 8) padded; cols 0..2 valid
        wx = w1_xyz[:]  # (8, 512) padded rows
        acc[:] += (q[:, 0:1] * wx[0:1, :] + q[:, 1:2] * wx[1:2, :]
                   + q[:, 2:3] * wx[2:3, :] + b1[:])

        dt = stacks[0].dtype
        h = jnp.maximum(acc[:], 0.0).astype(dt)
        h = jnp.dot(h, w2[:], preferred_element_type=jnp.float32) + b2[:]
        h = jnp.maximum(h, 0.0).astype(dt)
        h = jnp.dot(h, w3[:], preferred_element_type=jnp.float32) + b3[:]
        h = jnp.maximum(h, 0.0).astype(dt)
        o = jnp.dot(h, w4[:], preferred_element_type=jnp.float32)
        out[:] = o + b4[:]
    return kernel


def _stack_kernel(n_parts, has_coarse):
    def kernel(*refs):
        # refs: [part_0..part_{P-1} (T, K_i), coarse? (T, 512),
        #        percep4 (4, T, 512), qxyz (T, 8),
        #        w1_0..w1_{P-1} (K_i, 512),
        #        w1_xyz, b1, w2, b2, w3, b3, w4pad, b4pad, out, acc]
        i = 0
        parts = refs[:n_parts]; i += n_parts
        coarse = None
        if has_coarse:
            coarse = refs[i]; i += 1
        percep = refs[i]; i += 1
        qxyz = refs[i]; i += 1
        w1s = refs[i:i + n_parts]; i += n_parts
        (w1_xyz, b1, w2, b2, w3, b3, w4, b4, out, acc) = refs[i:]

        acc[:] = jnp.dot(parts[0][:], w1s[0][:],
                         preferred_element_type=jnp.float32)
        for p in range(1, n_parts):
            acc[:] += jnp.dot(parts[p][:], w1s[p][:],
                              preferred_element_type=jnp.float32)
        acc[:] += percep[:].astype(jnp.float32)
        if has_coarse:
            acc[:] += coarse[:].astype(jnp.float32)
        q = qxyz[:].astype(jnp.float32)  # (T, 8) padded; cols 0..2 valid
        wx = w1_xyz[:]
        acc[:] += (q[:, 0:1] * wx[0:1, :] + q[:, 1:2] * wx[1:2, :]
                   + q[:, 2:3] * wx[2:3, :] + b1[:])

        dt = parts[0].dtype
        h = jnp.maximum(acc[:], 0.0).astype(dt)
        h = jnp.dot(h, w2[:], preferred_element_type=jnp.float32) + b2[:]
        h = jnp.maximum(h, 0.0).astype(dt)
        h = jnp.dot(h, w3[:], preferred_element_type=jnp.float32) + b3[:]
        h = jnp.maximum(h, 0.0).astype(dt)
        o = jnp.dot(h, w4[:], preferred_element_type=jnp.float32)
        out[:] = o + b4[:]
    return kernel


@functools.partial(jax.jit, static_argnames=('tile', 'interpret'))
def fused_stack_head(parts: Sequence[jnp.ndarray], coarse,
                     percep: jnp.ndarray,
                     qxyz: jnp.ndarray, w1_parts: Sequence[jnp.ndarray],
                     w1_xyz: jnp.ndarray, b1: jnp.ndarray,
                     w2: jnp.ndarray, b2: jnp.ndarray,
                     w3: jnp.ndarray, b3: jnp.ndarray,
                     w4: jnp.ndarray, b4: jnp.ndarray,
                     tile: int = 512, interpret: bool = False) -> jnp.ndarray:
    """Fused fc_0 + bias + ReLU + MLP tail over the STRUCTURED stack parts.

    Unlike :func:`fused_fc0_mlp` (per-scale t-major stacks, 42 K<=128
    partial matmuls), this consumes what the production XLA head already
    produces — the structured stack parts ([A5 | Ax- | Ax+] per scale
    group, (n, K_i) row-major each) with their matching permuted fc_0 row
    blocks — WITHOUT the (n, 791) concatenate (~21 ms/mesh in the r3
    slab-64 trace: 6.6 GB of pure copy).  fc_0 accumulates per part in a
    VMEM f32 scratch, and the (n, 512) activations plus both ReLU
    intermediates never touch HBM between layers.

    parts: sequence of (n, K_i) compute-dtype structured stack parts.
    coarse: optional (n, 512) summed coarse-projected fc_0 contribution
    (hoisted ``Cslabs`` slice, bf16, or the in-scan f32 einsum output —
    dtype preserved, upcast in VMEM; absorbing the add here also kills
    the XLA path's bf16->f32 convert pass, ~10 ms/mesh).
    percep: (n, 512) pre-projected perceptual features (the in-kernel
    4-corner bilinear lerp was A/B'd and is 1.7x SLOWER — the
    (4, tile, 512) corner blocks DMA four strided regions per tile;
    keep the XLA lerp outside).
    qxyz: (n, 3) f32 normalized coords, or (n, 8) already zero-padded to
    the kernel's lane-aligned block (cols 0..2 valid).  Returns (n,) f32
    raw SDF.

    VMEM at tile=512 (v5e, sum K_i = 791): double-buffered blocks
    2*(512*791*2 + 512*512*4 + 512*512*2 + 512*8*4) ~= 5.3 MB, resident
    weights ~1.5 MB, f32 acc 1 MB, out 0.5 MB — comfortably under the
    16 MB core budget (fused_fc0 lesson: oversubscription crashes the
    remote-compile helper, not a clean error).
    """
    parts = list(parts)
    n = parts[0].shape[0]
    Ks = tuple(int(p.shape[1]) for p in parts)
    assert n % tile == 0, (n, tile)
    d1 = w2.shape[0]
    dt = parts[0].dtype
    has_coarse = coarse is not None

    if qxyz.shape[1] == 8:  # caller already padded (full-lane stack write)
        qpad = qxyz.astype(jnp.float32)
    else:
        qpad = jnp.zeros((n, 8), jnp.float32).at[:, :3].set(
            qxyz.astype(jnp.float32))
    wxyz = jnp.zeros((8, d1), jnp.float32).at[:3].set(
        w1_xyz.astype(jnp.float32))
    w4p = jnp.zeros((w4.shape[0], OUT_PAD), dt).at[:, :1].set(w4.astype(dt))
    b4p = jnp.zeros((1, OUT_PAD), jnp.float32).at[:, :1].set(
        b4.astype(jnp.float32).reshape(1, -1))

    grid = (n // tile,)
    row = lambda i: (i, 0)
    const = lambda i: (0, 0)

    in_specs = [pl.BlockSpec((tile, K), row, memory_space=pltpu.VMEM)
                for K in Ks]
    operands = list(parts)
    if has_coarse:
        in_specs.append(pl.BlockSpec((tile, d1), row,
                                     memory_space=pltpu.VMEM))
        operands.append(coarse)
    in_specs += [
        pl.BlockSpec((tile, d1), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 8), row, memory_space=pltpu.VMEM)]
    in_specs += [pl.BlockSpec((K, d1), const, memory_space=pltpu.VMEM)
                 for K in Ks]
    in_specs += [
        pl.BlockSpec((8, d1), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d1), const, memory_space=pltpu.VMEM),
        pl.BlockSpec(w2.shape, const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, w2.shape[1]), const, memory_space=pltpu.VMEM),
        pl.BlockSpec(w3.shape, const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, w3.shape[1]), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((w4.shape[0], OUT_PAD), const,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, OUT_PAD), const, memory_space=pltpu.VMEM)]
    operands += [percep, qpad]
    operands += [w.astype(dt) for w in w1_parts]
    operands += [wxyz,
                 b1.astype(jnp.float32).reshape(1, -1),
                 w2.astype(dt), b2.astype(jnp.float32).reshape(1, -1),
                 w3.astype(dt), b3.astype(jnp.float32).reshape(1, -1),
                 w4p, b4p]

    out = pl.pallas_call(
        _stack_kernel(len(parts), has_coarse),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, OUT_PAD), row,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, OUT_PAD), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile, d1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    return out[:, 0]


@functools.partial(jax.jit, static_argnames=('tile', 'interpret'))
def fused_fc0_mlp(stacks: Sequence[jnp.ndarray], percep: jnp.ndarray,
                  qxyz: jnp.ndarray, w1_scales: Sequence[jnp.ndarray],
                  w1_xyz: jnp.ndarray, b1: jnp.ndarray,
                  w2: jnp.ndarray, b2: jnp.ndarray,
                  w3: jnp.ndarray, b3: jnp.ndarray,
                  w4: jnp.ndarray, b4: jnp.ndarray,
                  tile: int = 512, interpret: bool = False) -> jnp.ndarray:
    """stacks: per-scale t-major (7, n, C_s) bf16; percep: (n, 512)
    pre-projected fc_0 contribution; qxyz: (n, 3) normalized coords.
    w1_scales: per-scale (7*C_s, 512) fc_0 row blocks in (disp, channel)
    row order (reshaped internally to (7, C_s, 512)).  Returns (n,) f32
    raw SDF.

    VMEM at tile=512 (v5e): double-buffered input blocks
    2*(512*2583 + 512*512 + 512*8)*2B ~= 6.4 MB, weights ~3.1 MB resident,
    f32 accumulator 1 MB, padded out 0.5 MB.
    """
    n = stacks[0].shape[1]
    assert n % tile == 0, (n, tile)
    n_scales = len(stacks)
    channels = tuple(int(s.shape[2]) for s in stacks)
    dt = stacks[0].dtype
    d1 = w2.shape[0]

    # pad qxyz to 8 lanes / w1_xyz to 8 rows (lane-alignment).  Coords stay
    # f32: bf16 would quantize sub-voxel positions (the kernel consumes
    # them as f32 anyway).
    qpad = jnp.zeros((n, 8), jnp.float32).at[:, :3].set(
        qxyz.astype(jnp.float32))
    wxyz = jnp.zeros((8, d1), jnp.float32).at[:3].set(
        w1_xyz.astype(jnp.float32))
    w4p = jnp.zeros((w4.shape[0], OUT_PAD), dt).at[:, :1].set(w4.astype(dt))
    b4p = jnp.zeros((1, OUT_PAD), jnp.float32).at[:, :1].set(
        b4.astype(jnp.float32).reshape(1, -1))

    grid = (n // tile,)
    row3 = lambda i: (0, i, 0)
    const = lambda i: (0, 0)
    const3 = lambda i: (0, 0, 0)

    in_specs = (
        [pl.BlockSpec((7, tile, c), row3, memory_space=pltpu.VMEM)
         for c in channels]
        + [pl.BlockSpec((tile, d1), lambda i: (i, 0),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((tile, 8), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((7, c, d1), const3, memory_space=pltpu.VMEM)
           for c in channels]
        + [pl.BlockSpec((8, d1), const, memory_space=pltpu.VMEM),
           pl.BlockSpec((1, d1), const, memory_space=pltpu.VMEM),
           pl.BlockSpec(w2.shape, const, memory_space=pltpu.VMEM),
           pl.BlockSpec((1, w2.shape[1]), const, memory_space=pltpu.VMEM),
           pl.BlockSpec(w3.shape, const, memory_space=pltpu.VMEM),
           pl.BlockSpec((1, w3.shape[1]), const, memory_space=pltpu.VMEM),
           pl.BlockSpec((w4.shape[0], OUT_PAD), const,
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((1, OUT_PAD), const, memory_space=pltpu.VMEM)])

    out = pl.pallas_call(
        _kernel(n_scales, channels),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, OUT_PAD), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, OUT_PAD), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile, d1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*stacks, percep, qpad,
      *[w.astype(dt).reshape(7, c, d1)
        for w, c in zip(w1_scales, channels)],
      wxyz, b1.astype(jnp.float32).reshape(1, -1),
      w2.astype(dt), b2.astype(jnp.float32).reshape(1, -1),
      w3.astype(dt), b3.astype(jnp.float32).reshape(1, -1),
      w4p, b4p)
    return out[:, 0]
