"""Pallas TPU kernels: channel-major 3x3x3 convolution for the voxel
encoder's full-resolution stage.

Why this exists: XLA-TPU lays out NDHWC conv buffers with batch on the
sublane tile (padded to 8) and channels on the 128-lane tile.  The LIST
voxel encoder's 128^3 layers have 1-16 channels, so every activation pads
8-128x — a (8, 128^3, 16) f32 buffer becomes 8 GB and the batch-8 train
step wants 41 GB of HBM (measured; reference analog network/modules.py:
401-442 runs NCDHW under cuDNN and never hits this).  In channel-major
(B, C, D, H, W) layout the minor dims are spatial (H on sublanes, W=128 on
lanes): zero padding.

Kernel layout: grid (B, D); each step reads a (Ci, 3, H+2, W) pre-padded
slab, builds a (9*Ci, H, W) tap stack in VMEM (dz handled by the 3 input
rows, dy/dx by static slices + lane rolls), and contracts with the
(9*Ci, Co) weight block on the MXU, accumulating over dz.  SAME/zero
padding; W must equal 128 (one lane tile) — true for the 128^3 stage.

Autodiff: custom VJP.  dx is the same kernel with spatially-flipped,
channel-transposed weights; dk is a second kernel with the same blocking
that accumulates (27*Ci, Co) outer products across grid steps; db is a
plain XLA reduction.

Parity vs jax.lax.conv_general_dilated (flax nn.Conv semantics) is
enforced by tests/test_stencil3d.py in interpret mode.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128

# dk backward: contract (H, W) jointly on the MXU (default) vs the
# per-output-channel VPU multiply-reduce loop (LIST_TPU_DK_MXU=0).
_DK_MXU = os.environ.get('LIST_TPU_DK_MXU', '1') != '0'


def _shift_w(x, dx):
    """Zero-padded W-shift along the lane axis: out[..., w] = x[..., w+dx]."""
    if dx == 0:
        return x
    w = x.shape[-1]
    rolled = pltpu.roll(x, (-dx) % w, axis=x.ndim - 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    if dx > 0:
        return jnp.where(lane >= w - dx, 0.0, rolled)
    return jnp.where(lane < -dx, 0.0, rolled)


def _fwd_kernel(x0_ref, x1_ref, x2_ref, k_ref, o_ref, stack):
    """xN_ref: (1, Ci, 1, H+2, W) = padded z-rows d, d+1, d+2;
    k_ref: (3, 9*Ci, Co); o_ref: (1, Co, 1, H, W);
    stack: (9*Ci, H, W) scratch."""
    ci = x0_ref.shape[1]
    H = o_ref.shape[3]
    acc = None
    for dz, x_ref in enumerate((x0_ref, x1_ref, x2_ref)):
        for dy in range(3):
            for dx in (-1, 0, 1):
                t = dy * 3 + (dx + 1)
                sl = x_ref[0, :, 0, dy:dy + H, :]
                stack[t * ci:(t + 1) * ci] = _shift_w(sl, dx)
        part = jax.lax.dot_general(
            k_ref[dz], stack[:],
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (Co, H, W)
        acc = part if acc is None else acc + part
    o_ref[0, :, 0] = acc


def _dk_kernel(x0_ref, x1_ref, x2_ref, dy_ref, o_ref, stack):
    """Accumulate dk over grid steps.
    xN_ref: (1, Ci, 1, H+2, W) = padded z-rows d, d+1, d+2;
    dy_ref: (1, Co, 1, H, W); o_ref: (3, 9*Ci, Co) resident across steps."""
    ci = x0_ref.shape[1]
    H = dy_ref.shape[3]
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    g = dy_ref[0, :, 0]  # (Co, H, W)
    for dz, x_ref in enumerate((x0_ref, x1_ref, x2_ref)):
        for dy in range(3):
            for dx in (-1, 0, 1):
                t = dy * 3 + (dx + 1)
                sl = x_ref[0, :, 0, dy:dy + H, :]
                stack[t * ci:(t + 1) * ci] = _shift_w(sl, dx)
        st = stack[:]
        if _DK_MXU:
            # MXU path: contract W (lanes) with H as a batch dim — Mosaic
            # only legalizes single contracting dims — then reduce the H
            # batch on the VPU.  Replaces the per-output-channel VPU loop
            # (the dk call was 122 ms of the batch-4 step with the loop).
            p = jax.lax.dot_general(
                jnp.transpose(st, (1, 0, 2)), jnp.transpose(g, (1, 0, 2)),
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # (H, 9Ci, Co)
            o_ref[dz] = o_ref[dz] + jnp.sum(p, axis=0)
        else:
            # Per output channel, multiply-reduce on the VPU.  All
            # intermediates stay rank>=2 (rank-1 crashes layout inference).
            cols = []
            for c in range(g.shape[0]):
                s2 = jnp.sum(st * g[c][None], axis=2)          # (9Ci, H)
                cols.append(jnp.sum(s2, axis=1, keepdims=True))  # (9Ci, 1)
            o_ref[dz] = o_ref[dz] + jnp.concatenate(cols, axis=1)


def _flax_to_stacked(kernel: jnp.ndarray) -> jnp.ndarray:
    """flax (3, 3, 3, Ci, Co) -> (3_dz, 9*Ci, Co) in the kernel's
    (dy, dx, ci) stack order."""
    k = jnp.transpose(kernel, (0, 1, 2, 3, 4))  # (dz, dy, dx, ci, co)
    dz, dy, dx, ci, co = k.shape
    return k.reshape(dz, dy * dx * ci, co)


def _conv_fwd_impl(x, kernel, interpret):
    B, Ci, D, H, W = x.shape
    assert W == LANE, f'cmajor stencil requires W == {LANE}, got {W}'
    Co = kernel.shape[-1]
    ks = _flax_to_stacked(kernel)
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))

    zrow = lambda off: pl.BlockSpec(
        (1, Ci, 1, H + 2, W), lambda b, d: (b, 0, d + off, 0, 0),
        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(B, D),
        in_specs=[
            zrow(0), zrow(1), zrow(2),
            pl.BlockSpec((3, 9 * Ci, Co), lambda b, d: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Co, 1, H, W),
                               lambda b, d: (b, 0, d, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Co, D, H, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((9 * Ci, H, W), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xp, xp, xp, ks)
    return out


def _conv_dk_impl(x, dy, ci, co, interpret):
    B, Ci, D, H, W = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    zrow = lambda off: pl.BlockSpec(
        (1, Ci, 1, H + 2, W), lambda b, d: (b, 0, d + off, 0, 0),
        memory_space=pltpu.VMEM)
    dk = pl.pallas_call(
        _dk_kernel,
        grid=(B, D),
        in_specs=[
            zrow(0), zrow(1), zrow(2),
            pl.BlockSpec((1, co, 1, H, W), lambda b, d: (b, 0, d, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, 9 * Ci, co), lambda b, d: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, 9 * Ci, co), jnp.float32),
        scratch_shapes=[pltpu.VMEM((9 * Ci, H, W), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xp, xp, xp, dy)
    # (3, 9*Ci, Co) -> flax (3, 3, 3, Ci, Co)
    return dk.reshape(3, 3, 3, ci, co)


@functools.lru_cache(maxsize=4)
def _make_conv(interpret: bool):
    @jax.custom_vjp
    def conv(x, kernel):
        return _conv_fwd_impl(x, kernel, interpret)

    def fwd(x, kernel):
        return _conv_fwd_impl(x, kernel, interpret), (x, kernel)

    def bwd(res, g):
        x, kernel = res
        # dx: correlate g with spatially-flipped, channel-transposed
        # weights.
        kb = jnp.flip(kernel, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
        dx = _conv_fwd_impl(g, kb, interpret)
        dk = _conv_dk_impl(x, g, kernel.shape[3], kernel.shape[4],
                           interpret)
        return dx, dk

    conv.defvjp(fwd, bwd)
    return conv


def conv3x3x3_cmajor(x: jnp.ndarray, kernel: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """SAME/zero-pad 3x3x3 conv in channel-major layout.

    x: (B, Ci, D, H, 128) f32; kernel: flax layout (3, 3, 3, Ci, Co).
    Returns (B, Co, D, H, 128) f32.  Bias/activation are left to the
    caller (cheap pad-free XLA elementwise in this layout).
    """
    return _make_conv(bool(interpret))(x, kernel)


def conv3x3x3_cmajor_xla(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """XLA reference implementation (shift-and-add on the channel-major
    layout) — used for CPU tests and as the non-TPU fallback."""
    B, Ci, D, H, W = x.shape
    Co = kernel.shape[-1]
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1), (1, 1)))
    out = jnp.zeros((B, Co, D, H, W), jnp.float32)
    for dz in range(3):
        for dy in range(3):
            for dx in range(3):
                sl = xp[:, :, dz:dz + D, dy:dy + H, dx:dx + W]
                out = out + jnp.einsum(
                    'io,bidhw->bodhw', kernel[dz, dy, dx].astype(jnp.float32),
                    sl.astype(jnp.float32))
    return out
