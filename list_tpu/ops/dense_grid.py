"""Dense-grid SDF decoding, TPU-restructured.

The reference evaluates the dense vox_res^3 inference grid through the same
gather-based decoder used for arbitrary training queries (executors.py:
215-224).  On TPU the random-access trilinear gather is HBM-latency-bound:
~20.7k gathered floats per query (6 scales x 7 displacements x 8 corners x
C channels) = ~165 GB of scattered reads per 128^3 grid; measured 13.8 s
per mesh on v5e (152k queries/s).

But the inference queries are NOT arbitrary: they are the regular grid
linspace(bb_min, bb_max, R) in 'ij' order.  This module exploits that:

1. **Gather-free voxel features.** For a regular query grid, trilinear
   sampling of each feature volume factorizes per axis with STATIC indices
   and weights: position along an axis is a(i) = i*(R_s-1)/(R-1) + shift_d,
   where shift_d = +-0.0722*(R_s-1)/2 for the displaced taps.  Each axis
   pass is two static `take`s + a lerp (contiguous traffic).  Per scale the
   7 displacement taps are stacked channel-wise, so the 3610-d first decoder
   layer becomes 6 MXU matmuls (K = 7*C_s) accumulated per slab.

2. **Project-then-sample perceptual features.**  Bilinear sampling is
   linear, so sample(pmaps) @ W1_percep == sample(pmaps @ W1_percep).
   Projecting the 137x137x1024 pyramid through the first-layer weights
   ONCE (19.7 GFLOP) halves the per-query gather traffic to 512 channels.

Numerical parity with the general path (ops.sampling.grid_sample_3d border/
align_corners semantics, including edge clamping) is enforced by
tests/test_dense_grid.py.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from list_tpu.ops.sampling import grid_sample_2d, resize_bilinear_align_corners


def _axis_plan(r_out: int, r_in: int, shift: float):
    """Static (i0, i1, w) for 1-D border-clamped linear resampling."""
    pos = np.arange(r_out) * (r_in - 1) / max(r_out - 1, 1) + shift
    pos = np.clip(pos, 0.0, r_in - 1)
    i0 = np.floor(pos).astype(np.int32)
    w = (pos - i0).astype(np.float32)
    i1 = np.minimum(i0 + 1, r_in - 1).astype(np.int32)
    return i0, i1, w


def resample_axis(vol: jnp.ndarray, axis: int, r_out: int, shift: float
                  ) -> jnp.ndarray:
    """Border-clamped linear resample of one axis to ``r_out`` with a
    constant ``shift`` (in input-voxel units).  Static indices -> XLA turns
    the takes into contiguous copies."""
    r_in = vol.shape[axis]
    i0, i1, w = _axis_plan(r_out, r_in, shift)
    wshape = [1] * vol.ndim
    wshape[axis] = r_out
    w = jnp.asarray(w, vol.dtype).reshape(wshape)
    v0 = jnp.take(vol, jnp.asarray(i0), axis=axis)
    v1 = jnp.take(vol, jnp.asarray(i1), axis=axis)
    return v0 * (1.0 - w) + v1 * w


def vox_w1_permutation(channels: Sequence[int]) -> np.ndarray:
    """Row permutation mapping the fc_0 kernel's vox rows (ordered
    (scale, channel)*7 + disp, see VoxelDecoder2 reshape) to our concat
    order (scale, disp, channel)."""
    total = sum(channels)
    perm = []
    offset = 0
    for c in channels:
        for d in range(7):
            for ch in range(c):
                perm.append((offset + ch) * 7 + d)
        offset += c
    assert len(perm) == total * 7
    return np.asarray(perm, np.int64)


def _scale_w1_rows(channels: Sequence[int], scale_idx: int) -> np.ndarray:
    """fc_0 kernel rows for one scale in our (disp, channel) stack order."""
    offset = sum(channels[:scale_idx])
    c = channels[scale_idx]
    return np.asarray([(offset + ch) * 7 + d
                       for d in range(7) for ch in range(c)], np.int64)


@functools.partial(jax.jit, static_argnames=('vox_res', 'slab', 'delta',
                                             'compute_dtype'))
def dense_grid_sdf(decoder_params: Dict, vox_feats: List[jnp.ndarray],
                   feat_l2: List[jnp.ndarray], trans_mat: jnp.ndarray,
                   vox_res: int, slab: int = 8, delta: float = 0.0722,
                   compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Dense (vox_res^3) SDF evaluation for batch size 1.

    decoder_params: the VoxelDecoder2 param subtree {fc_0, fc_1, fc_2,
    fc_out} with Dense kernels/biases.  vox_feats: 6-scale channels-last
    volumes (1, R_s, R_s, R_s, C_s).  feat_l2: 5 image pyramid maps
    (1, H, W, C).  trans_mat: (1, 4, 3).  Returns (R, R, R) float32 raw SDF
    (caller divides by sdf_scale).
    """
    R = vox_res
    channels = tuple(int(f.shape[-1]) for f in vox_feats)
    w1 = decoder_params['fc_0']['kernel']  # (3610, 512)
    b1 = decoder_params['fc_0']['bias']
    n_vox_rows = sum(channels) * 7
    n_percep = feat_l2_channels(feat_l2)
    w1_scale = [jnp.take(w1[:n_vox_rows],
                         jnp.asarray(_scale_w1_rows(channels, s)),
                         axis=0).astype(compute_dtype)
                for s in range(len(channels))]
    w1_percep = w1[n_vox_rows:n_vox_rows + n_percep]
    w1_xyz = w1[n_vox_rows + n_percep:]

    # ---- perceptual maps: resize once, project through fc_0 rows ---------
    ms = 137
    pmaps = jnp.concatenate(
        [resize_bilinear_align_corners(f, ms, ms) for f in feat_l2],
        axis=-1)  # (1, 137, 137, 1024)
    # sample(pmaps) @ W == sample(pmaps @ W): project first (linear ops).
    pm512 = jnp.einsum('bhwc,co->bhwo', pmaps.astype(compute_dtype),
                       w1_percep.astype(compute_dtype),
                       preferred_element_type=jnp.float32)
    pm512 = pm512.astype(compute_dtype)

    # ---- per-scale (y, z)-resampled variants -----------------------------
    def norm_shift(s, r_in):
        return s * (r_in - 1) / 2.0

    # The query remap q = (2z, 2y, 2x) means output[i,j,k] resamples volume
    # axes (0, 1, 2) = world (x, y, z) directly; displacement taps:
    # d0 center, d1/d2 volume z axis -+, d3/d4 y axis, d5/d6 x axis.
    yz_variants = []  # per scale: dict[(sy, sz)] -> (R_s, R, R, C)
    for f in vox_feats:
        f = f[0].astype(compute_dtype)
        r_in = f.shape[0]
        z0 = resample_axis(f, 2, R, 0.0)
        zp = resample_axis(f, 2, R, norm_shift(delta, r_in))
        zm = resample_axis(f, 2, R, norm_shift(-delta, r_in))
        d = {
            (0, 0): resample_axis(z0, 1, R, 0.0),
            (1, 0): resample_axis(z0, 1, R, norm_shift(delta, r_in)),
            (-1, 0): resample_axis(z0, 1, R, norm_shift(-delta, r_in)),
            (0, 1): resample_axis(zp, 1, R, 0.0),
            (0, -1): resample_axis(zm, 1, R, 0.0),
        }
        yz_variants.append(d)

    # taps in displacement order d=0..6: (x_shift_sign, yz_variant_key)
    taps = [(0, (0, 0)), (0, (0, -1)), (0, (0, 1)), (0, (-1, 0)),
            (0, (1, 0)), (-1, (0, 0)), (1, (0, 0))]
    w2 = decoder_params['fc_1']['kernel']
    b2 = decoder_params['fc_1']['bias']
    w3 = decoder_params['fc_2']['kernel']
    b3 = decoder_params['fc_2']['bias']
    w4 = decoder_params['fc_out']['kernel']
    b4 = decoder_params['fc_out']['bias']

    out_slabs = []
    for x0 in range(0, R, slab):
        S = min(slab, R - x0)
        n = S * R * R
        fc0 = None
        # ---- voxel features: per scale, 7 taps stacked channel-wise ------
        for si, f in enumerate(vox_feats):
            r_in = f.shape[1]
            tap_parts = []
            for (x_sign, key) in taps:
                yz = yz_variants[si][key]
                i0, i1, w = _axis_plan(R, r_in, norm_shift(delta * x_sign,
                                                           r_in))
                ws = jnp.asarray(w[x0:x0 + S],
                                 compute_dtype).reshape(S, 1, 1, 1)
                v = (jnp.take(yz, jnp.asarray(i0[x0:x0 + S]), axis=0)
                     * (1 - ws)
                     + jnp.take(yz, jnp.asarray(i1[x0:x0 + S]), axis=0) * ws)
                tap_parts.append(v.reshape(n, -1))
            stack = jnp.concatenate(tap_parts, axis=-1)  # (n, 7*C_s)
            part = jnp.dot(stack, w1_scale[si],
                           preferred_element_type=jnp.float32)
            fc0 = part if fc0 is None else fc0 + part

        # ---- perceptual part (pre-projected 512-ch maps) -----------------
        world = grid_world_coords(R, x0, S)
        q = world[..., ::-1] * 2.0  # (2z, 2y, 2x)
        homo = jnp.concatenate([q, jnp.ones((1, n, 1), q.dtype)], -1)
        pc_xyz = jnp.einsum('bnk,bkj->bnj', homo, trans_mat)
        pc_xy = pc_xyz[..., :2] / (pc_xyz[..., 2:] + 1e-8)
        pc_xy = jnp.clip(pc_xy, 0.0, float(ms - 1))
        half = (ms - 1) / 2.0
        grid2d = (pc_xy - half) / half
        # keep sampling positions in f32 (bf16 loses sub-pixel precision)
        fc0 = fc0 + grid_sample_2d(pm512, grid2d)[0].astype(jnp.float32)
        fc0 = fc0 + q[0].astype(jnp.float32) @ w1_xyz + b1

        # ---- MLP tail ----------------------------------------------------
        h = jax.nn.relu(fc0).astype(compute_dtype)
        h = jax.nn.relu(jnp.dot(h, w2.astype(compute_dtype),
                                preferred_element_type=jnp.float32) + b2)
        h = h.astype(compute_dtype)
        h = jax.nn.relu(jnp.dot(h, w3.astype(compute_dtype),
                                preferred_element_type=jnp.float32) + b3)
        sdf = jnp.dot(h.astype(compute_dtype), w4.astype(compute_dtype),
                      preferred_element_type=jnp.float32) + b4
        out_slabs.append(sdf.reshape(S, R, R))

    return jnp.concatenate(out_slabs, axis=0)


def feat_l2_channels(feat_l2) -> int:
    return sum(int(f.shape[-1]) for f in feat_l2)


def grid_world_coords(R: int, x0: int, S: int) -> jnp.ndarray:
    """(1, S*R*R, 3) world coordinates of dense-grid rows [x0, x0+S),
    computed in-graph (a numpy meshgrid would bake megabytes of constants
    into the HLO — at 256^3 that overwhelms the compiler)."""
    step = 1.0 / (R - 1)
    i = jax.lax.broadcasted_iota(jnp.float32, (S, R, R), 0) + float(x0)
    j = jax.lax.broadcasted_iota(jnp.float32, (S, R, R), 1)
    k = jax.lax.broadcasted_iota(jnp.float32, (S, R, R), 2)
    world = jnp.stack([i, j, k], axis=-1) * step - 0.5
    return world.reshape(1, S * R * R, 3)
