"""Pallas TPU kernel: fused dense-grid voxel decode.

Fuses, for every query tile of the dense inference grid:
  1. the x-axis lerp of all 6 scales x 7 displacement taps (reading the
     (y,z)-resampled variant volumes directly from HBM via async DMA — the
     XLA version materializes ~11 GB of upsampled tap volumes per 128^3
     grid),
  2. the 2583-d first decoder layer as per-tap MXU matmul accumulation,
  3. the precomputed base term (perceptual + xyz + bias),
  4. the ReLU MLP tail 512 -> 256 -> 256 -> 1,
writing only the final (R^3,) SDF to HBM.

Layout notes (Mosaic constraints drove these choices):
- Everything inside the kernel is **feature-major**: variant volumes are
  stored (r_in, C, R^2) so the DMA's last-dim slice is the 128-aligned
  query-tile axis (slicing a C<128 channel axis violates lane tiling);
  weights are pre-transposed on the host so every contraction is a plain
  ``jnp.dot`` producing (features, T) tiles.
- The x-lerp uses dynamic single-row slices of the VMEM tap buffer (no
  reshapes: Mosaic rejects lane-crossing shape casts).
- All tap DMAs for a grid step start up front (dedicated scratch buffers +
  semaphores), so DMA latency overlaps the matmul accumulation.
- Weights stay VMEM-resident across grid steps (constant index maps).

Parity vs ops.dense_grid.dense_grid_sdf (same math, same tap order) is
enforced in tests/test_pallas.py via interpret mode.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from list_tpu.ops.dense_grid import (_axis_plan, _scale_w1_rows,
                                     feat_l2_channels, grid_world_coords,
                                     resample_axis)


def _axis_plan_slab(R, r_in, shift, x0, S):
    """Static x-resample plan restricted to output rows [x0, x0+S)."""
    i0, i1, w = _axis_plan(R, r_in, shift)
    return i0[x0:x0 + S], i1[x0:x0 + S], w[x0:x0 + S]
from list_tpu.ops.sampling import grid_sample_2d, resize_bilinear_align_corners

VARIANT_ORDER = [(0, 0), (1, 0), (-1, 0), (0, 1), (0, -1)]
TAPS = [(0, (0, 0)), (0, (0, -1)), (0, (0, 1)), (0, (-1, 0)),
        (0, (1, 0)), (-1, (0, 0)), (1, (0, 0))]


X_BLOCK = 16  # output x-rows sharing one round of variant DMAs


def _variant_specs(r_ins: Sequence[int], R: int, delta: float):
    """Static per-(scale, variant) DMA spec.

    Returns list of (scale_idx, variant_idx, min_shift, Lb, ratio): the
    buffer row span Lb covers all X_BLOCK output rows AND, for the (0,0)
    variant, the +-shift of the x-displaced taps.
    """
    specs = []
    for si, r_in in enumerate(r_ins):
        ratio = (r_in - 1) / (R - 1)
        s = delta * (r_in - 1) / 2.0
        for vi, key in enumerate(VARIANT_ORDER):
            # variant (0,0) also serves the x-shifted taps
            min_shift = -s if vi == 0 else 0.0
            max_shift = s if vi == 0 else 0.0
            span = (X_BLOCK - 1) * ratio + (max_shift - min_shift)
            Lb = min(int(np.ceil(span)) + 2, r_in)
            specs.append((si, vi, min_shift, Lb, ratio))
    return specs


def _make_kernel(r_ins, channels, R, T, delta, n_scales):
    vspecs = _variant_specs(r_ins, R, delta)
    n_bufs = len(vspecs)

    def kernel(*refs):
        # ref order: 5*n_scales variant volumes (r_in, n_tiles, C, T) in
        # ANY/HBM, base (1, R, d1, R^2-tiled) blocked (one x-row), n_scales
        # weight stacks (d1, 7*C), w2T, b2, w3T, b3, w4T, b4, out, then
        # scratch: n_bufs variant buffers (Lb, 1, C, T), per-scale stack
        # buffers (7*C, T), dma sems.
        n_vol = 5 * n_scales
        vols = refs[:n_vol]
        base_ref = refs[n_vol]
        ws = refs[n_vol + 1:n_vol + 1 + n_scales]
        w2_ref, b2_ref, w3_ref, b3_ref, w4_ref, b4_ref = \
            refs[n_vol + 1 + n_scales:n_vol + 7 + n_scales]
        out_ref = refs[n_vol + 7 + n_scales]
        s0 = n_vol + 8 + n_scales
        scratch = refs[s0:s0 + n_bufs]
        stacks = refs[s0 + n_bufs:s0 + n_bufs + n_scales]
        sems = refs[s0 + n_bufs + n_scales]

        # 3D grid (R//X_BLOCK, R^2//T, X_BLOCK): variant DMAs are issued
        # once per (i, j) block (at xk == 0) and reused by the X_BLOCK
        # inner steps, amortizing DMA latency over the block's compute.
        xk = pl.program_id(2)
        xi = pl.program_id(0)
        x = xi * X_BLOCK + xk
        yj = pl.program_id(1)

        def block_start(si, vi, min_shift, Lb, ratio):
            r_in = r_ins[si]
            a0 = (xi * X_BLOCK).astype(jnp.float32) * ratio + min_shift
            a0 = jnp.clip(a0, 0.0, float(r_in - 1))
            start = jnp.floor(a0).astype(jnp.int32)
            return jnp.clip(start, 0, r_in - Lb)

        starts = [block_start(*spec) for spec in vspecs]

        @pl.when(xk == 0)
        def _():
            for b, (si, vi, min_shift, Lb, ratio) in enumerate(vspecs):
                vol = vols[si * 5 + vi]
                pltpu.make_async_copy(
                    vol.at[pl.ds(starts[b], Lb), pl.ds(yj, 1)],
                    scratch[b], sems.at[b]).start()
            for b in range(n_bufs):
                (si, vi, min_shift, Lb, ratio) = vspecs[b]
                vol = vols[si * 5 + vi]
                pltpu.make_async_copy(
                    vol.at[pl.ds(starts[b], Lb), pl.ds(yj, 1)],
                    scratch[b], sems.at[b]).wait()

        fc0 = base_ref[0, 0].astype(jnp.float32)  # (d1, T)

        # ---- per scale: lerp the 7 taps into a (7C, T) stack, one matmul -
        for si in range(n_scales):
            C = channels[si]
            r_in = r_ins[si]
            ratio = (r_in - 1) / (R - 1)
            for d, (x_sign, key) in enumerate(TAPS):
                vi = VARIANT_ORDER.index(key)
                b = si * 5 + vi
                shift = delta * x_sign * (r_in - 1) / 2.0
                pos = x.astype(jnp.float32) * ratio + shift
                pos = jnp.clip(pos, 0.0, float(r_in - 1))
                i0 = jnp.floor(pos)
                w = pos - i0  # f32 scalar (bf16 scalar arith won't legalize)
                i1 = jnp.minimum(i0 + 1.0, float(r_in - 1))
                l0 = i0.astype(jnp.int32) - starts[b]
                l1 = i1.astype(jnp.int32) - starts[b]
                v0 = scratch[b][pl.ds(l0, 1)][0, 0]  # (C, T)
                v1 = scratch[b][pl.ds(l1, 1)][0, 0]
                v = (v0.astype(jnp.float32) * (1.0 - w)
                     + v1.astype(jnp.float32) * w)
                stacks[si][pl.ds(d * C, C), :] = v.astype(stacks[si].dtype)
            fc0 = fc0 + jnp.dot(ws[si][:], stacks[si][:],
                                preferred_element_type=jnp.float32)

        # ---- MLP tail (feature-major) ------------------------------------
        dt = w2_ref.dtype
        h = jnp.maximum(fc0, 0.0).astype(dt)
        h = jnp.maximum(
            jnp.dot(w2_ref[:], h, preferred_element_type=jnp.float32)
            + b2_ref[:], 0.0).astype(dt)
        h = jnp.maximum(
            jnp.dot(w3_ref[:], h, preferred_element_type=jnp.float32)
            + b3_ref[:], 0.0).astype(dt)
        o = jnp.dot(w4_ref[:], h, preferred_element_type=jnp.float32) \
            + b4_ref[:]  # (1, T)
        out_ref[0, pl.ds(xk, 1)] = o

    return kernel, vspecs


@functools.partial(jax.jit, static_argnames=('vox_res', 'tile_t', 'delta',
                                             'compute_dtype', 'interpret'))
def pallas_dense_vox_decode(decoder_params: Dict,
                            yz_variants_flat: List[jnp.ndarray],
                            tap_weights: List[jnp.ndarray],
                            base: jnp.ndarray, vox_res: int,
                            tile_t: int = 256, delta: float = 0.0722,
                            compute_dtype=jnp.bfloat16,
                            interpret: bool = False) -> jnp.ndarray:
    """Run the fused kernel.

    yz_variants_flat: 5*n_scales volumes pre-tiled (r_in, R^2//T, C, T) in
    VARIANT_ORDER per scale (contiguous DMA tiles).  tap_weights: per scale (7, d1, C) first-layer weight stacks.
    base: (R, d1, R^2) = percep + xyz + b1 (+ any XLA-handled scales)
    contribution, feature-major.  Returns (R, R^2) f32 raw SDF.
    """
    R = vox_res
    T = tile_t
    channels = tuple(int(v.shape[2]) for v in yz_variants_flat[::5])
    n_scales = len(channels)
    r_ins = tuple(int(v.shape[0]) for v in yz_variants_flat[::5])
    kernel, specs = _make_kernel(r_ins, channels, R, T, delta, n_scales)

    d1 = decoder_params['fc_0']['kernel'].shape[1]
    # per-scale (7, d1, C) tap weights -> one (d1, 7*C) stack weight whose
    # columns are ordered (d, c) to match the kernel's stacked tile rows.
    w_scales = [jnp.concatenate([w[d] for d in range(7)],
                                axis=1).astype(compute_dtype)
                for w in tap_weights]
    w2t = decoder_params['fc_1']['kernel'].T.astype(compute_dtype)
    b2 = decoder_params['fc_1']['bias'].reshape(-1, 1).astype(jnp.float32)
    w3t = decoder_params['fc_2']['kernel'].T.astype(compute_dtype)
    b3 = decoder_params['fc_2']['bias'].reshape(-1, 1).astype(jnp.float32)
    w4t = decoder_params['fc_out']['kernel'].T.astype(compute_dtype)
    b4 = decoder_params['fc_out']['bias'].reshape(-1, 1).astype(jnp.float32)

    assert R % X_BLOCK == 0, R
    grid = (R // X_BLOCK, (R * R) // T, X_BLOCK)

    vol_specs = [pl.BlockSpec(memory_space=pl.ANY)
                 for _ in yz_variants_flat]
    const = lambda shape: pl.BlockSpec(
        shape, lambda i, j, k: (0,) * len(shape), memory_space=pltpu.VMEM)
    in_specs = vol_specs + [
        pl.BlockSpec((1, 1, d1, T),
                     lambda i, j, k: (0, i * X_BLOCK + k, 0, j),
                     memory_space=pltpu.VMEM),  # base
    ] + [const(w.shape) for w in w_scales] + [
        const(w2t.shape), const(b2.shape), const(w3t.shape), const(b3.shape),
        const(w4t.shape), const(b4.shape),
    ]
    out_spec = pl.BlockSpec((1, X_BLOCK, T), lambda i, j, k: (0, i, j),
                            memory_space=pltpu.VMEM)

    scratch_shapes = []
    for (si, vi, min_shift, Lb, ratio) in specs:
        scratch_shapes.append(
            pltpu.VMEM((Lb, 1, channels[si], T), compute_dtype))
    for c in channels:
        scratch_shapes.append(pltpu.VMEM((7 * c, T), compute_dtype))
    scratch_shapes.append(pltpu.SemaphoreType.DMA((len(specs),)))

    base4 = base.reshape(1, R, d1, R * R)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, R, R * R), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(*[v.astype(compute_dtype) for v in yz_variants_flat], base4,
      *w_scales, w2t, b2, w3t, b3, w4t, b4)
    return out[0]


def dense_grid_sdf_pallas(decoder_params: Dict,
                          vox_feats: List[jnp.ndarray],
                          feat_l2: List[jnp.ndarray],
                          trans_mat: jnp.ndarray, vox_res: int,
                          delta: float = 0.0722,
                          compute_dtype=jnp.bfloat16,
                          tile_t: int = 256,
                          interpret: bool = False) -> jnp.ndarray:
    """Full dense-grid decode with the Pallas kernel for the voxel path.

    XLA computes the (y,z) variants (contiguous-traffic lerps), the
    projected perceptual base, and hands the rest to the kernel.
    Returns (R, R, R) f32 raw SDF.
    """
    R = vox_res
    channels = tuple(int(f.shape[-1]) for f in vox_feats)
    w1 = decoder_params['fc_0']['kernel']
    b1 = decoder_params['fc_0']['bias']
    d1 = w1.shape[1]
    n_vox_rows = sum(channels) * 7
    n_percep = feat_l2_channels(feat_l2)
    w1_percep = w1[n_vox_rows:n_vox_rows + n_percep]
    w1_xyz = w1[n_vox_rows + n_percep:]

    # Scales whose channel count is not a multiple of the sublane tile
    # cannot be DMA-sliced by the kernel; their (cheap) contribution is
    # folded into the XLA-computed base term instead.  For the shipped
    # config only the 1-channel sigmoid-occupancy scale takes this path.
    sublane = 16 if compute_dtype == jnp.bfloat16 else 8
    kernel_scales = [s for s, c in enumerate(channels) if c % sublane == 0]
    xla_scales = [s for s, c in enumerate(channels) if c % sublane != 0]

    # (y, z) variants per kernel scale, feature-major (r_in, C, R^2)
    def norm_shift(s, r_in):
        return s * (r_in - 1) / 2.0

    def yz_variant_list(v, r_in):
        z0 = resample_axis(v, 2, R, 0.0)
        zp = resample_axis(v, 2, R, norm_shift(delta, r_in))
        zm = resample_axis(v, 2, R, norm_shift(-delta, r_in))
        return [resample_axis(z0, 1, R, 0.0),
                resample_axis(z0, 1, R, norm_shift(delta, r_in)),
                resample_axis(z0, 1, R, norm_shift(-delta, r_in)),
                resample_axis(zp, 1, R, 0.0),
                resample_axis(zm, 1, R, 0.0)]

    variants = []
    for s in kernel_scales:
        v = vox_feats[s][0].astype(compute_dtype)
        r_in = v.shape[0]
        for var in yz_variant_list(v, r_in):
            # (r_in, R, R, C) -> pre-tiled (r_in, R^2//T, C, T): each
            # kernel DMA block is then one contiguous chunk.
            c = var.shape[-1]
            var = jnp.transpose(var.reshape(r_in, (R * R) // tile_t,
                                            tile_t, c), (0, 1, 3, 2))
            variants.append(var)

    # base = percep + xyz + b1 (+ sub-sublane scales) over the full grid,
    # computed in x-slabs so the f32 transients stay ~0.5 GB (a full-grid
    # f32 (R^3, 512) buffer would not fit HBM next to the variant volumes).
    ms = 137
    pmaps = jnp.concatenate(
        [resize_bilinear_align_corners(f, ms, ms) for f in feat_l2],
        axis=-1)
    pm512 = jnp.einsum('bhwc,co->bhwo', pmaps.astype(compute_dtype),
                       w1_percep.astype(compute_dtype),
                       preferred_element_type=jnp.float32)
    pm512 = pm512.astype(compute_dtype)

    taps = [(0, (0, 0)), (0, (0, -1)), (0, (0, 1)), (0, (-1, 0)),
            (0, (1, 0)), (-1, (0, 0)), (1, (0, 0))]
    xla_yzv = {}
    for s in xla_scales:
        v = vox_feats[s][0].astype(compute_dtype)
        xla_yzv[s] = dict(zip(VARIANT_ORDER,
                              yz_variant_list(v, v.shape[0])))

    half = (ms - 1) / 2.0
    slab = max(R // 16, 1)
    base_slabs = []
    for x0 in range(0, R, slab):
        S = min(slab, R - x0)
        n = S * R * R
        world = grid_world_coords(R, x0, S)
        q = world[..., ::-1] * 2.0
        homo = jnp.concatenate([q, jnp.ones((1, n, 1), q.dtype)], -1)
        pc_xyz = jnp.einsum('bnk,bkj->bnj', homo, trans_mat)
        pc_xy = jnp.clip(pc_xyz[..., :2] / (pc_xyz[..., 2:] + 1e-8), 0.0,
                         float(ms - 1))
        b = (grid_sample_2d(pm512, (pc_xy - half) / half)[0]
             + q[0].astype(jnp.float32) @ w1_xyz + b1).astype(compute_dtype)

        for s in xla_scales:
            c = channels[s]
            r_in = vox_feats[s].shape[1]
            parts = []
            for x_sign, key in taps:
                yz = xla_yzv[s][key]
                i0, i1, w = _axis_plan_slab(R, r_in,
                                            norm_shift(delta * x_sign, r_in),
                                            x0, S)
                ws_ = jnp.asarray(w, compute_dtype).reshape(S, 1, 1, 1)
                var = (jnp.take(yz, jnp.asarray(i0), axis=0) * (1 - ws_)
                       + jnp.take(yz, jnp.asarray(i1), axis=0) * ws_)
                parts.append(var.reshape(n, c))
            stack = jnp.concatenate(parts, axis=-1)
            rows = jnp.take(w1[:n_vox_rows],
                            jnp.asarray(_scale_w1_rows(channels, s)), axis=0)
            b = b + jnp.dot(stack, rows.astype(compute_dtype),
                            preferred_element_type=compute_dtype)
        # feature-major slab (S, d1, R^2)
        base_slabs.append(jnp.transpose(b.reshape(S, R * R, d1), (0, 2, 1)))
    base = jnp.concatenate(base_slabs, axis=0)

    if not kernel_scales:
        # degenerate (all scales sub-sublane, tiny test configs): base IS
        # the complete fc_0 pre-activation; run the tail in XLA.
        fc0 = jnp.transpose(base, (0, 2, 1)).reshape(R * R * R, d1)
        h = jax.nn.relu(fc0.astype(jnp.float32)).astype(compute_dtype)
        for name in ('fc_1', 'fc_2'):
            k = decoder_params[name]['kernel'].astype(compute_dtype)
            bb = decoder_params[name]['bias']
            h = jax.nn.relu(jnp.dot(h, k, preferred_element_type=jnp.float32)
                            + bb).astype(compute_dtype)
        o = jnp.dot(h, decoder_params['fc_out']['kernel'].astype(
            compute_dtype), preferred_element_type=jnp.float32) \
            + decoder_params['fc_out']['bias']
        return o[:, 0].reshape(R, R, R)

    # per-kernel-scale tap weights (7, d1, C), rows from the FULL fc_0 layout
    tap_weights = []
    for s in kernel_scales:
        c = channels[s]
        rows = jnp.take(w1[:n_vox_rows],
                        jnp.asarray(_scale_w1_rows(channels, s)),
                        axis=0)  # (7*C, d1), ordered (d, c)
        tap_weights.append(jnp.transpose(rows.reshape(7, c, d1), (0, 2, 1)))

    out = pallas_dense_vox_decode(decoder_params, variants, tap_weights,
                                  base, R, tile_t=tile_t, delta=delta,
                                  compute_dtype=compute_dtype,
                                  interpret=interpret)
    return out.reshape(R, R, R)
