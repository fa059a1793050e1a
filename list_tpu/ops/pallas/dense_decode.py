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

Design notes:
- grid = (R/X, R^2/T) tiles; X=8 output x-rows, T yz-positions.
- For each (scale, tap) the needed input x-rows form a short contiguous
  range (length L_s <= 9, static); all 42 DMAs are started up front into
  dedicated VMEM scratch (~2.4 MB total) and waited on just before use, so
  DMA latency overlaps compute.
- The x-lerp is expressed as a tiny banded matrix M (X, L_s) built from
  iota comparisons, so the resample + tap matmul are two MXU ops:
  (M @ in).reshape(X*T, C) @ W_tap.
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
                                     feat_l2_channels, resample_axis)
from list_tpu.ops.sampling import grid_sample_2d, resize_bilinear_align_corners

X_TILE = 8


def _tap_specs(r_ins: Sequence[int], R: int, delta: float):
    """Static per-(scale, tap) spec: (scale_idx, variant_key, x_shift,
    L rows needed per X_TILE output rows)."""
    taps = [(0, (0, 0)), (0, (0, -1)), (0, (0, 1)), (0, (-1, 0)),
            (0, (1, 0)), (-1, (0, 0)), (1, (0, 0))]
    specs = []
    for si, r_in in enumerate(r_ins):
        ratio = (r_in - 1) / (R - 1)
        L = int(np.ceil((X_TILE - 1) * ratio)) + 2
        L = min(L, r_in)
        for x_sign, key in taps:
            shift = delta * x_sign * (r_in - 1) / 2.0
            specs.append((si, key, shift, L, ratio))
    return specs


def _make_kernel(r_ins, channels, R, T, delta, n_scales):
    specs = _tap_specs(r_ins, R, delta)

    n_taps = 7 * n_scales

    def kernel(*refs):
        # ref order: 5*n_scales variant volumes [scale][variant], base,
        # n_scales scale weights, w2, b2, w3, b3, w4, b4, out, then scratch:
        # n_taps tap buffers + dma sems.
        n_vol = 5 * n_scales
        vols = refs[:n_vol]
        base_ref = refs[n_vol]
        ws = refs[n_vol + 1:n_vol + 1 + n_scales]
        w2_ref, b2_ref, w3_ref, b3_ref, w4_ref, b4_ref = \
            refs[n_vol + 1 + n_scales:n_vol + 7 + n_scales]
        out_ref = refs[n_vol + 7 + n_scales]
        scratch = refs[n_vol + 8 + n_scales:n_vol + 8 + n_scales + n_taps]
        sems = refs[n_vol + 8 + n_scales + n_taps]

        xi = pl.program_id(0)
        yj = pl.program_id(1)
        x0 = xi * X_TILE
        yz0 = yj * T

        variant_order = [(0, 0), (1, 0), (-1, 0), (0, 1), (0, -1)]

        # ---- start all tap DMAs up front --------------------------------
        starts = []
        for t, (si, key, shift, L, ratio) in enumerate(specs):
            r_in = r_ins[si]
            vol = vols[si * 5 + variant_order.index(key)]
            # first needed row: floor(clip(a(x0)+shift)) (monotonic in x)
            a0 = x0 * ratio + shift
            a0 = jnp.clip(a0, 0.0, float(r_in - 1))
            start = jnp.floor(a0).astype(jnp.int32)
            start = jnp.minimum(start, r_in - L)
            start = jnp.maximum(start, 0)
            starts.append(start)
            dma = pltpu.make_async_copy(
                vol.at[pl.ds(start, L), pl.ds(yz0, T)],
                scratch[t], sems.at[t])
            dma.start()

        fc0 = base_ref[0].astype(jnp.float32).reshape(X_TILE * T, -1)

        # ---- accumulate taps --------------------------------------------
        for t, (si, key, shift, L, ratio) in enumerate(specs):
            r_in = r_ins[si]
            C = channels[si]
            vol = vols[si * 5 + variant_order.index(key)]
            pltpu.make_async_copy(
                vol.at[pl.ds(starts[t], L), pl.ds(yz0, T)],
                scratch[t], sems.at[t]).wait()

            # per-row positions and weights (vector, static formula)
            rows = (x0 + jax.lax.broadcasted_iota(jnp.int32, (X_TILE, 1), 0)
                    ).astype(jnp.float32)
            pos = jnp.clip(rows * ratio + shift, 0.0, float(r_in - 1))
            i0 = jnp.floor(pos)
            w = pos - i0
            i1 = jnp.minimum(i0 + 1, float(r_in - 1))
            start_f = starts[t].astype(jnp.float32)
            l0 = i0 - start_f  # (X, 1) local row of corner 0
            l1 = i1 - start_f
            li = jax.lax.broadcasted_iota(jnp.int32, (X_TILE, L),
                                          1).astype(jnp.float32)
            m = ((li == l0) * (1.0 - w) + (li == l1) * w)

            tile = scratch[t][:].reshape(L, T * C)
            res = jnp.dot(m.astype(tile.dtype), tile,
                          preferred_element_type=jnp.float32)
            res = res.reshape(X_TILE * T, C)
            d = t % 7
            wt = ws[si][pl.ds(d * C, C), :]
            fc0 = fc0 + jnp.dot(res.astype(wt.dtype), wt,
                                preferred_element_type=jnp.float32)

        # ---- MLP tail ----------------------------------------------------
        dt = w2_ref.dtype
        h = jnp.maximum(fc0, 0.0).astype(dt)
        h = jnp.maximum(
            jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
            + b2_ref[:], 0.0).astype(dt)
        h = jnp.maximum(
            jnp.dot(h, w3_ref[:], preferred_element_type=jnp.float32)
            + b3_ref[:], 0.0).astype(dt)
        o = jnp.dot(h, w4_ref[:], preferred_element_type=jnp.float32) \
            + b4_ref[:]
        out_ref[0] = o.reshape(X_TILE, T)

    return kernel, specs


@functools.partial(jax.jit, static_argnames=('vox_res', 'channels', 'tile_t',
                                             'delta', 'compute_dtype',
                                             'interpret'))
def pallas_dense_vox_decode(decoder_params: Dict,
                            yz_variants_flat: List[jnp.ndarray],
                            base: jnp.ndarray, vox_res: int,
                            channels: Sequence[int], tile_t: int = 128,
                            delta: float = 0.0722,
                            compute_dtype=jnp.bfloat16,
                            interpret: bool = False) -> jnp.ndarray:
    """Run the fused kernel.

    yz_variants_flat: 5*n_scales volumes (r_in, R^2, C) in variant order
    [(0,0),(1,0),(-1,0),(0,1),(0,-1)] per scale.  base: (R, R^2, 512) f32 =
    percep + xyz + b1 contribution.  Returns (R, R^2) f32 raw SDF.
    """
    R = vox_res
    T = tile_t
    n_scales = len(channels)
    r_ins = tuple(int(v.shape[0]) for v in yz_variants_flat[::5])
    kernel, specs = _make_kernel(r_ins, tuple(channels), R, T, delta,
                                 n_scales)

    w1 = decoder_params['fc_0']['kernel']
    n_vox_rows = sum(channels) * 7
    w_scales = [jnp.take(w1[:n_vox_rows],
                         jnp.asarray(_scale_w1_rows(tuple(channels), s)),
                         axis=0).astype(compute_dtype)
                for s in range(n_scales)]
    w2 = decoder_params['fc_1']['kernel'].astype(compute_dtype)
    b2 = decoder_params['fc_1']['bias'].reshape(1, -1).astype(jnp.float32)
    w3 = decoder_params['fc_2']['kernel'].astype(compute_dtype)
    b3 = decoder_params['fc_2']['bias'].reshape(1, -1).astype(jnp.float32)
    w4 = decoder_params['fc_out']['kernel'].astype(compute_dtype)
    b4 = decoder_params['fc_out']['bias'].reshape(1, -1).astype(jnp.float32)
    d1 = w1.shape[1]

    grid = (R // X_TILE, (R * R) // T)

    vol_specs = [pl.BlockSpec(memory_space=pl.ANY)
                 for _ in yz_variants_flat]
    const = lambda shape: pl.BlockSpec(shape, lambda i, j: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    in_specs = vol_specs + [
        pl.BlockSpec((1, X_TILE, T, d1), lambda i, j: (0, i, j, 0),
                     memory_space=pltpu.VMEM),  # base
    ] + [const(w.shape) for w in w_scales] + [
        const(w2.shape), const(b2.shape), const(w3.shape), const(b3.shape),
        const(w4.shape), const(b4.shape),
    ]
    out_spec = pl.BlockSpec((1, X_TILE, T), lambda i, j: (0, i, j),
                            memory_space=pltpu.VMEM)

    scratch_shapes = []
    for (si, key, shift, L, ratio) in specs:
        scratch_shapes.append(
            pltpu.VMEM((L, T, channels[si]), compute_dtype))
    scratch_shapes.append(pltpu.SemaphoreType.DMA((len(specs),)))

    base4 = base.reshape(1, R, R * R, d1)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, R, R * R), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(*[v.astype(compute_dtype) for v in yz_variants_flat], base4,
      *w_scales, w2, b2, w3, b3, w4, b4)
    return out[0]


def dense_grid_sdf_pallas(decoder_params: Dict,
                          vox_feats: List[jnp.ndarray],
                          feat_l2: List[jnp.ndarray],
                          trans_mat: jnp.ndarray, vox_res: int,
                          delta: float = 0.0722,
                          compute_dtype=jnp.bfloat16,
                          tile_t: int = 128,
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
    n_vox_rows = sum(channels) * 7
    n_percep = feat_l2_channels(feat_l2)
    w1_percep = w1[n_vox_rows:n_vox_rows + n_percep]
    w1_xyz = w1[n_vox_rows + n_percep:]

    # (y, z) variants per scale, flattened to (r_in, R^2, C)
    def norm_shift(s, r_in):
        return s * (r_in - 1) / 2.0

    variants = []
    for f in vox_feats:
        v = f[0].astype(compute_dtype)
        r_in = v.shape[0]
        z0 = resample_axis(v, 2, R, 0.0)
        zp = resample_axis(v, 2, R, norm_shift(delta, r_in))
        zm = resample_axis(v, 2, R, norm_shift(-delta, r_in))
        for var in (resample_axis(z0, 1, R, 0.0),
                    resample_axis(z0, 1, R, norm_shift(delta, r_in)),
                    resample_axis(z0, 1, R, norm_shift(-delta, r_in)),
                    resample_axis(zp, 1, R, 0.0),
                    resample_axis(zm, 1, R, 0.0)):
            variants.append(var.reshape(r_in, R * R, var.shape[-1]))

    # base = percep + xyz + b1 over the full grid
    ms = 137
    pmaps = jnp.concatenate(
        [resize_bilinear_align_corners(f, ms, ms) for f in feat_l2],
        axis=-1)
    pm512 = jnp.einsum('bhwc,co->bhwo', pmaps.astype(compute_dtype),
                       w1_percep.astype(compute_dtype),
                       preferred_element_type=jnp.float32)
    pm512 = pm512.astype(compute_dtype)
    xs = np.linspace(-0.5, 0.5, R).astype(np.float32)
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing='ij')
    world = jnp.asarray(np.stack([gx, gy, gz], -1).reshape(1, -1, 3))
    q = world[..., ::-1] * 2.0
    homo = jnp.concatenate([q, jnp.ones((1, q.shape[1], 1), q.dtype)], -1)
    pc_xyz = jnp.einsum('bnk,bkj->bnj', homo, trans_mat)
    pc_xy = jnp.clip(pc_xyz[..., :2] / (pc_xyz[..., 2:] + 1e-8), 0.0,
                     float(ms - 1))
    half = (ms - 1) / 2.0
    base = grid_sample_2d(pm512, (pc_xy - half) / half)[0].astype(jnp.float32)
    base = base + q[0].astype(jnp.float32) @ w1_xyz + b1
    # ship the base term in compute dtype: halves its HBM footprint (2.1 GB
    # at 128^3); the kernel accumulates in f32.
    base = base.astype(compute_dtype).reshape(R, R * R, -1)

    out = pallas_dense_vox_decode(decoder_params, variants, base, R,
                                  channels=channels, tile_t=tile_t,
                                  delta=delta, compute_dtype=compute_dtype,
                                  interpret=interpret)
    return out.reshape(R, R, R)
