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
   and weights.  Per output x-slab we slice the handful of source x-rows
   each scale needs, resample y and z to the output resolution on that
   slice (slab-local -> no R_s x R x R live volumes; this is what lets
   256^3 fit), and fold the x-axis interpolation of all 7 displacement
   taps into ONE banded-matrix einsum per scale
   (L7 (7,S,r) x V7 (7,r,R,R,C) -> (S,R,R,7,C)), which lands on the MXU
   and writes the (n, 7*C_s) matmul operand exactly once — no per-tap
   gather/lerp/concat HBM temporaries (round-1 cost: ~300 ms/mesh).

2. **Project-then-sample perceptual features.**  Bilinear sampling is
   linear, so sample(pmaps) @ W1_percep == sample(pmaps @ W1_percep).
   Projecting the 137x137x1024 pyramid through the first-layer weights
   ONCE (19.7 GFLOP) halves the per-query gather traffic to 512 channels.

3. **Coarse-projected scales** (round 3).  The 8^3/16^3 scales carry 1792
   of the 2583 fc_0 voxel rows but almost no information: their fc_0 tap
   blocks are folded into the TINY source volumes first (C -> 512 on the
   coarse grid), the seven axis-aligned taps collapse by linearity into
   three volumes (1-D interps act on space, the weight matmul on channels
   — they commute), and only those are upsampled.  Removes ~70% of the
   stack bytes and 3.3x of the fc_0 FLOPs, exactly.  On-chip: 0.32 ->
   0.21 s per 128^3 decode (slab=16).

Numerical parity with the general path (ops.sampling.grid_sample_3d border/
align_corners semantics, including edge clamping) is enforced by
tests/test_dense_grid.py, including non-default bounding boxes.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from list_tpu.ops.sampling import resize_bilinear_align_corners

# taps in the reference displacement order d=0..6 (modules.py:205-214 via
# the query remap, see round-1 derivation): (x_shift_sign, (sy, sz)).
TAPS = ((0, (0, 0)), (0, (0, -1)), (0, (0, 1)), (0, (-1, 0)),
        (0, (1, 0)), (-1, (0, 0)), (1, (0, 0)))


def _axis_positions(r_out: int, r_in: int, shift: float,
                    bb_min: float = -0.5, bb_max: float = 0.5) -> np.ndarray:
    """Source positions (input-voxel units, border-clamped) of the output
    grid along one axis.

    The decoder receives normalized coords q = 2*world (ops.grid.
    reorder_and_scale_query), and grid_sample align_corners=True maps
    q -> (q+1)/2*(r_in-1).  ``shift`` is the displacement tap offset in
    input-voxel units."""
    w = bb_min + np.arange(r_out) * (bb_max - bb_min) / max(r_out - 1, 1)
    pos = (2.0 * w + 1.0) * 0.5 * (r_in - 1) + shift
    return np.clip(pos, 0.0, r_in - 1)


def _axis_plan(r_out: int, r_in: int, shift: float,
               bb_min: float = -0.5, bb_max: float = 0.5):
    """Static (i0, i1, w) for 1-D border-clamped linear resampling."""
    pos = _axis_positions(r_out, r_in, shift, bb_min, bb_max)
    i0 = np.floor(pos).astype(np.int32)
    w = (pos - i0).astype(np.float32)
    i1 = np.minimum(i0 + 1, r_in - 1).astype(np.int32)
    return i0, i1, w


def norm_shift(s: float, r_in: int) -> float:
    """Normalized-space displacement -> input-voxel units."""
    return s * (r_in - 1) / 2.0


def resample_axis(vol: jnp.ndarray, axis: int, r_out: int, shift: float,
                  bb_min: float = -0.5, bb_max: float = 0.5) -> jnp.ndarray:
    """Border-clamped linear resample of one axis to ``r_out`` with a
    constant ``shift`` (in input-voxel units).  Static indices -> XLA turns
    the takes into contiguous copies."""
    r_in = vol.shape[axis]
    i0, i1, w = _axis_plan(r_out, r_in, shift, bb_min, bb_max)
    wshape = [1] * vol.ndim
    wshape[axis] = r_out
    w = jnp.asarray(w, vol.dtype).reshape(wshape)
    v0 = jnp.take(vol, jnp.asarray(i0), axis=axis, mode='clip')
    v1 = jnp.take(vol, jnp.asarray(i1), axis=axis, mode='clip')
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


def _tap_w1_rows(channels: Sequence[int], scale_idx: int,
                 tap: int) -> np.ndarray:
    """fc_0 kernel rows of ONE displacement tap of one scale (C_s rows)."""
    offset = sum(channels[:scale_idx])
    c = channels[scale_idx]
    return np.asarray([(offset + ch) * 7 + tap for ch in range(c)], np.int64)


def _group_w1_rows(channels: Sequence[int], group: Sequence[int]
                   ) -> np.ndarray:
    """fc_0 kernel rows for a same-resolution scale group in the structured
    stack order: [taps 0-4 | tap 5 (x-) | tap 6 (x+)], channels of all
    group members concatenated within each tap."""
    rows = []
    for d in (0, 1, 2, 3, 4, 5, 6):
        for si in group:
            offset = sum(channels[:si])
            rows += [(offset + ch) * 7 + d for ch in range(channels[si])]
    return np.asarray(rows, np.int64)


def fused_head_tile(n: int) -> Optional[int]:
    """Fused-stack-head kernel tile for n queries per scan step: largest
    power-of-two divisor of n <= 512 (512 fits VMEM comfortably, see
    fused_stack_head docstring); tiny ragged n (<= 1024) runs as a single
    tile; None means the fused head cannot engage (callers must fall back
    to the XLA head or the chunked decoder — never pair the XLA head with
    slab=R at large R, that program crashes the remote TPU compiler)."""
    return next((t for t in (512, 256, 128, 64) if n % t == 0),
                n if n <= 1024 else None)


# x-shift signs of the three x-tap variants used by the coarse-projected
# path: tap order (center, +x, -x) matching (W_center, W_x+, W_x-).
XTAPS = ((0, None), (1, None), (-1, None))


def _slab_x_plans(R: int, r_in: int, x0: int, S: int, delta: float,
                  bb_min: float, bb_max: float, taps=TAPS):
    """Per-tap banded x-interpolation for one output slab.

    Returns (lo, hi, L) where ``vol[lo:hi]`` are the source x-rows the
    slab needs across all 3 x-shifts and ``L`` is the (len(taps), S, hi-lo)
    banded matrix with L[t] @ rows == the x-lerp of tap t."""
    plans = {sgn: _axis_plan(R, r_in, norm_shift(delta * sgn, r_in),
                             bb_min, bb_max) for sgn in (-1, 0, 1)}
    lo = min(int(p[0][x0]) for p in plans.values())
    hi = max(int(p[1][x0 + S - 1]) for p in plans.values()) + 1
    L = np.zeros((len(taps), S, hi - lo), np.float32)
    for t, (sgn, _) in enumerate(taps):
        i0, i1, w = plans[sgn]
        for s in range(S):
            L[t, s, i0[x0 + s] - lo] += 1.0 - w[x0 + s]
            L[t, s, i1[x0 + s] - lo] += w[x0 + s]
    return lo, hi, L


def _scan_x_plans_full(R: int, r_in: int, S: int, delta: float,
                       bb_min: float, bb_max: float, taps=XTAPS) -> np.ndarray:
    """Full-window banded x-interpolation matrices, absolute positions.

    Returns (nslabs, len(taps), S, r_in): row s of slab k maps output row
    k*S+s to its two source x-rows of tap t.  Used by the coarse-projected
    path, whose (r_in <= 16)-row volumes are cheap to contract in full —
    one flattened matmul per slab with NO dynamic slices (banded slicing
    of the stacked volumes lowered pathologically, r3 trace)."""
    assert R % S == 0, (R, S)
    plans = {sgn: _axis_plan(R, r_in, norm_shift(delta * sgn, r_in),
                             bb_min, bb_max) for sgn in (-1, 0, 1)}
    L = np.zeros((R // S, len(taps), S, r_in), np.float32)
    for t, (sgn, _) in enumerate(taps):
        i0, i1, w = plans[sgn]
        for x in range(R):
            L[x // S, t, x % S, i0[x]] += 1.0 - w[x]
            L[x // S, t, x % S, i1[x]] += w[x]
    return L


def _scan_x_plans(R: int, r_in: int, S: int, delta: float,
                  bb_min: float, bb_max: float, taps=TAPS):
    """Shape-uniform per-slab x-plans for the lax.scan formulation.

    All R//S slabs get the same source-row window width r_max (banded
    matrices zero-padded; window starts clamped so lo + r_max <= r_in),
    so one compiled slab program serves every slab — the compile-side
    blow-up of unrolling 16-32 near-identical slab programs is what broke
    192^3/256^3 at the remote-compile helper.

    Returns (los (nslabs,) int32, Ls (nslabs, len(taps), S, r_max) f32)."""
    assert R % S == 0, (R, S)
    nslabs = R // S
    raw = [_slab_x_plans(R, r_in, k * S, S, delta, bb_min, bb_max, taps)
           for k in range(nslabs)]
    r_max = max(hi - lo for lo, hi, _ in raw)
    los = np.zeros(nslabs, np.int32)
    L7s = np.zeros((nslabs, len(taps), S, r_max), np.float32)
    for k, (lo, hi, L7) in enumerate(raw):
        lo2 = min(lo, r_in - r_max)
        off = lo - lo2
        los[k] = lo2
        L7s[k, :, :, off:off + (hi - lo)] = L7
    return los, L7s


@functools.partial(jax.jit, static_argnames=(
    'vox_res', 'slab', 'delta', 'compute_dtype', 'bb_min', 'bb_max',
    'fuse_scales', 'use_pallas', 'pallas_interpret', 'scan_unroll',
    'mesh', 'shard_axis', 'coarse_proj', 'coarse_outside',
    'hoist_variants', 'percep_collapse'))
def dense_grid_sdf(decoder_params: Dict, vox_feats: List[jnp.ndarray],
                   feat_l2: List[jnp.ndarray], trans_mat: jnp.ndarray,
                   vox_res: int, slab: int = 8, delta: float = 0.0722,
                   compute_dtype=jnp.bfloat16, bb_min: float = -0.5,
                   bb_max: float = 0.5, fuse_scales: bool = True,
                   use_pallas: bool = False, pallas_interpret: bool = False,
                   scan_unroll: int = 1, mesh=None,
                   shard_axis: Optional[str] = None,
                   coarse_proj: int = 16,
                   coarse_outside: Optional[bool] = None,
                   hoist_variants: Optional[bool] = None,
                   percep_collapse: bool = False) -> jnp.ndarray:
    """Dense (vox_res^3) SDF evaluation for batch size 1.

    decoder_params: the VoxelDecoder2 param subtree {fc_0, fc_1, fc_2,
    fc_out} with Dense kernels/biases.  vox_feats: 6-scale channels-last
    volumes (1, R_s, R_s, R_s, C_s).  feat_l2: 5 image pyramid maps
    (1, H, W, C).  trans_mat: (1, 4, 3).  Returns (R, R, R) float32 raw SDF
    (caller divides by sdf_scale).

    fuse_scales=True: all scales' tap stacks concat into one (n, 7*sum C)
    operand and ONE fc_0 matmul per slab; False: one matmul per scale with
    accumulation (more fc0-sized HBM passes, kept for A/B timing).

    use_pallas=True (--use_pallas): fc_0 + bias + ReLU + MLP tail run in the
    fused Pallas kernel (ops/pallas/fused_fc0.py) — activations stay in
    VMEM; fuse_scales is ignored (the kernel accumulates per scale).

    mesh + shard_axis: shard the x-slab scan across a mesh axis via
    shard_map — features/weights replicated, each device evaluates its
    contiguous block of x-slabs, no collectives (the queries are
    embarrassingly parallel; SURVEY §2.7 query-chunk parallelism at scale).

    hoist_variants (auto at R <= 128): build each kept group's five
    z/y-resampled tap variants ONCE for the full volume outside the scan
    instead of per slab.  The per-slab x-windows overlap (r_max ~ S +
    2*4.6 rows at 128^3), so the in-scan form recomputes the z/y lerp
    chain ~1.6-2.4x; slicing x first or z/y-resampling first commute
    exactly (the resamples never touch the x axis).  Costs the hoisted
    Vcat volumes (~1 GB bf16 at 128^3) — auto-gated off at 256^3 like
    ``coarse_outside``.  When a group's source resolution equals R the
    center-tap x-plan is the identity (positions land exactly on input
    rows), and its 5-tap einsum is replaced by a static slab slice.
    """
    R = vox_res
    channels = tuple(int(f.shape[-1]) for f in vox_feats)
    w1 = decoder_params['fc_0']['kernel']  # (3610, 512)
    b1 = decoder_params['fc_0']['bias']
    n_vox_rows = sum(channels) * 7
    n_percep = feat_l2_channels(feat_l2)
    # use_pallas modes: 0/False = pure XLA head; 1/True = per-scale t-major
    # fused_fc0_mlp kernel (r2; loses to XLA at 128^3); 2 = structured-stack
    # fused_stack_head kernel (r3: same stack/coarse/percep production as
    # the XLA head, but fc_0 + ReLU + tail run in VMEM).
    use_pallas = int(use_pallas)
    if use_pallas == 1:
        fuse_scales = False
    pl_tile = fused_head_tile(slab * R * R)
    if use_pallas == 2 and (pl_tile is None or not fuse_scales):
        use_pallas = 0

    # ---- scale partition: coarse scales go through the projected path ----
    # Scales whose source resolution is <= coarse_proj (default: the 16^3
    # and 8^3 scales, which carry 1792 of the 2583 fc_0 voxel rows) never
    # materialize (n, 7*C) tap stacks: their tiny volumes are projected
    # through the fc_0 tap blocks FIRST (C -> 512 on the coarse grid), the
    # seven axis-aligned taps are folded by linearity into three volumes
    # (center/z/y taps collapse; the two x-taps stay separate for the
    # banded x-lerp), and only those (r_in, R, R, 512) volumes are
    # upsampled.  Exact: 1-D border-clamped interps act on space, the
    # weight matmul on channels — they commute.
    proj = tuple(si for si, f in enumerate(vox_feats)
                 if f.shape[1] <= coarse_proj)
    if len(proj) == len(vox_feats):
        proj = ()  # degenerate tiny models: keep the plain path
    kept = tuple(si for si in range(len(vox_feats)) if si not in proj)

    def _rows(si):
        return jnp.asarray(_scale_w1_rows(channels, si))

    # Structured stack path (production default): same-resolution kept
    # scales are grouped (their channel axes concatenated) and the tap
    # stack is built as [taps 0-4 | tap x- | tap x+] per group — taps 0-4
    # share the x-center band, so their einsum has no batched tap dim and
    # its output layout is natural (the r3 trace showed ~20 ms/mesh of
    # 'syztc' transpose copies + column-major reshapes from the t-batched
    # formulation).  W rows are permuted to match.
    structured = fuse_scales and use_pallas != 1
    if structured:
        groups = []
        for si in kept:
            if groups and (vox_feats[groups[-1][0]].shape[1]
                           == vox_feats[si].shape[1]):
                groups[-1] = groups[-1] + (si,)
            else:
                groups.append((si,))
        if use_pallas == 2:
            # per-part fc_0 row blocks matching the un-concatenated
            # structured parts ([A5 | Ax- | Ax+] per group): the fused
            # head accumulates part @ block in VMEM, skipping the
            # (n, 791) stack concat entirely.
            w1_parts = []
            for g in groups:
                rows = _group_w1_rows(channels, g)
                cg = sum(channels[si] for si in g)
                for sl in (slice(0, 5 * cg), slice(5 * cg, 6 * cg),
                           slice(6 * cg, 7 * cg)):
                    w1_parts.append(jnp.asarray(
                        w1[:n_vox_rows][jnp.asarray(rows[sl])],
                        compute_dtype))
            w1_vox = None
        else:
            w1_vox = jnp.concatenate(
                [w1[:n_vox_rows][jnp.asarray(_group_w1_rows(channels, g))]
                 for g in groups]).astype(compute_dtype)
    elif fuse_scales:
        w1_vox = jnp.concatenate(
            [jnp.take(w1[:n_vox_rows], _rows(si), axis=0)
             for si in kept]).astype(compute_dtype)
    else:
        w1_scale = [jnp.take(w1[:n_vox_rows], _rows(si),
                             axis=0).astype(compute_dtype) for si in kept]
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
    if percep_collapse:
        # 2D corner collapse of the projected map (the dense-path analog
        # of the r4 training-sampler win): row (y, x) holds the four
        # bilinear corners [(y,x) | (y,x+1) | (y+1,x) | (y+1,x+1)], +1
        # edge-clamped exactly like the min(i+1, ms-1) corner indices —
        # ONE gathered row per query instead of four, contiguous 4 KB
        # rows, identical bytes.  4x the map's HBM (77 MB bf16) built
        # once per decode.  Reference analog: modules.py:15-59.
        pm2 = pm512[0]
        sx = jnp.concatenate([pm2[:, 1:], pm2[:, -1:]], axis=1)
        sy = jnp.concatenate([pm2[1:], pm2[-1:]], axis=0)
        sxy = jnp.concatenate([sx[1:], sx[-1:]], axis=0)
        pmc = jnp.concatenate([pm2, sx, sy, sxy], axis=-1)
        pm512 = pmc[None]

    w2 = decoder_params['fc_1']['kernel']
    b2 = decoder_params['fc_1']['bias']
    w3 = decoder_params['fc_2']['kernel']
    b3 = decoder_params['fc_2']['bias']
    w4 = decoder_params['fc_out']['kernel']
    b4 = decoder_params['fc_out']['bias']

    vols = [f[0].astype(compute_dtype) for f in vox_feats]

    # Shape-uniform per-slab plans -> ONE compiled slab program via scan.
    assert R % slab == 0, (R, slab)
    S = slab
    n = S * R * R
    # entities the slab loop iterates over: scale groups (structured) or
    # individual kept scales (pallas / per-scale A/B paths)
    ents = groups if structured else [(si,) for si in kept]
    ent_vols = [(vols[g[0]] if len(g) == 1
                 else jnp.concatenate([vols[si] for si in g], axis=-1))
                for g in ents]
    ent_chs = tuple(sum(channels[si] for si in g) for g in ents)
    plan_los, plan_L7s = [], []
    for g in ents:
        los, L7s = _scan_x_plans(R, vols[g[0]].shape[0], S, delta,
                                 bb_min, bb_max)
        plan_los.append(jnp.asarray(los))
        plan_L7s.append(jnp.asarray(L7s, compute_dtype))
    x0s = jnp.arange(0, R, S, dtype=jnp.int32)

    # ---- hoisted z/y tap variants (structured path; auto at small slabs,
    # where the per-slab x-windows overlap most: window ~ S + 2*4.6 rows
    # at 128^3, so slab 8/16 recompute the z/y chain 2.4x/1.6x while slab
    # 64 only 1.16x — measured on v5e: slab16 0.219 hoisted vs 0.239,
    # slab8 0.222 vs 0.300, but slab64 (production 128^3) 0.225 vs 0.211,
    # where the hoisted volumes' extra write+read exceeds the saving. ----
    if hoist_variants is None:
        hoist_variants = R <= 128 and S <= 16
    hoist = bool(hoist_variants) and structured
    # center-tap x-plan identity per entity (static): holds when r_in == R
    # and the output positions land exactly on input rows (w == 0).
    ent_ident = []
    for f in ent_vols:
        i0, i1, w = _axis_plan(R, f.shape[0], 0.0, bb_min, bb_max)
        ent_ident.append(bool((w == 0).all()
                              and (i0 == np.arange(R)).all()))
    ent_ident = tuple(ent_ident)
    if hoist:
        hoisted = []
        for f in ent_vols:
            r_in = f.shape[0]
            dzf = norm_shift(delta, r_in)
            z0 = resample_axis(f, 2, R, 0.0, bb_min, bb_max)
            zp = resample_axis(f, 2, R, dzf, bb_min, bb_max)
            zm = resample_axis(f, 2, R, -dzf, bb_min, bb_max)
            var_full = {
                (0, 0): resample_axis(z0, 1, R, 0.0, bb_min, bb_max),
                (1, 0): resample_axis(z0, 1, R, dzf, bb_min, bb_max),
                (-1, 0): resample_axis(z0, 1, R, -dzf, bb_min, bb_max),
                (0, 1): resample_axis(zp, 1, R, 0.0, bb_min, bb_max),
                (0, -1): resample_axis(zm, 1, R, 0.0, bb_min, bb_max),
            }
            hoisted.append(jnp.concatenate(
                [var_full[key] for (_, key) in TAPS[:5]], axis=-1))
        ent_vols = hoisted  # scan body consumes (r_in, R, R, 5*ch) Vcats

    # ---- coarse-projected volumes (once per decode, outside the scan) ----
    proj_vols, proj_Ls = [], []
    for si in proj:
        V = vols[si]
        r_in = V.shape[0]
        dz = norm_shift(delta, r_in)

        def tap_w(t, si=si):
            return w1[:n_vox_rows][
                jnp.asarray(_tap_w1_rows(channels, si, t))].astype(
                    compute_dtype)

        def P(t, si=si, V=V):
            return jnp.einsum('xyzc,co->xyzo', V, tap_w(t, si),
                              preferred_element_type=jnp.float32).astype(
                                  compute_dtype)

        rz = lambda v, s: resample_axis(v, 2, R, s, bb_min, bb_max)
        ry = lambda v, s: resample_axis(v, 1, R, s, bb_min, bb_max)
        # TAPS order: t0 center, t1 z-, t2 z+, t3 y-, t4 y+, t5 x-, t6 x+
        Tc = rz(P(0), 0.0) + rz(P(2), dz) + rz(P(1), -dz)
        U0 = ry(Tc, 0.0) + ry(rz(P(4), 0.0), dz) + ry(rz(P(3), 0.0), -dz)
        Uxp = ry(rz(P(6), 0.0), 0.0)
        Uxm = ry(rz(P(5), 0.0), 0.0)
        # Flattened to (r_in, R*R*512) and concatenated along the source-
        # row axis in XTAPS order (0,+1,-1): the whole coarse contribution
        # becomes ONE (S, Ktot) x (Ktot, R*R*512) matmul per slab with a
        # single f32 output in the consumer's row-major layout.  The
        # jnp.stack'd + dynamic-sliced banded formulation cost ~34 ms/mesh
        # (pad/copy fusion + pathological tuple slice + output-layout
        # copy); per-tap accumulated einsums cost ~73 ms (six 537 MB f32
        # add-chain writes).  Full-window reads of the tiny coarse volumes
        # are cheaper than either.
        # 3-D (r_in, R*R, 512), NOT (r_in, R*R*512): the matmul output
        # (S, R*R, 512) then bitcasts to (S*R*R, 512) — R*R % 8 == 0 keeps
        # the (8,128) row tiling aligned at plane boundaries, while the
        # flat 2-D form forced a 537 MB retile copy (27.8 ms/slab-pair).
        proj_vols.extend(U.reshape(r_in, R * R, U.shape[-1])
                         for U in (U0, Uxp, Uxm))
        proj_Ls.append(_scan_x_plans_full(R, r_in, S, delta, bb_min, bb_max))

    # One scanned (nslabs, S, Ktot) x-lerp matrix covering every projected
    # scale and tap; Ucat holds the matching flattened volume rows.
    nslabs = R // S
    if coarse_outside is None:
        # The hoisted coarse volume is (R, R*R, 512) in compute dtype —
        # 2.1 GB bf16 at 128^3, 17 GB at 256^3; auto-gate by size.
        coarse_outside = R <= 128
    outside = bool(proj) and coarse_outside
    if proj:
        Ucat = jnp.concatenate(proj_vols, axis=0)
        Lcat = jnp.concatenate(
            [np.transpose(L, (0, 2, 1, 3)).reshape(nslabs, S, -1)
             for L in proj_Ls], axis=-1)
        Lcat = jnp.asarray(Lcat, compute_dtype)
    else:
        Ucat = None
        Lcat = jnp.zeros((nslabs, S, 0), compute_dtype)
    if outside:
        # Hoist the banded x-lerp out of the scan: ONE einsum produces the
        # summed coarse fc_0 contribution for the WHOLE grid, written once
        # in the scan consumer's row-major layout.  The in-scan form paid,
        # per slab, a full-window Ucat read + an (S, R*R, 512) f32
        # {2,0,1}->{2,1,0} layout copy (copy.855 in the r3 slab-64 trace,
        # ~6.5 ms/slab) that the hoisted single pass does not.
        Cfull = jnp.einsum('rk,kmo->rmo', Lcat.reshape(R, -1), Ucat,
                           preferred_element_type=jnp.float32)
        Cslabs = Cfull.astype(compute_dtype).reshape(
            nslabs, S, R * R, Cfull.shape[-1])
        Ucat = None  # the scan body takes the sliced volume instead
    else:
        Cslabs = jnp.zeros((nslabs, 1, 1, 1), compute_dtype)

    consts = {
        'vols': ent_vols,
        'pm512': pm512,
        'trans_mat': trans_mat, 'Ucat': Ucat,
        'w1_xyz': w1_xyz, 'b1': b1, 'w2': w2, 'b2': b2, 'w3': w3, 'b3': b3,
        'w4': w4, 'b4': b4,
    }
    if fuse_scales and use_pallas == 2:
        consts['w1_parts'] = w1_parts
    elif fuse_scales:
        consts['w1_vox'] = w1_vox
    else:
        consts['w1_scale'] = w1_scale

    def slab_body(xs, C):
        x0, los, L7s, Lc, Cs = xs
        vols_, pm512_, trans_mat_ = C['vols'], C['pm512'], C['trans_mat']
        w1_xyz_, b1_ = C['w1_xyz'], C['b1']
        w2_, b2_, w3_, b3_, w4_, b4_ = (C['w2'], C['b2'], C['w3'], C['b3'],
                                        C['w4'], C['b4'])

        # ---- voxel features: slab-local variants + banded tap einsum -----
        parts = []
        for gi, f in enumerate(vols_):
            if hoist:
                # f is the hoisted (r_in, R, R, 5*ch) Vcat; its first ch
                # block is the center variant the x-taps lerp.
                ch = ent_chs[gi]
                r_max = L7s[gi].shape[-1]
                sub = jax.lax.dynamic_slice(
                    f, (los[gi], 0, 0, 0), (r_max, R, R, 5 * ch))
                if ent_ident[gi]:
                    # center-tap x-plan is the identity: the 5-tap part IS
                    # the slab's rows of Vcat (the one-hot f32 einsum would
                    # reproduce them bit-exactly; skip it).
                    A5 = jax.lax.dynamic_slice(
                        f, (x0, 0, 0, 0), (S, R, R, 5 * ch))
                    parts.append(A5.reshape(n, 5 * ch))
                else:
                    A5 = jnp.einsum('sr,ryzk->syzk', L7s[gi][0], sub,
                                    preferred_element_type=jnp.float32)
                    parts.append(A5.astype(compute_dtype).reshape(n, 5 * ch))
                Vx = sub[..., :ch]
                Axm = jnp.einsum('sr,ryzc->syzc', L7s[gi][5], Vx,
                                 preferred_element_type=jnp.float32)
                Axp = jnp.einsum('sr,ryzc->syzc', L7s[gi][6], Vx,
                                 preferred_element_type=jnp.float32)
                parts += [Axm.astype(compute_dtype).reshape(n, ch),
                          Axp.astype(compute_dtype).reshape(n, ch)]
                continue
            r_in = f.shape[0]
            ch = f.shape[-1]
            r_max = L7s[gi].shape[-1]
            sub = jax.lax.dynamic_slice(
                f, (los[gi], 0, 0, 0), (r_max, r_in, r_in, ch))
            dz = norm_shift(delta, r_in)
            z0 = resample_axis(sub, 2, R, 0.0, bb_min, bb_max)
            zp = resample_axis(sub, 2, R, dz, bb_min, bb_max)
            zm = resample_axis(sub, 2, R, -dz, bb_min, bb_max)
            variants = {
                (0, 0): resample_axis(z0, 1, R, 0.0, bb_min, bb_max),
                (1, 0): resample_axis(z0, 1, R, dz, bb_min, bb_max),
                (-1, 0): resample_axis(z0, 1, R, -dz, bb_min, bb_max),
                (0, 1): resample_axis(zp, 1, R, 0.0, bb_min, bb_max),
                (0, -1): resample_axis(zm, 1, R, 0.0, bb_min, bb_max),
            }
            if structured:
                # Taps 0-4 share the x-center band (TAPS x_sign == 0), so
                # ONE un-batched einsum covers them with the tap axis
                # folded into channels — natural output layout, free
                # reshape (the t-batched 'syztc' formulation cost ~20
                # ms/mesh of transpose copies + column-major reshapes).
                Vcat = jnp.concatenate(
                    [variants[key] for (_, key) in TAPS[:5]], axis=-1)
                A5 = jnp.einsum('sr,ryzk->syzk', L7s[gi][0], Vcat,
                                preferred_element_type=jnp.float32)
                Axm = jnp.einsum('sr,ryzc->syzc', L7s[gi][5],
                                 variants[(0, 0)],
                                 preferred_element_type=jnp.float32)
                Axp = jnp.einsum('sr,ryzc->syzc', L7s[gi][6],
                                 variants[(0, 0)],
                                 preferred_element_type=jnp.float32)
                # (k, n)-major parts + 'kn,ko->no' matmul were also tried:
                # bit-identical, same speed (the concat transpose just
                # moves into the einsum epilogues) — row-major kept.
                parts += [A5.astype(compute_dtype).reshape(n, 5 * ch),
                          Axm.astype(compute_dtype).reshape(n, ch),
                          Axp.astype(compute_dtype).reshape(n, ch)]
                continue
            # (7, r, R, R, C): per-tap source rows (x-shifted taps reuse the
            # same slab row range; L7 encodes their shifted bands).
            V7 = jnp.stack([variants[key] for (_, key) in TAPS])
            if use_pallas == 1:
                # t-major: the batched matmul's NATIVE output layout — no
                # transpose; the Pallas head consumes (7, n, C) directly.
                A = jnp.einsum('tsr,tryzc->tsyzc', L7s[gi], V7,
                               preferred_element_type=jnp.float32)
                parts.append(A.astype(compute_dtype).reshape(7, n, ch))
            else:
                A = jnp.einsum('tsr,tryzc->syztc', L7s[gi], V7,
                               preferred_element_type=jnp.float32)
                parts.append(A.astype(compute_dtype).reshape(n, 7 * ch))

        # ---- coarse-projected scales: full-window x-lerp of the folded
        # (r_in, R*R*512) volumes as ONE flattened matmul — their summed
        # fc_0 contribution, single f32 output, row-major, no slices. ----
        coarse = None
        if outside:
            coarse = Cs.reshape(n, Cs.shape[-1])
        elif C['Ucat'] is not None:
            # (m,k,o)-ordered Ucat, bf16 output, and an epilogue barrier on
            # the fc_0 ReLU were all A/B'd: none beat this form.
            coarse = jnp.einsum('sk,kmo->smo', Lc, C['Ucat'],
                                preferred_element_type=jnp.float32)
            coarse = coarse.reshape(n, coarse.shape[-1])

        # ---- perceptual part (pre-projected 512-ch maps) -----------------
        # Projection + index math runs on full-lane (S, R, R) planes: the
        # (n, 3)/(n, 2) formulation wasted 125 of 128 lanes and lowered to
        # reverse/pad/concat fusions plus an f32[n,2] staging copy worth
        # ~40 ms per 128^3 decode (r3 slab-64 trace: reverse.8,
        # pad_maximum_fusion.24, copy-start.13).
        step = (bb_max - bb_min) / (R - 1)
        fx = (jax.lax.broadcasted_iota(jnp.float32, (S, R, R), 0)
              + jnp.asarray(x0, jnp.float32)) * step + bb_min
        fy = jax.lax.broadcasted_iota(jnp.float32, (S, R, R), 1) \
            * step + bb_min
        fz = jax.lax.broadcasted_iota(jnp.float32, (S, R, R), 2) \
            * step + bb_min
        # decoder coords q = (2z, 2y, 2x); homogeneous row (q, 1) @ T
        t = trans_mat_[0]
        p0, p1, p2 = 2.0 * fz, 2.0 * fy, 2.0 * fx
        u = p0 * t[0, 0] + p1 * t[1, 0] + p2 * t[2, 0] + t[3, 0]
        v = p0 * t[0, 1] + p1 * t[1, 1] + p2 * t[2, 1] + t[3, 1]
        d = p0 * t[0, 2] + p1 * t[1, 2] + p2 * t[2, 2] + t[3, 2]
        # coords stay f32 pixels (bf16 loses sub-pixel precision)
        xpix = jnp.clip(u / (d + 1e-8), 0.0, float(ms - 1))
        ypix = jnp.clip(v / (d + 1e-8), 0.0, float(ms - 1))
        x0i = jnp.floor(xpix).astype(jnp.int32)
        y0i = jnp.floor(ypix).astype(jnp.int32)
        x1i = jnp.minimum(x0i + 1, ms - 1)
        y1i = jnp.minimum(y0i + 1, ms - 1)
        wxf = (xpix - x0i.astype(jnp.float32)).reshape(n, 1) \
            .astype(pm512_.dtype)
        wyf = (ypix - y0i.astype(jnp.float32)).reshape(n, 1) \
            .astype(pm512_.dtype)
        flat = pm512_[0].reshape(ms * ms, -1)
        if percep_collapse:
            # collapsed map: ONE row per query carries all 4 corners
            rows = jnp.take(flat, (y0i * ms + x0i).reshape(n), axis=0,
                            mode='clip')
            cp = rows.shape[-1] // 4
            top = rows[:, :cp] * (1 - wxf) + rows[:, cp:2 * cp] * wxf
            bot = (rows[:, 2 * cp:3 * cp] * (1 - wxf)
                   + rows[:, 3 * cp:] * wxf)
            percep = top * (1 - wyf) + bot * wyf
        else:
            # one batched 4-corner gather (per-gather fixed costs
            # dominate); clip mode: indices in-bounds by construction
            idx = jnp.concatenate([
                (y0i * ms + x0i).reshape(n), (y0i * ms + x1i).reshape(n),
                (y1i * ms + x0i).reshape(n), (y1i * ms + x1i).reshape(n)])
            vals = jnp.take(flat, idx, axis=0, mode='clip').reshape(4, n, -1)
            top = vals[0] * (1 - wxf) + vals[1] * wxf
            bot = vals[2] * (1 - wxf) + vals[3] * wxf
            percep = top * (1 - wyf) + bot * wyf

        if use_pallas == 1:
            from list_tpu.ops.pallas.fused_fc0 import fused_fc0_mlp
            p512 = percep.astype(jnp.float32)
            if coarse is not None:
                p512 = p512 + coarse
            q3 = jnp.stack([p0, p1, p2], axis=-1).reshape(n, 3)
            sdf = fused_fc0_mlp(
                parts, p512.astype(compute_dtype), q3,
                C['w1_scale'], w1_xyz_, b1_,
                w2_, b2_, w3_, b3_, w4_, b4_,
                tile=min(1024, n), interpret=pallas_interpret)
            return sdf.reshape(S, R, R)

        if fuse_scales:
            if use_pallas == 2:
                # fused structured head: per-part fc_0 accumulation (no
                # (n, 791) stack concat) + coarse/percep/xyz adds + ReLU
                # + MLP tail in one Pallas kernel — the (n, 512) f32
                # activations and both ReLU intermediates stay in VMEM.
                from list_tpu.ops.pallas.fused_fc0 import fused_stack_head
                # pre-padded (n, 8) coord block built from the full-lane
                # planes (one fused stack write; the kernel's .at[].set
                # padding was another narrow-lane pass)
                z8 = jnp.zeros_like(p0)
                qpad8 = jnp.stack(
                    [p0, p1, p2, z8, z8, z8, z8, z8], axis=-1).reshape(n, 8)
                sdf = fused_stack_head(
                    parts, coarse, percep, qpad8, C['w1_parts'],
                    w1_xyz_, b1_, w2_, b2_, w3_, b3_, w4_, b4_,
                    tile=pl_tile, interpret=pallas_interpret)
                return sdf.reshape(S, R, R)
            stack = jnp.concatenate(parts, axis=-1)  # (n, 7*sum(C_kept))
            fc0 = jnp.dot(stack, C['w1_vox'],
                          preferred_element_type=jnp.float32)
        else:
            fc0 = None
            for ki, part in enumerate(parts):
                p = jnp.dot(part, C['w1_scale'][ki],
                            preferred_element_type=jnp.float32)
                fc0 = p if fc0 is None else fc0 + p
        if coarse is not None:
            fc0 = fc0 + coarse
        fc0 = fc0 + percep.astype(jnp.float32)
        # xyz rows as broadcast FMAs off the full-lane planes (the (n, 3)
        # @ (3, 512) degenerate-K matmul forced an (n, 3) materialization)
        wxr = w1_xyz_.astype(jnp.float32)
        fc0 = (fc0 + p0.reshape(n, 1) * wxr[0] + p1.reshape(n, 1) * wxr[1]
               + p2.reshape(n, 1) * wxr[2] + b1_)

        # ---- MLP tail ----------------------------------------------------
        h = jax.nn.relu(fc0).astype(compute_dtype)
        h = jax.nn.relu(jnp.dot(h, w2_.astype(compute_dtype),
                                preferred_element_type=jnp.float32) + b2_)
        h = h.astype(compute_dtype)
        h = jax.nn.relu(jnp.dot(h, w3_.astype(compute_dtype),
                                preferred_element_type=jnp.float32) + b3_)
        sdf = jnp.dot(h.astype(compute_dtype), w4_.astype(compute_dtype),
                      preferred_element_type=jnp.float32) + b4_
        return sdf.reshape(S, R, R)

    xss = (x0s, plan_los, plan_L7s, Lcat, Cslabs)

    def scan_slabs(xss_, C):
        _, slabs = jax.lax.scan(lambda carry, xs: (None, slab_body(xs, C)),
                                None, xss_, unroll=scan_unroll)
        return slabs

    if mesh is not None and shard_axis is not None \
            and mesh.shape[shard_axis] > 1:
        import inspect
        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P
        nsh = mesh.shape[shard_axis]
        assert (R // S) % nsh == 0, (R, S, nsh)
        # replication checking kwarg: check_rep (experimental API) was
        # renamed check_vma in the public jax.shard_map; disable under
        # either name (the per-slab body is trivially shardable).
        _params = inspect.signature(shard_map).parameters
        _kw = {k: False for k in ('check_rep', 'check_vma') if k in _params}
        slabs = shard_map(
            scan_slabs, mesh=mesh,
            in_specs=(jax.tree.map(lambda _: P(shard_axis), xss),
                      jax.tree.map(lambda _: P(), consts)),
            out_specs=P(shard_axis), **_kw)(xss, consts)
    else:
        slabs = scan_slabs(xss, consts)
    return slabs.reshape(R, R, R)


def feat_l2_channels(feat_l2) -> int:
    return sum(int(f.shape[-1]) for f in feat_l2)


def grid_world_coords(R: int, x0, S: int, bb_min: float = -0.5,
                      bb_max: float = 0.5) -> jnp.ndarray:
    """(1, S*R*R, 3) world coordinates of dense-grid rows [x0, x0+S),
    computed in-graph (a numpy meshgrid would bake megabytes of constants
    into the HLO — at 256^3 that overwhelms the compiler).  ``x0`` may be
    a python int or a traced int32 scalar (lax.scan slab counter)."""
    step = (bb_max - bb_min) / (R - 1)
    x0 = jnp.asarray(x0, jnp.float32)
    i = jax.lax.broadcasted_iota(jnp.float32, (S, R, R), 0) + x0
    j = jax.lax.broadcasted_iota(jnp.float32, (S, R, R), 1)
    k = jax.lax.broadcasted_iota(jnp.float32, (S, R, R), 2)
    world = jnp.stack([i, j, k], axis=-1) * step + bb_min
    return world.reshape(1, S * R * R, 3)
