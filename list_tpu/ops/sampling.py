"""Bilinear/trilinear sampling with exact PyTorch ``F.grid_sample`` /
``F.interpolate`` semantics, channels-last (TPU-native layouts).

These are the single biggest numerical-parity risk flagged in SURVEY.md §7:
- 2D sampling at 137x137 inside PerceptualPooling (reference:
  network/modules.py:48-52, ``align_corners=True``, default zeros padding).
- 3D sampling of 6 voxel-feature scales x 7 displacements inside
  VoxelDecoder2 (reference: network/modules.py:263-265,
  ``padding_mode='border', align_corners=True``).
- Feature-map resizing to 137x137 (reference: network/modules.py:26-35,
  ``F.interpolate(..., mode='bilinear', align_corners=True)``), implemented
  here as two exact interpolation-matrix matmuls (MXU-friendly).

Conventions (identical to torch): ``grid[..., 0]`` is the normalized x
coordinate indexing the **last** spatial axis (W), ``grid[..., 1]`` indexes H,
``grid[..., 2]`` indexes D.  ``align_corners=True`` unnormalizes as
``ix = (x + 1) / 2 * (size - 1)``.

Parity is enforced by tests/test_sampling.py against torch.nn.functional on
randomized inputs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _unnormalize(coord, size: int, align_corners: bool):
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def _corner_weights(ix, size: int, padding_mode: str):
    """Return (i0, i1, w1, mask0, mask1) for 1-D linear interpolation.

    i0/i1 are gather-safe int32 indices, w1 the weight of i1.  For
    ``zeros`` padding, mask0/mask1 zero out out-of-bounds corners; for
    ``border``, coordinates are clamped first and masks are all-ones.
    """
    if padding_mode == 'border':
        ix = jnp.clip(ix, 0.0, size - 1)
    i0f = jnp.floor(ix)
    w1 = ix - i0f
    i0 = i0f.astype(jnp.int32)
    i1 = i0 + 1
    if padding_mode == 'zeros':
        mask0 = (i0 >= 0) & (i0 <= size - 1)
        mask1 = (i1 >= 0) & (i1 <= size - 1)
    else:
        mask0 = mask1 = None
    i0 = jnp.clip(i0, 0, size - 1)
    i1 = jnp.clip(i1, 0, size - 1)
    return i0, i1, w1, mask0, mask1


def grid_sample_2d(image: jnp.ndarray, grid: jnp.ndarray, *,
                   padding_mode: str = 'zeros',
                   align_corners: bool = True) -> jnp.ndarray:
    """Bilinear sampling. image: (B, H, W, C); grid: (B, N, 2) -> (B, N, C)."""
    B, H, W, C = image.shape
    x = _unnormalize(grid[..., 0], W, align_corners)
    y = _unnormalize(grid[..., 1], H, align_corners)

    x0, x1, wx, mx0, mx1 = _corner_weights(x, W, padding_mode)
    y0, y1, wy, my0, my1 = _corner_weights(y, H, padding_mode)

    N = x0.shape[1]

    # all 4 corners in ONE flat global-index take ((B*H*W, C) operand):
    # one gather op, and no take_along_axis layout-transposing index
    # copies (the r3 train-step trace's dominant fixed cost)
    idx = jnp.stack([y0 * W + x0, y0 * W + x1,
                     y1 * W + x0, y1 * W + x1], axis=1)  # (B, 4, N)
    gidx = jnp.arange(B, dtype=idx.dtype)[:, None, None] * (H * W) + idx
    # mode='clip': indices are in-bounds by construction (_corner_weights
    # clips i0/i1 even for 'zeros' padding — the masks below handle OOB
    # zeroing).  The default fill semantics materialize a broadcast-select
    # over the full gathered values (26 ms per 128^3 mesh in the r3 trace).
    vals = jnp.take(image.reshape(B * H * W, C), gidx.reshape(-1), axis=0,
                    mode='clip')
    vals = vals.reshape(B, 4, N, C)
    v00, v01, v10, v11 = (vals[:, 0], vals[:, 1], vals[:, 2], vals[:, 3])

    if padding_mode == 'zeros':
        v00 = v00 * (my0 & mx0)[..., None]
        v01 = v01 * (my0 & mx1)[..., None]
        v10 = v10 * (my1 & mx0)[..., None]
        v11 = v11 * (my1 & mx1)[..., None]

    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def grid_sample_3d(volume: jnp.ndarray, grid: jnp.ndarray, *,
                   padding_mode: str = 'border',
                   align_corners: bool = True) -> jnp.ndarray:
    """Trilinear sampling. volume: (B, D, H, W, C); grid: (B, N, 3) -> (B, N, C)."""
    B, D, H, W, C = volume.shape
    x = _unnormalize(grid[..., 0], W, align_corners)
    y = _unnormalize(grid[..., 1], H, align_corners)
    z = _unnormalize(grid[..., 2], D, align_corners)

    x0, x1, wx, mx0, mx1 = _corner_weights(x, W, padding_mode)
    y0, y1, wy, my0, my1 = _corner_weights(y, H, padding_mode)
    z0, z1, wz, mz0, mz1 = _corner_weights(z, D, padding_mode)

    flat = volume.reshape(B, D * H * W, C)

    def gather(zi, yi, xi):
        idx = (zi * H + yi) * W + xi
        return jnp.take_along_axis(flat, idx[..., None], axis=1,
                                   mode='clip')

    def mask(vals, mz, my, mx):
        if padding_mode == 'zeros':
            return vals * (mz & my & mx)[..., None]
        return vals

    wx = wx[..., None]
    wy = wy[..., None]
    wz = wz[..., None]

    def plane(zi, mz):
        v00 = mask(gather(zi, y0, x0), mz, my0, mx0)
        v01 = mask(gather(zi, y0, x1), mz, my0, mx1)
        v10 = mask(gather(zi, y1, x0), mz, my1, mx0)
        v11 = mask(gather(zi, y1, x1), mz, my1, mx1)
        top = v00 * (1 - wx) + v01 * wx
        bot = v10 * (1 - wx) + v11 * wx
        return top * (1 - wy) + bot * wy

    front = plane(z0, mz0)
    back = plane(z1, mz1)
    return front * (1 - wz) + back * wz


@functools.lru_cache(maxsize=64)
def _resize_matrix(in_size: int, out_size: int, dtype_name: str) -> np.ndarray:
    """(out_size, in_size) linear-interpolation matrix, align_corners=True."""
    if out_size == 1:
        m = np.zeros((1, in_size))
        m[0, 0] = 1.0
        return m.astype(dtype_name)
    pos = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    i0 = np.floor(pos).astype(np.int64)
    i0 = np.clip(i0, 0, in_size - 1)
    i1 = np.clip(i0 + 1, 0, in_size - 1)
    w1 = pos - i0
    m = np.zeros((out_size, in_size))
    np.add.at(m, (np.arange(out_size), i0), 1.0 - w1)
    np.add.at(m, (np.arange(out_size), i1), w1)
    return m.astype(dtype_name)


def resize_bilinear_align_corners(image: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Exact F.interpolate(mode='bilinear', align_corners=True).

    image: (B, H, W, C) -> (B, out_h, out_w, C).  Implemented as two
    interpolation-matrix contractions, which XLA maps onto the MXU instead of
    a gather.
    """
    B, H, W, C = image.shape
    if H == out_h and W == out_w:
        # The interpolation matrix is exactly the identity here; skip the
        # matmuls (lets callers pre-resize maps once and re-call cheaply,
        # e.g. the chunked training decode).
        return image
    dt = np.dtype(image.dtype).name if image.dtype != jnp.bfloat16 else 'float32'
    mh = jnp.asarray(_resize_matrix(H, out_h, dt), dtype=image.dtype)
    mw = jnp.asarray(_resize_matrix(W, out_w, dt), dtype=image.dtype)
    # HIGHEST precision: default matmul passes truncate mantissas enough to
    # break parity with torch's f32 interpolation.
    out = jnp.einsum('oh,bhwc->bowc', mh, image,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum('pw,bowc->bopc', mw, out,
                      precision=jax.lax.Precision.HIGHEST)


# ---- fold-packed multiscale sampling (training path) -----------------------
#
# A channels-last (B, D*H*W, C) gather operand with C in {1..64} gets its
# lane dim padded to 128 by XLA-TPU (a (8, 128^3, 16) f32 buffer -> 8.6 GB).
# Packing g = 128/C consecutive W-points into the lane dim keeps the operand
# dense: (B, D*H*W/g, g*C).  A gathered row holds g candidate points; the
# right one is selected with a tiny one-hot einsum.

def pack_meta(shape_dhwc):
    """(D, H, W, C) -> fold factor g (largest power of two <= 128/C that
    divides W)."""
    D, H, W, C = shape_dhwc
    g = 1
    while g * 2 * C <= 128 and W % (g * 2) == 0:
        g *= 2
    return g


def pack_channels_last(f: jnp.ndarray, dtype=None):
    """(B, D, H, W, C) -> ((B, D*H*W/g, g*C), (D, H, W, C, g)).  Pure
    reshape (W-major groups are contiguous)."""
    B, D, H, W, C = f.shape
    g = pack_meta((D, H, W, C))
    if dtype is not None:
        f = f.astype(dtype)
    return f.reshape(B, D * H * W // g, g * C), (D, H, W, C, g)


def pack_cmajor(f: jnp.ndarray, dtype=None):
    """(B, C, D, H, W) -> same packed form (one transpose whose output is
    lane-dense).  Cast BEFORE the transpose: XLA materializes the permuted
    intermediate channels-minor (lane-padded to 128), so its bytes — 8 GB
    f32 for the batch-8 16ch@128^3 feature — halve in bf16."""
    B, C, D, H, W = f.shape
    g = pack_meta((D, H, W, C))
    if dtype is not None:
        f = f.astype(dtype)
    if C == 1:
        return f.reshape(B, D * H * W // g, g), (D, H, W, C, g)
    ft = jnp.transpose(f, (0, 2, 3, 4, 1))
    return ft.reshape(B, D * H * W // g, g * C), (D, H, W, C, g)


def _sample_packed_one(packed: jnp.ndarray, meta, pd: jnp.ndarray,
                       fuse_planes: bool = False) -> jnp.ndarray:
    """Trilinear border/align-corners sample of one packed scale.
    packed: (B, M, g*C); pd: (B, Np, 3) normalized coords -> (B, Np, C).

    The four (y, x) corners of each z-plane are fetched in ONE batched
    gather (2 gather ops per trilinear sample instead of 8): the r3 trace
    showed ~1 s/step of fixed per-gather-op index copies/slices — the
    train step is gather-latency bound (459 GB at 169 GB/s, 0.4% MFU), so
    op count, not bytes, is the cost driver.  Corner batching keeps the
    peak gathered intermediate at (B, 4*Np, g*C).

    fuse_planes=True additionally batches BOTH z-planes into a single
    take (1 gather op per trilinear sample); numerically identical — the
    corner order within the (B, 8, Np) index block matches the two
    sequential plane() calls — at the cost of a 2x larger (B, 8, Np, g*C)
    gathered transient."""
    D, H, W, C, g = meta
    B, Np, _ = pd.shape
    x = _unnormalize(pd[..., 0], W, True)
    y = _unnormalize(pd[..., 1], H, True)
    z = _unnormalize(pd[..., 2], D, True)
    x0, x1, wx, _, _ = _corner_weights(x, W, 'border')
    y0, y1, wy, _, _ = _corner_weights(y, H, 'border')
    z0, z1, wz, _, _ = _corner_weights(z, D, 'border')

    wx = wx[..., None]
    wy = wy[..., None]
    wz = wz[..., None]

    M = packed.shape[1]

    def _flats(zi):
        base = zi * H
        return jnp.stack([(base + y0) * W + x0, (base + y0) * W + x1,
                          (base + y1) * W + x0, (base + y1) * W + x1],
                         axis=1)  # (B, 4, Np)

    def _take_select(flats):
        # flat global-index take over (B*M, gC): avoids take_along_axis's
        # layout-transposing s32 index copies (measured 1.6x faster on the
        # dense path, CLAUDE.md).  A dense one-hot-matmul variant for the
        # 8^3 scale was tried and rejected: its (B, 4, 7N, 512) one-hot
        # costs ~2 GB peak HBM and OOMs the no-decode-remat batch-4 step.
        k = flats.shape[1]
        gidx = (jnp.arange(B, dtype=flats.dtype)[:, None, None] * M
                + flats // g)
        rows = jnp.take(packed.reshape(B * M, g * C),
                        gidx.reshape(-1), axis=0, mode='clip')
        rows = rows.reshape(B, k, Np, g, C)
        if g == 1:  # unfolded scale (C == 128): the row IS the point
            return rows[:, :, :, 0]
        oh = jax.nn.one_hot(flats % g, g, dtype=rows.dtype)
        return jnp.einsum('bkng,bkngc->bknc', oh, rows)

    def _lerp4(vals):  # (B, 4, Np, C) corners of one z-plane
        top = vals[:, 0] * (1 - wx) + vals[:, 1] * wx
        bot = vals[:, 2] * (1 - wx) + vals[:, 3] * wx
        return top * (1 - wy) + bot * wy

    if fuse_planes:
        vals = _take_select(jnp.concatenate([_flats(z0), _flats(z1)],
                                            axis=1))  # (B, 8, Np, C)
        return _lerp4(vals[:, :4]) * (1 - wz) + _lerp4(vals[:, 4:]) * wz

    def plane(zi):
        return _lerp4(_take_select(_flats(zi)))

    return plane(z0) * (1 - wz) + plane(z1) * wz


# ---- corner-collapsed sampling (training path) ------------------------------
#
# The train step is gather-ISSUE bound (~34M row-issues/s effective in-step
# vs 116-222M in isolation; tools/probe_gather_modes.py).  Corner collapsing
# cuts gathered ROWS 8x: pre-replicate the z+1 / y+1 neighbor planes into
# the row (4 quads) and window x with overlap (width gh, stride gh-1) so
# both x corners always share a row -> ONE row-read per displacement tap
# yields all 8 trilinear corners.  The collapsed volume costs ~4x the scale's
# bytes and is built ONCE per step (outside the chunk loop) from reshape/
# strided-slice/concat only — a stack-of-windows build materializes a
# 6.7x-padded cotangent in backward and OOMs (tools/probe_corner_collapse.py;
# measured per-chunk f+b on v5e: s0 33.9->10.8 ms, s2 32.8->23.2,
# s3 33.9->12.8, s5 16.5->10.6; the 16ch@128^3 scale LOSES — its collapsed
# volume is 1.27 GB at batch 4 — and 128ch@16^3 is a wash, so the default
# set is (0, 2, 3, 5)).


def collapse_meta(meta, mode: str = 'full'):
    """Static geometry of a collapsed scale: (gh, stride, XR, row_len).

    mode 'full' replicates the 4 (z, y) quads into the row (1 gathered row
    per tap, ~4x volume bytes); 'halo' only overlap-windows x (4 rows per
    tap — the z/y corners stay separate fetches — at ~W/(W-g) x volume:
    +19% for the 16ch@128^3 scale, whose full-collapse volume is 1.27 GB
    and measured slower)."""
    D, H, W, C, g = meta
    q = 4 if mode == 'full' else 1
    if W * C <= 128:
        return W, W, 1, q * W * C
    gh = max(g, 2)
    s = gh - 1
    XR = -(-(W - 1) // s)
    return gh, s, XR, q * gh * C


def collapse_corners(packed: jnp.ndarray, meta,
                     mode: str = 'full') -> jnp.ndarray:
    """(B, D*H*W/g, g*C) fold-packed scale -> (B, D*H*XR, L4) corner-
    collapsed rows.  In 'full' mode row (z, y, r) holds quads (dz, dy) in
    ((0,0), (0,1), (1,0), (1,1)) — +1 shifts edge-clamped, matching
    border-mode corner clipping — each over x columns
    [r*(gh-1), r*(gh-1)+gh-1]; 'halo' mode stores only the x window."""
    D, H, W, C, g = meta
    B = packed.shape[0]
    gh, s, XR, L4 = collapse_meta(meta, mode)
    vol = packed.reshape(B, D, H, W, C)

    def sh_y(v):
        return jnp.concatenate([v[:, :, 1:], v[:, :, -1:]], axis=2)

    def sh_z(v):
        return jnp.concatenate([v[:, 1:], v[:, -1:]], axis=1)

    if gh >= W:
        def windows(v):
            return v.reshape(B, D, H, 1, W * C)
    else:
        L = XR * s + 1
        pad = L - W

        def windows(v):
            if pad:
                v = jnp.concatenate(
                    [v, jnp.broadcast_to(v[:, :, :, -1:],
                                         (B, D, H, pad, C))], axis=3)
            main = v[:, :, :, :XR * s].reshape(B, D, H, XR, s * C)
            last = v[:, :, :, s::s].reshape(B, D, H, XR, C)
            return jnp.concatenate([main, last], axis=-1)

    quads = ([vol, sh_y(vol), sh_z(vol), sh_z(sh_y(vol))]
             if mode == 'full' else [vol])
    out = jnp.concatenate([windows(q) for q in quads], axis=-1) \
        if len(quads) > 1 else windows(quads[0])
    return out.reshape(B, D * H * XR, L4)


def _sample_collapsed_one(cvol: jnp.ndarray, meta, pd: jnp.ndarray,
                          mode: str = 'full',
                          select: bool = False) -> jnp.ndarray:
    """Trilinear border/align-corners sample of one corner-collapsed scale.

    cvol: (B, D*H*XR, L4); pd: (B, Np, 3) -> (B, Np, C).  'full': one
    gathered row per tap; the 8-corner lerp becomes a (4*gh)-weight
    contraction (quad weight x x-corner pair).  'halo': four gathered rows
    per tap (the z/y corner combinations) with the x pair in-row.  Both
    run the weight contraction in f32 — mathematically identical to the
    take sampler's sequential lerp tree (products distributed).

    select=True (--collapse_select): reformulate the extraction as 0/1
    one-hot SELECT einsums in the volume dtype (exact — 0/1 x bf16 with
    f32 accumulation) followed by a small f32 lerp/quad combination, so
    the wide gathered stack is never upcast to f32.  Targets the ~0.07
    s/step of f32 layout-transposing copies the r4 post-halo trace pinned
    on the ``vals.astype(f32)`` einsum operands (r5 lead #1; the isolated
    probe could not reproduce the copies, so this ships as an in-step
    A/B flag).  Same math, different association order (parity test:
    tests/test_sampling.py)."""
    D, H, W, C, g = meta
    gh, s, XR, L4 = collapse_meta(meta, mode)
    B, Np, _ = pd.shape
    M4 = D * H * XR
    x = _unnormalize(pd[..., 0], W, True)
    y = _unnormalize(pd[..., 1], H, True)
    z = _unnormalize(pd[..., 2], D, True)
    x0, x1, wx, _, _ = _corner_weights(x, W, 'border')
    y0, y1, wy, _, _ = _corner_weights(y, H, 'border')
    z0, z1, wz, _, _ = _corner_weights(z, D, 'border')

    # border x0 == W-1 can land one past the last window when s divides
    # W-1 exactly; clamp — the last window still covers it (offset <= gh-1)
    row_x = (jnp.minimum(x0 // s, XR - 1) if gh < W
             else jnp.zeros_like(x0))
    base = row_x * s
    if not select:
        ux = (jax.nn.one_hot(x0 - base, gh, dtype=jnp.float32)
              * (1 - wx[..., None])
              + jax.nn.one_hot(x1 - base, gh, dtype=jnp.float32)
              * wx[..., None])

    if mode == 'full':
        rows = (z0 * H + y0) * XR + row_x
        gidx = jnp.arange(B, dtype=rows.dtype)[:, None] * M4 + rows
        vals = jnp.take(cvol.reshape(B * M4, L4), gidx.reshape(-1),
                        axis=0, mode='clip')
        wq = jnp.stack([(1 - wz) * (1 - wy), (1 - wz) * wy,
                        wz * (1 - wy), wz * wy], axis=-1)  # (B, Np, 4)
        if select:
            v = vals.reshape(B, Np, 4, gh, C)
            oh0 = jax.nn.one_hot(x0 - base, gh, dtype=cvol.dtype)
            oh1 = jax.nn.one_hot(x1 - base, gh, dtype=cvol.dtype)
            s0 = jnp.einsum('bnx,bnqxc->bnqc', oh0, v,
                            preferred_element_type=jnp.float32)
            s1 = jnp.einsum('bnx,bnqxc->bnqc', oh1, v,
                            preferred_element_type=jnp.float32)
            lerp = s0 * (1 - wx[..., None, None]) + s1 * wx[..., None, None]
            return jnp.sum(lerp * wq[..., None], axis=2)
        vals = vals.reshape(B, Np, 4 * gh, C)
        w = (wq[..., :, None] * ux[..., None, :]).reshape(B, Np, 4 * gh)
        return jnp.einsum('bnk,bnkc->bnc', w, vals.astype(jnp.float32),
                          precision=jax.lax.Precision.HIGHEST)

    # halo: one batched take of the 4 (z, y) corner rows
    rows = jnp.stack([(z0 * H + y0) * XR + row_x,
                      (z0 * H + y1) * XR + row_x,
                      (z1 * H + y0) * XR + row_x,
                      (z1 * H + y1) * XR + row_x], axis=1)  # (B, 4, Np)
    gidx = jnp.arange(B, dtype=rows.dtype)[:, None, None] * M4 + rows
    vals = jnp.take(cvol.reshape(B * M4, L4), gidx.reshape(-1),
                    axis=0, mode='clip').reshape(B, 4, Np, gh, C)
    wq = jnp.stack([(1 - wz) * (1 - wy), (1 - wz) * wy,
                    wz * (1 - wy), wz * wy], axis=1)        # (B, 4, Np)
    if select:
        oh0 = jax.nn.one_hot(x0 - base, gh, dtype=cvol.dtype)
        oh1 = jax.nn.one_hot(x1 - base, gh, dtype=cvol.dtype)
        s0 = jnp.einsum('bnx,bknxc->bknc', oh0, vals,
                        preferred_element_type=jnp.float32)
        s1 = jnp.einsum('bnx,bknxc->bknc', oh1, vals,
                        preferred_element_type=jnp.float32)
        lerp = (s0 * (1 - wx[:, None, :, None])
                + s1 * wx[:, None, :, None])
        return jnp.sum(lerp * wq[..., None], axis=1)
    w = wq[..., None] * ux[:, None]                          # (B, 4, Np, gh)
    return jnp.einsum('bknx,bknxc->bnc', w, vals.astype(jnp.float32),
                      precision=jax.lax.Precision.HIGHEST)


def _fused_sample_packed(packed_feats, metas, pd: jnp.ndarray, group: int):
    """Cross-scale fused trilinear gather: ONE ``jnp.take`` per group of
    scales covers both z-planes and all four (y, x) corners at once.

    The train step is gather-LATENCY bound — fixed per-gather-op costs
    (async s32 index copies + slices, ~1 s/step in the r3 trace) dominate
    over gathered bytes (BASELINE.md roofline).  The per-scale sampler
    issues 2 takes per scale (12 ops for the 6-scale pyramid, x2 with two
    query chunks); fusing scales into a shared flat buffer collapses that
    to ceil(S/group) ops.  ``group`` bounds the transient gathered block
    (B, 8, group, Np, 128) — group=3 is ~1.4 GB at batch 4 x 2 chunks.

    All production scales fold-pack to exactly 128 lanes (pack_meta), so
    the shared-buffer concat is copy-only; narrower test-model scales are
    lane-padded (bytes XLA would pad physically anyway).

    Returns the per-scale (B, Np, C) samples in scale order, numerically
    identical to ``_sample_packed_one`` (same index math, same one-hot
    select, same lerp order).
    """
    B, Np, _ = pd.shape
    S = len(packed_feats)
    widths = [m[4] * m[3] for m in metas]  # g * C per scale
    w_max = max(widths)

    offs, bufs = [], []
    off = 0
    for packed, w in zip(packed_feats, widths):
        M = packed.shape[1]
        buf = packed.reshape(B * M, w)
        if w < w_max:
            buf = jnp.pad(buf, ((0, 0), (0, w_max - w)))
        bufs.append(buf)
        offs.append(off)
        off += B * M
    cat = jnp.concatenate(bufs, axis=0) if S > 1 else bufs[0]

    barange = jnp.arange(B, dtype=jnp.int32)[:, None, None]
    gidx, slots, weights = [], [], []
    for packed, meta, boff in zip(packed_feats, metas, offs):
        D, H, W, C, g = meta
        M = packed.shape[1]
        x = _unnormalize(pd[..., 0], W, True)
        y = _unnormalize(pd[..., 1], H, True)
        z = _unnormalize(pd[..., 2], D, True)
        x0, x1, wx, _, _ = _corner_weights(x, W, 'border')
        y0, y1, wy, _, _ = _corner_weights(y, H, 'border')
        z0, z1, wz, _, _ = _corner_weights(z, D, 'border')
        planes = []
        for zi in (z0, z1):
            base = zi * H
            planes.append(jnp.stack(
                [(base + y0) * W + x0, (base + y0) * W + x1,
                 (base + y1) * W + x0, (base + y1) * W + x1], axis=1))
        flats = jnp.concatenate(planes, axis=1)  # (B, 8, Np)
        gidx.append(boff + barange * M + flats // g)
        slots.append(flats % g)
        weights.append((wx[..., None], wy[..., None], wz[..., None]))

    samples = []
    for g0 in range(0, S, group):
        sub = list(range(g0, min(g0 + group, S)))
        idx = jnp.stack([gidx[s] for s in sub], axis=2)  # (B, 8, |sub|, Np)
        rows = jnp.take(cat, idx.reshape(-1), axis=0, mode='clip').reshape(
            B, 8, len(sub), Np, w_max)
        for j, s in enumerate(sub):
            g = metas[s][4]
            C = metas[s][3]
            r = rows[:, :, j, :, :widths[s]].reshape(B, 8, Np, g, C)
            if g == 1:
                vals = r[:, :, :, 0]
            else:
                oh = jax.nn.one_hot(slots[s], g, dtype=r.dtype)
                vals = jnp.einsum('bkng,bkngc->bknc', oh, r)
            wx, wy, wz = weights[s]

            def lerp(v, wx=wx, wy=wy):  # v: (B, 4, Np, C), one z-plane
                top = v[:, 0] * (1 - wx) + v[:, 1] * wx
                bot = v[:, 2] * (1 - wx) + v[:, 3] * wx
                return top * (1 - wy) + bot * wy

            samples.append(lerp(vals[:, :4]) * (1 - wz)
                           + lerp(vals[:, 4:]) * wz)
    return samples


def fc0_dmajor_perm(channels) -> np.ndarray:
    """Natural-order -> reference fc_0 row map for the d-major sampler
    layout: natural feature index (scale-major, then displacement, then
    channel) d*C + c maps to reference row (offset + c)*7 + d."""
    perm = []
    off = 0
    for C in channels:
        for d in range(7):
            for c in range(C):
                perm.append((off + c) * 7 + d)
        off += C
    return np.asarray(perm, np.int64)


def sample_multiscale_packed(packed_feats, metas, p: jnp.ndarray,
                             delta: float = 0.0722,
                             fuse_group: int = 0,
                             collapse_set=(),
                             collapse_halo=(),
                             collapse_select: bool = False,
                             dmajor: bool = False) -> jnp.ndarray:
    """Packed equivalent of models.voxel.sample_multiscale: same 7
    displacement taps, same (c*7+d) channel ordering, same numerics.

    fuse_group == 1 fuses the two z-plane gathers of EACH scale into one
    take (6 gather ops for the 6-scale pyramid instead of 12, no cross-
    scale shared buffer); fuse_group >= 2 batches the per-scale gathers
    ``fuse_group`` scales at a time through one shared flat buffer
    (``_fused_sample_packed``) — fewer, bigger gather ops for the
    latency-bound train step.

    collapse_set: scale indices whose entry in ``packed_feats`` is a
    corner-COLLAPSED volume (``collapse_corners``); those scales gather one
    row per tap instead of eight corner rows.  collapse_halo: indices
    collapsed in 'halo' mode (x window only; four rows per tap).

    dmajor=True (--fc0_dmajor): displaced queries are laid out tap-MINOR
    ((B, N, 7) flattening) so each scale's (B, N*7, C) sample block
    reshapes to (B, N, 7*C) with NO transpose — the per-scale
    (B, 7, N, C) -> (B, N, C, 7) relayout copies disappear from fwd AND
    bwd.  The feature order then differs from the reference fc_0 rows;
    the consumer permutes the fc_0 KERNEL rows instead (fc0_dmajor_perm
    — 3610x512 of weights vs ~700 MB of samples).  Exact same math."""
    from list_tpu.models.voxel import make_displacements

    B, N, _ = p.shape
    disp = jnp.asarray(make_displacements(delta), p.dtype)  # (7, 3)
    if dmajor:
        pd = (p[:, :, None, :] + disp[None, None, :, :]).reshape(B, N * 7, 3)
    else:
        pd = (p[:, None, :, :] + disp[None, :, None, :]).reshape(B, 7 * N, 3)
    collapse_set = frozenset(collapse_set)
    collapse_halo = frozenset(collapse_halo) - collapse_set
    samples = {i: _sample_collapsed_one(packed_feats[i], metas[i], pd,
                                        select=collapse_select)
               for i in collapse_set if i < len(metas)}
    samples.update({
        i: _sample_collapsed_one(packed_feats[i], metas[i], pd, 'halo',
                                 select=collapse_select)
        for i in collapse_halo if i < len(metas)})
    rest = [i for i in range(len(metas)) if i not in samples]
    if fuse_group >= 2 and len(rest) > 1:
        fused = _fused_sample_packed([packed_feats[i] for i in rest],
                                     [metas[i] for i in rest], pd,
                                     fuse_group)
        samples.update(dict(zip(rest, fused)))
    else:
        for i in rest:
            samples[i] = _sample_packed_one(packed_feats[i], metas[i], pd,
                                            fuse_planes=fuse_group == 1)
    if dmajor:
        # (B, N*7, C) with tap-minor rows -> (B, N, 7*C): pure reshape
        out = jnp.concatenate(
            [samples[i].reshape(B, N, 7 * metas[i][3])
             for i in range(len(metas))], axis=-1)
        return out
    outs = []
    for i, meta in enumerate(metas):
        s = samples[i].reshape(B, 7, N, meta[3])
        outs.append(jnp.transpose(s, (0, 2, 3, 1)))  # (B, N, C, 7)
    out = jnp.concatenate(outs, axis=2)
    return out.reshape(B, N, -1)
