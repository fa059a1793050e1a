"""grid_sample / interpolate parity vs torch.nn.functional (CPU oracle)."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from list_tpu.ops import (grid_sample_2d, grid_sample_3d,
                          resize_bilinear_align_corners)


def _rand_grid(rng, shape, lo=-1.3, hi=1.3):
    return rng.uniform(lo, hi, size=shape).astype(np.float32)


def test_grid_sample_2d_zeros_align(rng):
    B, H, W, C, N = 2, 9, 7, 5, 33
    img = rng.randn(B, H, W, C).astype(np.float32)
    grid = _rand_grid(rng, (B, N, 2))

    ours = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(grid),
                                     padding_mode='zeros', align_corners=True))
    ref = F.grid_sample(torch.tensor(img).permute(0, 3, 1, 2),
                        torch.tensor(grid).unsqueeze(1),
                        mode='bilinear', padding_mode='zeros',
                        align_corners=True)  # (B, C, 1, N)
    ref = ref.squeeze(2).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_grid_sample_2d_border(rng):
    B, H, W, C, N = 1, 137, 137, 3, 50
    img = rng.randn(B, H, W, C).astype(np.float32)
    grid = _rand_grid(rng, (B, N, 2), -2.0, 2.0)
    ours = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(grid),
                                     padding_mode='border', align_corners=True))
    ref = F.grid_sample(torch.tensor(img).permute(0, 3, 1, 2),
                        torch.tensor(grid).unsqueeze(1), mode='bilinear',
                        padding_mode='border', align_corners=True)
    ref = ref.squeeze(2).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_grid_sample_3d_border(rng):
    """The VoxelDecoder2 configuration (modules.py:263-265)."""
    B, D, H, W, C, N = 2, 8, 6, 5, 4, 40
    vol = rng.randn(B, D, H, W, C).astype(np.float32)
    grid = _rand_grid(rng, (B, N, 3), -1.6, 1.6)
    ours = np.asarray(grid_sample_3d(jnp.asarray(vol), jnp.asarray(grid),
                                     padding_mode='border', align_corners=True))
    # torch: input (B, C, D, H, W), grid (B, 1, 1, N, 3)
    ref = F.grid_sample(torch.tensor(vol).permute(0, 4, 1, 2, 3),
                        torch.tensor(grid).unsqueeze(1).unsqueeze(1),
                        mode='bilinear', padding_mode='border',
                        align_corners=True)  # (B, C, 1, 1, N)
    ref = ref.squeeze(2).squeeze(2).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_grid_sample_3d_zeros(rng):
    B, D, H, W, C, N = 1, 5, 5, 5, 2, 64
    vol = rng.randn(B, D, H, W, C).astype(np.float32)
    grid = _rand_grid(rng, (B, N, 3), -1.8, 1.8)
    ours = np.asarray(grid_sample_3d(jnp.asarray(vol), jnp.asarray(grid),
                                     padding_mode='zeros', align_corners=True))
    ref = F.grid_sample(torch.tensor(vol).permute(0, 4, 1, 2, 3),
                        torch.tensor(grid).unsqueeze(1).unsqueeze(1),
                        mode='bilinear', padding_mode='zeros',
                        align_corners=True)
    ref = ref.squeeze(2).squeeze(2).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_resize_bilinear_align_corners(rng):
    """PerceptualPooling resize parity (modules.py:26-35): all 5 pyramid sizes."""
    for size in [224, 56, 28, 14, 7]:
        img = rng.randn(1, size, size, 3).astype(np.float32)
        ours = np.asarray(resize_bilinear_align_corners(jnp.asarray(img), 137, 137))
        ref = F.interpolate(torch.tensor(img).permute(0, 3, 1, 2), size=137,
                            mode='bilinear', align_corners=True)
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, atol=2e-4,
                                   err_msg=f'resize {size}->137')


def test_packed_sampler_matches_general(rng):
    """Fold-packed multiscale sampling (training path) must equal
    sample_multiscale exactly (same gathers, one-hot select)."""
    import jax.numpy as jnp
    from list_tpu.models.voxel import sample_multiscale
    from list_tpu.ops.sampling import (pack_channels_last,
                                       sample_multiscale_packed)

    feats, packed, metas = [], [], []
    for res, c in ((8, 1), (8, 2), (4, 4), (2, 8)):
        f = jnp.asarray(rng.randn(2, res, res, res, c).astype(np.float32))
        feats.append(f)
        p_, m_ = pack_channels_last(f)
        packed.append(p_)
        metas.append(m_)
    p = jnp.asarray(rng.uniform(-1.2, 1.2, (2, 33, 3)).astype(np.float32))
    ref = np.asarray(sample_multiscale(feats, p))
    got = np.asarray(sample_multiscale_packed(packed, metas, p))
    np.testing.assert_allclose(got, ref, atol=1e-6, rtol=1e-6)


def test_fused_packed_sampler_matches(rng):
    """Fused gathers (--fuse_sample_gathers) are numerically identical to
    the per-scale packed sampler: group=1 (per-scale z-plane fusion, one
    8-corner take per scale), and cross-scale groups — the (8,1)/(8,2)/
    (4,4)/(2,8) scales have unequal lane widths, exercising the pad path,
    and group=3 leaves a ragged final group."""
    import jax.numpy as jnp
    from list_tpu.models.voxel import sample_multiscale
    from list_tpu.ops.sampling import (pack_channels_last,
                                       sample_multiscale_packed)

    feats, packed, metas = [], [], []
    for res, c in ((8, 1), (8, 2), (4, 4), (2, 8)):
        f = jnp.asarray(rng.randn(2, res, res, res, c).astype(np.float32))
        feats.append(f)
        p_, m_ = pack_channels_last(f)
        packed.append(p_)
        metas.append(m_)
    p = jnp.asarray(rng.uniform(-1.2, 1.2, (2, 33, 3)).astype(np.float32))
    ref = np.asarray(sample_multiscale(feats, p))
    for group in (1, 2, 3, 4):
        got = np.asarray(sample_multiscale_packed(packed, metas, p,
                                                  fuse_group=group))
        np.testing.assert_allclose(got, ref, atol=1e-6, rtol=1e-6)


def test_fused_packed_sampler_grad_matches(rng):
    """Backward of the fused gather (scatter-add into the shared buffer,
    sliced back per scale) must match the per-scale path's gradients."""
    import jax
    import jax.numpy as jnp
    from list_tpu.ops.sampling import (pack_channels_last,
                                       sample_multiscale_packed)

    packed, metas = [], []
    for res, c in ((8, 1), (4, 4), (2, 8)):
        f = jnp.asarray(rng.randn(2, res, res, res, c).astype(np.float32))
        p_, m_ = pack_channels_last(f)
        packed.append(p_)
        metas.append(m_)
    p = jnp.asarray(rng.uniform(-1.2, 1.2, (2, 17, 3)).astype(np.float32))
    w = jnp.asarray(rng.randn(2, 17, sum(m[3] for m in metas) * 7)
                    .astype(np.float32))

    def loss(pk, fuse):
        return jnp.sum(w * sample_multiscale_packed(pk, metas, p,
                                                    fuse_group=fuse))

    g0 = jax.grad(lambda pk: loss(pk, 0))(packed)
    for fuse in (1, 3):
        gf = jax.grad(lambda pk: loss(pk, fuse))(packed)
        for a, b in zip(g0, gf):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=1e-5, rtol=1e-5)


def test_collapsed_sampler_matches(rng):
    """Corner-collapsed sampling (--collapse_samples) matches the general
    sampler: one gathered row per tap, 8-corner lerp as a (4*gh)-weight
    contraction.  Scales exercise the full-row (W*C <= 128), halo-window
    (g >= 2) and paired-point (g == 1) collapse layouts, plus a mixed
    collapsed/packed pyramid and border-clamped taps."""
    import jax.numpy as jnp
    from list_tpu.models.voxel import sample_multiscale
    from list_tpu.ops.sampling import (collapse_corners, pack_channels_last,
                                       sample_multiscale_packed)

    feats, packed, metas = [], [], []
    for res, c in ((8, 1), (8, 2), (4, 4), (2, 8), (8, 16), (4, 64)):
        f = jnp.asarray(rng.randn(2, res, res, res, c).astype(np.float32))
        feats.append(f)
        p_, m_ = pack_channels_last(f)
        packed.append(p_)
        metas.append(m_)
    p = jnp.asarray(rng.uniform(-1.2, 1.2, (2, 33, 3)).astype(np.float32))
    ref = np.asarray(sample_multiscale(feats, p))

    # all collapsed
    call = [collapse_corners(q, m) for q, m in zip(packed, metas)]
    got = np.asarray(sample_multiscale_packed(
        call, metas, p, collapse_set=tuple(range(len(metas)))))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)

    # mixed: collapse a subset, keep the rest fold-packed (fuse 0 and 1)
    cset = (0, 2, 5)
    mix = [call[i] if i in cset else packed[i] for i in range(len(metas))]
    for fuse in (0, 1):
        got = np.asarray(sample_multiscale_packed(mix, metas, p,
                                                  fuse_group=fuse,
                                                  collapse_set=cset))
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_collapsed_sampler_grad_matches(rng):
    """d(sum)/d(volume) through collapse_corners + the collapsed sampler
    (take backward -> scatter-add -> un-collapse accumulation) equals the
    packed path's gradient."""
    import jax
    import jax.numpy as jnp
    from list_tpu.ops.sampling import (collapse_corners, pack_channels_last,
                                       sample_multiscale_packed)

    f = jnp.asarray(np.random.RandomState(7).randn(1, 8, 8, 8, 2)
                    .astype(np.float32))
    p = jnp.asarray(np.random.RandomState(8).uniform(-1.1, 1.1, (1, 29, 3))
                    .astype(np.float32))
    cot = jnp.asarray(np.random.RandomState(9).randn(1, 29, 14)
                      .astype(np.float32))

    def packed_loss(vol):
        q, m = pack_channels_last(vol)
        return jnp.vdot(sample_multiscale_packed([q], [m], p), cot)

    def collapsed_loss(vol):
        q, m = pack_channels_last(vol)
        c = collapse_corners(q, m)
        return jnp.vdot(sample_multiscale_packed([c], [m], p,
                                                 collapse_set=(0,)), cot)

    g_ref = np.asarray(jax.grad(packed_loss)(f))
    g_col = np.asarray(jax.grad(collapsed_loss)(f))
    np.testing.assert_allclose(g_col, g_ref, atol=1e-5, rtol=1e-5)


def test_halo_collapsed_sampler_matches(rng):
    """'halo' collapse mode (x window only, 4 rows per tap) matches the
    general sampler in value and volume-gradient, mixed with full-collapse
    and plain packed scales."""
    import jax
    import jax.numpy as jnp
    from list_tpu.models.voxel import sample_multiscale
    from list_tpu.ops.sampling import (collapse_corners, pack_channels_last,
                                       sample_multiscale_packed)

    feats, packed, metas = [], [], []
    for res, c in ((8, 1), (8, 2), (8, 16), (4, 64), (2, 8)):
        f = jnp.asarray(rng.randn(2, res, res, res, c).astype(np.float32))
        feats.append(f)
        p_, m_ = pack_channels_last(f)
        packed.append(p_)
        metas.append(m_)
    p = jnp.asarray(rng.uniform(-1.2, 1.2, (2, 33, 3)).astype(np.float32))
    ref = np.asarray(sample_multiscale(feats, p))

    # all halo
    hall = [collapse_corners(q, m, 'halo') for q, m in zip(packed, metas)]
    got = np.asarray(sample_multiscale_packed(
        hall, metas, p, collapse_halo=tuple(range(len(metas)))))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)

    # mixed: full {0}, halo {2}, plain rest
    mix = [collapse_corners(packed[0], metas[0]), packed[1],
           hall[2], packed[3], packed[4]]
    got = np.asarray(sample_multiscale_packed(mix, metas, p,
                                              collapse_set=(0,),
                                              collapse_halo=(2,)))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)

    # gradient through the halo path
    cot = jnp.asarray(rng.randn(2, 33, got.shape[-1]).astype(np.float32))

    def halo_loss(vols):
        qs, ms = zip(*[pack_channels_last(v) for v in vols])
        cs = [collapse_corners(q, m, 'halo') for q, m in zip(qs, ms)]
        return jnp.vdot(sample_multiscale_packed(
            list(cs), list(ms), p,
            collapse_halo=tuple(range(len(ms)))), cot)

    def plain_loss(vols):
        qs, ms = zip(*[pack_channels_last(v) for v in vols])
        return jnp.vdot(sample_multiscale_packed(list(qs), list(ms), p),
                        cot)

    g_h = jax.grad(halo_loss)(feats)
    g_p = jax.grad(plain_loss)(feats)
    for a, b in zip(g_h, g_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_collapse_select_matches(rng):
    """--collapse_select (bf16 0/1-select + f32-lerp extraction) matches
    the f32-weight-einsum formulation in value and volume-gradient for
    both full and halo collapse modes (r5 lead #1 A/B flag)."""
    import jax
    import jax.numpy as jnp
    from list_tpu.ops.sampling import (collapse_corners, pack_channels_last,
                                       sample_multiscale_packed)

    feats, packed, metas = [], [], []
    for res, c in ((8, 1), (8, 2), (8, 16), (4, 64)):
        f = jnp.asarray(rng.randn(2, res, res, res, c).astype(np.float32))
        feats.append(f)
        p_, m_ = pack_channels_last(f)
        packed.append(p_)
        metas.append(m_)
    p = jnp.asarray(rng.uniform(-1.2, 1.2, (2, 33, 3)).astype(np.float32))

    cset, chalo = (0, 3), (2,)
    vols = [collapse_corners(packed[0], metas[0]), packed[1],
            collapse_corners(packed[2], metas[2], 'halo'),
            collapse_corners(packed[3], metas[3])]
    base = np.asarray(sample_multiscale_packed(
        vols, metas, p, collapse_set=cset, collapse_halo=chalo))
    sel = np.asarray(sample_multiscale_packed(
        vols, metas, p, collapse_set=cset, collapse_halo=chalo,
        collapse_select=True))
    np.testing.assert_allclose(sel, base, atol=1e-5, rtol=1e-5)

    cot = jnp.asarray(rng.randn(2, 33, base.shape[-1]).astype(np.float32))

    def loss(vraw, select):
        qs, ms = zip(*[pack_channels_last(v) for v in vraw])
        cs = [collapse_corners(qs[0], ms[0]), qs[1],
              collapse_corners(qs[2], ms[2], 'halo'),
              collapse_corners(qs[3], ms[3])]
        return jnp.vdot(sample_multiscale_packed(
            cs, list(ms), p, collapse_set=cset, collapse_halo=chalo,
            collapse_select=select), cot)

    g0 = jax.grad(lambda v: loss(v, False))(feats)
    g1 = jax.grad(lambda v: loss(v, True))(feats)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=1e-5)
