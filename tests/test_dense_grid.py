"""Parity of the dense-grid gather-free decode vs the general gather path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from list_tpu.models import LIST
from list_tpu.ops import create_grid_points_from_bounds
from list_tpu.ops.dense_grid import dense_grid_sdf, vox_w1_permutation


def test_vox_w1_permutation_roundtrip():
    channels = (1, 2, 3)
    perm = vox_w1_permutation(channels)
    assert sorted(perm.tolist()) == list(range(sum(channels) * 7))
    # scale 0, disp 3, chan 0 -> torch row (0)*7+3
    assert perm[3] == 3
    # scale 1 (offset 1), disp 0, chan 1 -> row (1+1)*7+0 = 14
    assert perm[7 + 1] == 14


@pytest.fixture(scope='module')
def tiny_setup():
    R = 16
    model = LIST(vox_res=R, point_feat=(128, 8, 8, 3), point_degree=(2, 2, 4),
                 im_enc_layers=(1, 1, 1, 1, 2, 4, 4, 4), h_dim=8, support=2)
    img = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3),
                      jnp.float32)
    q0 = jnp.zeros((1, 8, 3))
    vars_ = model.init(jax.random.PRNGKey(1), img, q0)
    enc = model.apply(vars_, img, method=model.encode)
    return model, vars_, enc, R


def test_dense_matches_general_fp32(tiny_setup):
    model, vars_, enc, R = tiny_setup
    grid_pts = create_grid_points_from_bounds(-0.5, 0.5, R).astype(np.float32)
    q = jnp.asarray(grid_pts[None])
    sdf_general = model.apply(vars_, q, enc, method=model.decode_sdf)
    sdf_general = np.asarray(sdf_general).reshape(R, R, R)

    sdf_dense = dense_grid_sdf(vars_['params']['sdf_decoder'],
                               enc['vox_feat'], enc['feat_l2'],
                               enc['trans_mat'], R, slab=4,
                               compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(sdf_dense), sdf_general,
                               atol=2e-4, rtol=1e-3)


def test_dense_matches_general_nondefault_bbox(tiny_setup):
    """bb=(-0.6, 0.6): the dense path must reproduce the general path's
    out-of-[-1,1] border clamping and the bbox-dependent grid coords."""
    model, vars_, enc, R = tiny_setup
    bb_min, bb_max = -0.6, 0.6
    grid_pts = create_grid_points_from_bounds(bb_min, bb_max,
                                              R).astype(np.float32)
    q = jnp.asarray(grid_pts[None])
    sdf_general = np.asarray(
        model.apply(vars_, q, enc, method=model.decode_sdf)).reshape(R, R, R)
    sdf_dense = np.asarray(dense_grid_sdf(
        vars_['params']['sdf_decoder'], enc['vox_feat'], enc['feat_l2'],
        enc['trans_mat'], R, slab=4, compute_dtype=jnp.float32,
        bb_min=bb_min, bb_max=bb_max))
    np.testing.assert_allclose(sdf_dense, sdf_general, atol=2e-4, rtol=1e-3)


def test_dense_unfused_scales_matches(tiny_setup):
    """fuse_scales=False (per-scale matmuls) is numerically equivalent."""
    model, vars_, enc, R = tiny_setup
    a = np.asarray(dense_grid_sdf(
        vars_['params']['sdf_decoder'], enc['vox_feat'], enc['feat_l2'],
        enc['trans_mat'], R, slab=4, compute_dtype=jnp.float32))
    b = np.asarray(dense_grid_sdf(
        vars_['params']['sdf_decoder'], enc['vox_feat'], enc['feat_l2'],
        enc['trans_mat'], R, slab=4, compute_dtype=jnp.float32,
        fuse_scales=False))
    np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


def test_dense_bf16_close(tiny_setup):
    model, vars_, enc, R = tiny_setup
    grid_pts = create_grid_points_from_bounds(-0.5, 0.5, R).astype(np.float32)
    q = jnp.asarray(grid_pts[None])
    sdf_general = np.asarray(
        model.apply(vars_, q, enc, method=model.decode_sdf)).reshape(R, R, R)
    sdf_dense = np.asarray(dense_grid_sdf(
        vars_['params']['sdf_decoder'], enc['vox_feat'], enc['feat_l2'],
        enc['trans_mat'], R, slab=8, compute_dtype=jnp.bfloat16))
    # bf16 feature path: expect agreement to ~1e-2 absolute
    assert np.abs(sdf_dense - sdf_general).max() < 5e-2
    # sign agreement (what matters for the extracted surface)
    agree = (np.sign(sdf_dense) == np.sign(sdf_general)).mean()
    assert agree > 0.99


def test_dense_coarse_projected_matches(tiny_setup):
    """The coarse-projected path (fc_0 tap blocks folded into the coarse
    scales before upsampling) is an exact linear reordering: f32 results
    match the plain stacked path and the general sampler.

    The tiny model's scales sit at 16/16/8/4/2; coarse_proj=8 routes the
    three coarsest through the projected path (production: 16 routes the
    8^3/16^3 scales)."""
    model, vars_, enc, R = tiny_setup
    grid_pts = create_grid_points_from_bounds(-0.5, 0.5, R).astype(np.float32)
    q = jnp.asarray(grid_pts[None])
    sdf_general = np.asarray(
        model.apply(vars_, q, enc, method=model.decode_sdf)).reshape(R, R, R)
    args = (vars_['params']['sdf_decoder'], enc['vox_feat'], enc['feat_l2'],
            enc['trans_mat'], R)
    plain = np.asarray(dense_grid_sdf(
        *args, slab=4, compute_dtype=jnp.float32, coarse_proj=0))
    projd = np.asarray(dense_grid_sdf(
        *args, slab=4, compute_dtype=jnp.float32, coarse_proj=8))
    np.testing.assert_allclose(projd, plain, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(projd, sdf_general, atol=2e-4, rtol=1e-3)
    # the hoisted whole-grid coarse x-lerp (auto at R<=128) equals the
    # in-scan banded form (auto above 128, where the hoisted volume
    # would not fit HBM)
    inside = np.asarray(dense_grid_sdf(
        *args, slab=4, compute_dtype=jnp.float32, coarse_proj=8,
        coarse_outside=False))
    outside = np.asarray(dense_grid_sdf(
        *args, slab=4, compute_dtype=jnp.float32, coarse_proj=8,
        coarse_outside=True))
    np.testing.assert_allclose(inside, outside, atol=2e-4, rtol=1e-3)
    # pallas head variant (interpret) with the projected path
    pal = np.asarray(dense_grid_sdf(
        *args, slab=4, compute_dtype=jnp.float32, coarse_proj=8,
        use_pallas=True, pallas_interpret=True))
    np.testing.assert_allclose(pal, plain, atol=2e-4, rtol=1e-3)


def test_dense_hoisted_variants_match(tiny_setup):
    """hoist_variants: full-volume z/y tap variants built once outside the
    scan (plus the identity-center-tap slab slice for r_in == R scales)
    must match the in-scan slab-local construction — x-slicing and the
    z/y resamples commute exactly.

    The tiny model covers both branches: the 16^3 scales hit the identity
    center-tap shortcut (r_in == R == 16), the 8/4/2 scales exercise the
    non-identity banded einsum over hoisted Vcats (coarse_proj=0 keeps
    every scale on the stacked path)."""
    model, vars_, enc, R = tiny_setup
    args = (vars_['params']['sdf_decoder'], enc['vox_feat'], enc['feat_l2'],
            enc['trans_mat'], R)
    for cp in (0, 8):
        base = np.asarray(dense_grid_sdf(
            *args, slab=4, compute_dtype=jnp.float32, coarse_proj=cp,
            hoist_variants=False))
        hoisted = np.asarray(dense_grid_sdf(
            *args, slab=4, compute_dtype=jnp.float32, coarse_proj=cp,
            hoist_variants=True))
        np.testing.assert_allclose(hoisted, base, atol=1e-6, rtol=1e-6)
    # bf16 compute path (production dtype) stays within cast tolerance
    base16 = np.asarray(dense_grid_sdf(*args, slab=4,
                                       hoist_variants=False))
    hoist16 = np.asarray(dense_grid_sdf(*args, slab=4,
                                        hoist_variants=True))
    np.testing.assert_allclose(hoist16, base16, atol=2e-2, rtol=2e-2)


def test_batched_encode_slices_match_per_image(tiny_setup):
    """The --infer_batch sweep encodes B images in one dispatch and runs
    the dense decode off slices of the batched encoding (executors.
    predict_grid_batch).  Eval-mode BatchNorm is batch-independent, so a
    sliced batched encode must reproduce the per-image path exactly."""
    model, vars_, _, R = tiny_setup
    imgs = jnp.asarray(np.random.RandomState(3).rand(2, 32, 32, 3),
                       jnp.float32)
    enc = model.apply(vars_, imgs, method=model.encode)
    for i in range(2):
        batched_slice = np.asarray(dense_grid_sdf(
            vars_['params']['sdf_decoder'],
            [f[i:i + 1] for f in enc['vox_feat']],
            [f[i:i + 1] for f in enc['feat_l2']],
            enc['trans_mat'][i:i + 1], R, slab=4,
            compute_dtype=jnp.float32))
        enc1 = model.apply(vars_, imgs[i:i + 1], method=model.encode)
        single = np.asarray(dense_grid_sdf(
            vars_['params']['sdf_decoder'], enc1['vox_feat'],
            enc1['feat_l2'], enc1['trans_mat'], R, slab=4,
            compute_dtype=jnp.float32))
        np.testing.assert_allclose(batched_slice, single,
                                   atol=1e-5, rtol=1e-5)


def test_percep_collapse_matches(tiny_setup):
    """percep_collapse: the 2D corner-collapsed projected map (one gathered
    row per query) must reproduce the 4-corner gather bitwise — same
    values selected, same lerp expression (r5, dense-path percep lead)."""
    model, vars_, enc, R = tiny_setup
    base = np.asarray(dense_grid_sdf(
        vars_['params']['sdf_decoder'], enc['vox_feat'], enc['feat_l2'],
        enc['trans_mat'], R, slab=4, compute_dtype=jnp.float32))
    coll = np.asarray(dense_grid_sdf(
        vars_['params']['sdf_decoder'], enc['vox_feat'], enc['feat_l2'],
        enc['trans_mat'], R, slab=4, compute_dtype=jnp.float32,
        percep_collapse=True))
    np.testing.assert_array_equal(coll, base)
    # bf16 compute path too (production dtype)
    b16 = np.asarray(dense_grid_sdf(
        vars_['params']['sdf_decoder'], enc['vox_feat'], enc['feat_l2'],
        enc['trans_mat'], R, slab=4))
    c16 = np.asarray(dense_grid_sdf(
        vars_['params']['sdf_decoder'], enc['vox_feat'], enc['feat_l2'],
        enc['trans_mat'], R, slab=4, percep_collapse=True))
    np.testing.assert_allclose(c16, b16, atol=2e-2, rtol=2e-2)
