"""Channel-major 3x3x3 stencil conv vs flax/lax conv (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from list_tpu.ops.pallas.stencil3d import (conv3x3x3_cmajor,
                                           conv3x3x3_cmajor_xla)


def _ref_conv(x_cl, kernel):
    """lax conv_general_dilated with flax NDHWC semantics."""
    return jax.lax.conv_general_dilated(
        x_cl, kernel, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))


def _setup(rng, B=2, Ci=3, Co=5, D=4, H=8, W=128):
    x = rng.randn(B, Ci, D, H, W).astype(np.float32)
    k = (rng.randn(3, 3, 3, Ci, Co) * 0.2).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(k)


def test_xla_cmajor_matches_lax(rng):
    x, k = _setup(rng)
    ref = _ref_conv(jnp.transpose(x, (0, 2, 3, 4, 1)), k)
    got = conv3x3x3_cmajor_xla(x, k)
    np.testing.assert_allclose(np.asarray(got),
                               np.transpose(np.asarray(ref), (0, 4, 1, 2, 3)),
                               atol=1e-4, rtol=1e-4)


def test_pallas_cmajor_matches_lax_interpret(rng):
    x, k = _setup(rng)
    ref = _ref_conv(jnp.transpose(x, (0, 2, 3, 4, 1)), k)
    got = conv3x3x3_cmajor(x, k, True)
    np.testing.assert_allclose(np.asarray(got),
                               np.transpose(np.asarray(ref), (0, 4, 1, 2, 3)),
                               atol=1e-4, rtol=1e-4)


def test_pallas_cmajor_grads_interpret(rng):
    x, k = _setup(rng, B=1, Ci=2, Co=3, D=3, H=8)

    def f_pallas(x_, k_):
        return jnp.sum(conv3x3x3_cmajor(x_, k_, True) ** 2)

    def f_ref(x_, k_):
        x_cl = jnp.transpose(x_, (0, 2, 3, 4, 1))
        return jnp.sum(_ref_conv(x_cl, k_) ** 2)

    gx_p, gk_p = jax.grad(f_pallas, argnums=(0, 1))(x, k)
    gx_r, gk_r = jax.grad(f_ref, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_r),
                               atol=1e-3, rtol=1e-3)


def test_voxel_encoder_cmajor_parity(rng):
    """VoxelEncoder2(cmajor=True) at 128^3 (the layout that avoids XLA's
    8-128x conv-buffer lane padding) matches the channels-last encoder."""
    import jax
    import jax.numpy as jnp
    from list_tpu.models.voxel import VoxelEncoder2

    layers = (1, 1, 1, 1, 2, 4, 4, 4)
    occ = jnp.asarray((rng.rand(1, 128, 128, 128) > 0.97).astype(np.float32))
    enc_cl = VoxelEncoder2(layers=layers, cmajor=False)
    enc_cm = VoxelEncoder2(layers=layers, cmajor=True)
    v = enc_cl.init(jax.random.PRNGKey(0), occ)
    f_cl = enc_cl.apply(v, occ)
    f_cm = enc_cm.apply(v, occ)
    assert len(f_cl) == len(f_cm)
    for a, b in zip(f_cl, f_cm):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-4, rtol=1e-4)
    # packed mode round-trips the same values (packed features are bf16)
    import jax.numpy as jnp2
    from list_tpu.ops.sampling import pack_channels_last
    f_pk, metas, occ_pred = enc_cm.apply(v, occ, False, True)
    # occ_pred is the pre-pack f32 sigmoid map
    np.testing.assert_allclose(np.asarray(occ_pred),
                               np.asarray(f_cl[0][..., 0]),
                               atol=1e-4, rtol=1e-4)
    for a, p, m in zip(f_cl, f_pk, metas):
        ref, m2 = pack_channels_last(a, jnp2.bfloat16)
        assert m == m2
        np.testing.assert_allclose(np.asarray(p, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=2e-3, rtol=1e-2)
