"""Pallas kernel tests (interpret mode on CPU; compiled path runs on TPU
via bench/driver)."""

import jax.numpy as jnp
import numpy as np

from list_tpu.ops.pallas import fused_sdf_mlp, sdf_mlp_reference


def _weights(rng, k=96, d1=64, d2=32, d3=32):
    mk = lambda *s: rng.randn(*s).astype(np.float32) * 0.1
    return (mk(k, d1), mk(d1), mk(d1, d2), mk(d2), mk(d2, d3), mk(d3),
            mk(d3, 1), mk(1))


def test_fused_mlp_matches_reference_f32(rng):
    ws = _weights(rng)
    x = rng.randn(256, 96).astype(np.float32)
    ref = np.asarray(sdf_mlp_reference(jnp.asarray(x),
                                       *[jnp.asarray(w) for w in ws]))
    out = np.asarray(fused_sdf_mlp(jnp.asarray(x),
                                   *[jnp.asarray(w) for w in ws],
                                   tile=128, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_fused_mlp_bf16(rng):
    ws = _weights(rng)
    x = rng.randn(256, 96).astype(np.float32)
    xb = jnp.asarray(x, jnp.bfloat16)
    ref = np.asarray(sdf_mlp_reference(xb, *[jnp.asarray(w) for w in ws]))
    out = np.asarray(fused_sdf_mlp(xb, *[jnp.asarray(w) for w in ws],
                                   tile=64, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-2, rtol=1e-2)
