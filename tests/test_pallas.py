"""Pallas kernel tests (interpret mode on CPU; compiled path runs on TPU
via bench/driver)."""

import jax.numpy as jnp
import numpy as np

def test_fused_fc0_mlp_parity_interpret():
    """dense_grid_sdf(use_pallas=True) == XLA path (interpret mode; the
    compiled-mode timing check runs on the real chip via bench tooling)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from list_tpu.models import LIST
    from list_tpu.ops.dense_grid import dense_grid_sdf

    R = 16
    model = LIST(vox_res=R, point_feat=(128, 8, 8, 3),
                 point_degree=(2, 2, 4),
                 im_enc_layers=(1, 1, 1, 1, 2, 4, 4, 4), h_dim=8, support=2)
    img = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3),
                      jnp.float32)
    v = model.init(jax.random.PRNGKey(1), img, jnp.zeros((1, 8, 3)))
    enc = model.apply(v, img, method=model.encode)
    args = (v['params']['sdf_decoder'], enc['vox_feat'], enc['feat_l2'],
            enc['trans_mat'], R)
    a = np.asarray(dense_grid_sdf(*args, slab=4, compute_dtype=jnp.float32))
    b = np.asarray(dense_grid_sdf(*args, slab=4, compute_dtype=jnp.float32,
                                  use_pallas=True, pallas_interpret=True))
    np.testing.assert_allclose(a, b, atol=2e-4, rtol=1e-3)


def test_fused_stack_head_parity_interpret():
    """dense_grid_sdf(use_pallas=2) — the structured-stack fused head —
    matches the XLA head in every coarse mode (none / in-scan / hoisted)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from list_tpu.models import LIST
    from list_tpu.ops.dense_grid import dense_grid_sdf

    R = 16
    model = LIST(vox_res=R, point_feat=(128, 8, 8, 3),
                 point_degree=(2, 2, 4),
                 im_enc_layers=(1, 1, 1, 1, 2, 4, 4, 4), h_dim=8, support=2)
    img = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3),
                      jnp.float32)
    v = model.init(jax.random.PRNGKey(1), img, jnp.zeros((1, 8, 3)))
    enc = model.apply(v, img, method=model.encode)
    args = (v['params']['sdf_decoder'], enc['vox_feat'], enc['feat_l2'],
            enc['trans_mat'], R)
    # no-coarse (default coarse_proj degenerates on the tiny model)
    a = np.asarray(dense_grid_sdf(*args, slab=4, compute_dtype=jnp.float32))
    b = np.asarray(dense_grid_sdf(*args, slab=4, compute_dtype=jnp.float32,
                                  use_pallas=2, pallas_interpret=True))
    np.testing.assert_allclose(a, b, atol=2e-4, rtol=1e-3)
    for outside in (False, True):  # in-scan f32 / hoisted bf16-cast coarse
        a = np.asarray(dense_grid_sdf(
            *args, slab=4, compute_dtype=jnp.float32, coarse_proj=8,
            coarse_outside=outside))
        b = np.asarray(dense_grid_sdf(
            *args, slab=4, compute_dtype=jnp.float32, coarse_proj=8,
            coarse_outside=outside, use_pallas=2, pallas_interpret=True))
        np.testing.assert_allclose(a, b, atol=2e-4, rtol=1e-3)
