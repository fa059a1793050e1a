"""Pallas kernel tests (interpret mode on CPU; compiled path runs on TPU
via bench/driver)."""

import jax.numpy as jnp
import numpy as np

def test_dense_decode_kernel_matches_xla(rng):
    """Fused Pallas dense decode vs ops.dense_grid.dense_grid_sdf
    (interpret mode, tiny model, f32)."""
    import jax
    from list_tpu.models import LIST
    from list_tpu.ops.dense_grid import dense_grid_sdf
    from list_tpu.ops.pallas.dense_decode import dense_grid_sdf_pallas

    R = 16
    # 8-channel voxel scales: multiples of the f32 sublane tile, so the
    # kernel path (not just the XLA fallback for sub-sublane scales) is
    # exercised.
    model = LIST(vox_res=R, point_feat=(128, 8, 8, 3), point_degree=(2, 2, 4),
                 im_enc_layers=(1, 1, 1, 1, 8, 8, 8, 8), h_dim=8, support=2)
    img = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    q0 = jnp.zeros((1, 8, 3))
    vars_ = model.init(jax.random.PRNGKey(1), img, q0)
    enc = model.apply(vars_, img, method=model.encode)
    dec = vars_['params']['sdf_decoder']

    ref = np.asarray(dense_grid_sdf(dec, enc['vox_feat'], enc['feat_l2'],
                                    enc['trans_mat'], R, slab=8,
                                    compute_dtype=jnp.float32))
    out = np.asarray(dense_grid_sdf_pallas(
        dec, enc['vox_feat'], enc['feat_l2'], enc['trans_mat'], R,
        compute_dtype=jnp.float32, tile_t=32, interpret=True))
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-3)


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
