"""Module shape/dtype golden tests on tiny configurations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from list_tpu.models import (CoarseNet, LIST, PerceptualPooling, PointMLP,
                             ResEncoder, SpatialTransformer, TreeGraphDecoder,
                             VoxelDecoder2, VoxelEncoder2, sample_multiscale,
                             make_displacements)


def test_treegcn_shapes():
    """Full-size decoder config: 1 -> 2^6*64 = 4096 points (modules.py:107-132)."""
    feats = (8, 8, 4, 3)
    degs = (2, 2, 4)
    m = TreeGraphDecoder(features=feats, degrees=degs, support=3)
    x = jnp.ones((2, 1, 8))
    params = m.init(jax.random.PRNGKey(0), [x])
    out = m.apply(params, [x])
    assert out.shape == (2, 2 * 2 * 4, 3)


def test_treegcn_default_grows_to_4096():
    m = TreeGraphDecoder(features=(16, 8, 8, 8, 8, 8, 8, 3),
                         degrees=(2, 2, 2, 2, 2, 2, 64), support=2)
    x = jnp.ones((1, 1, 16))
    params = m.init(jax.random.PRNGKey(0), [x])
    out = m.apply(params, [x])
    assert out.shape == (1, 4096, 3)


def test_pointmlp_shapes():
    m = PointMLP()
    x = jnp.ones((2, 10, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(vars_, x)
    assert out.shape == (2, 10, 512)
    # train mode mutates batch stats
    out, updates = m.apply(vars_, x, train=True, mutable=['batch_stats'])
    assert 'batch_stats' in updates


def test_resnet_pyramid_shapes():
    m = ResEncoder()
    x = jnp.ones((1, 64, 64, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    vec, maps = m.apply(vars_, x)
    assert vec.shape == (1, 128)
    # stride-1 conv1 keeps feat0 at full res; one maxpool halving before
    # layer1, then /2 per stage: [full, /2, /4, /8, /16]
    # (for 224^2 input: 224, 112, 56, 28, 14 — torchvision's layer1 is
    # stride-1, so only the maxpool downsamples before it).
    assert [f.shape[1] for f in maps] == [64, 32, 16, 8, 4]
    assert [f.shape[-1] for f in maps] == [64, 64, 128, 256, 512]


def test_voxel_encoder_scales():
    m = VoxelEncoder2(layers=(1, 1, 1, 1, 4, 8, 8, 8, 8))
    occ = jnp.ones((1, 16, 16, 16))
    vars_ = m.init(jax.random.PRNGKey(0), occ)
    feats = m.apply(vars_, occ)
    # 6 scales, mirroring [1@128^3,16@128^3,32@64^3,64@32^3,128@16^3,128@8^3]
    assert [f.shape[1] for f in feats] == [16, 16, 8, 4, 2, 1]
    assert [f.shape[-1] for f in feats] == [1, 4, 8, 8, 8, 8]
    # sigmoid occupancy head in (0, 1)
    assert float(feats[0].min()) > 0.0 and float(feats[0].max()) < 1.0


def test_displacements_order():
    d = make_displacements(0.5)
    np.testing.assert_allclose(d, [[0, 0, 0], [-0.5, 0, 0], [0.5, 0, 0],
                                   [0, -0.5, 0], [0, 0.5, 0],
                                   [0, 0, -0.5], [0, 0, 0.5]])


def test_sample_multiscale_channel_major_order(rng):
    """Feature layout must be c*7+d to match the torch reshape
    (modules.py:270-273)."""
    B, N = 1, 5
    f = jnp.asarray(rng.randn(B, 4, 4, 4, 2).astype(np.float32))
    p = jnp.asarray(rng.uniform(-0.9, 0.9, (B, N, 3)).astype(np.float32))
    out = sample_multiscale([f], p, delta=0.1)
    assert out.shape == (B, N, 14)
    # block [0:7] is channel 0 over displacements, [7:14] channel 1.
    from list_tpu.ops import grid_sample_3d
    center = grid_sample_3d(f, p, padding_mode='border', align_corners=True)
    np.testing.assert_allclose(out[0, :, 0], center[0, :, 0], atol=1e-6)
    np.testing.assert_allclose(out[0, :, 7], center[0, :, 1], atol=1e-6)


def test_spatial_transformer_shape():
    m = SpatialTransformer()
    x = jnp.ones((2, 640))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(vars_, x)
    assert out.shape == (2, 4, 3)


@pytest.fixture(scope='module')
def tiny_list_model():
    # point_feat[0] must be 128: the TreeGCN root consumes the ResEncoder
    # 128-d global feature (models.py:78).
    model = LIST(vox_res=16, bb_min=-0.5, bb_max=0.5,
                 point_feat=(128, 8, 8, 3), point_degree=(2, 2, 4),
                 im_enc_layers=(1, 1, 1, 1, 2, 4, 4, 4), h_dim=8, support=2)
    img = jnp.ones((1, 32, 32, 3))
    query = jnp.zeros((1, 11, 3))
    vars_ = model.init(jax.random.PRNGKey(0), img, query)
    return model, vars_, img, query


def test_list_forward(tiny_list_model):
    model, vars_, img, query = tiny_list_model
    occ_pred, sdf = model.apply(vars_, img, query)
    assert occ_pred.shape == (1, 16, 16, 16)
    assert sdf.shape == (1, 11)


def test_list_encode_decode_matches_forward(tiny_list_model):
    """Chunked inference path must equal the fused forward."""
    model, vars_, img, query = tiny_list_model
    _, sdf = model.apply(vars_, img, query)
    enc = model.apply(vars_, img, method=model.encode)
    sdf2 = model.apply(vars_, query, enc, method=model.decode_sdf)
    np.testing.assert_allclose(np.asarray(sdf), np.asarray(sdf2), atol=1e-6)


def test_list_train_mode_mutates_stats(tiny_list_model):
    model, vars_, img, query = tiny_list_model
    (occ_pred, sdf), updates = model.apply(
        vars_, img, query, train=True, mutable=['batch_stats'])
    assert 'batch_stats' in updates


def test_coarsenet_forward():
    m = CoarseNet(point_feat=(128, 8, 8, 3), point_degree=(2, 2, 4), support=2)
    img = jnp.ones((2, 32, 32, 3))
    vars_ = m.init(jax.random.PRNGKey(0), img)
    pc = m.apply(vars_, img)
    assert pc.shape == (2, 16, 3)


def test_list_remat_grad_parity():
    """--remat (nn.remat around the voxel encoder) must not change params,
    loss, or gradients — only the backward-pass memory schedule."""
    import jax
    import jax.numpy as jnp
    from list_tpu.models import LIST

    def build(remat):
        m = LIST(vox_res=8, point_feat=(128, 8, 8, 3),
                 point_degree=(2, 2, 4),
                 im_enc_layers=(1, 1, 1, 1, 2, 4, 4, 4), h_dim=8, support=2,
                 im_filters=(8, 8, 8, 8, 8), remat=remat)
        img = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 3),
                          jnp.float32)
        q = jnp.asarray(
            np.random.RandomState(1).uniform(-0.5, 0.5, (2, 16, 3)),
            jnp.float32)
        v = m.init(jax.random.PRNGKey(0), img, q)

        def loss(p):
            (occ, sdf), _ = m.apply(
                {'params': p, 'batch_stats': v['batch_stats']},
                img, q, None, True, mutable=['batch_stats'])
            return jnp.sum(sdf ** 2) + jnp.sum(occ ** 2)

        l, g = jax.value_and_grad(loss)(v['params'])
        return v, l, g

    v0, l0, g0 = build(False)
    v1, l1, g1 = build(True)
    assert jax.tree.structure(v0) == jax.tree.structure(v1)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    # bf16 fold-packed features make the recompute round differently;
    # grads are O(1-1e2), so compare relative to each leaf's magnitude.
    paths0, _ = jax.tree_util.tree_flatten_with_path(g0)
    paths1, _ = jax.tree_util.tree_flatten_with_path(g1)
    for (k, a), (_, b) in zip(paths0, paths1):
        d = float(jnp.max(jnp.abs(a - b)))
        m = float(jnp.max(jnp.abs(a)))
        # bf16 fold-packed features + remat recompute reorder rounding;
        # bf16 eps is ~0.8%, so 1% relative is the right noise floor.
        assert d <= 1e-2 * max(m, 1.0), (jax.tree_util.keystr(k), d, m)


def test_list_chunked_training_decode_parity():
    """train_query_chunks splits the training query axis into remat'd
    chunks: forward must be bit-exact; grads agree to fp-reorder noise
    (the percep scatter-add adjoint sums in a different order)."""
    import jax
    import jax.numpy as jnp
    from list_tpu.models import LIST

    def build(k, remat):
        # f32 packed features: isolates the chunking logic from bf16
        # scatter-accumulation noise (which the remat test covers).
        m = LIST(vox_res=8, point_feat=(128, 8, 8, 3),
                 point_degree=(2, 2, 4),
                 im_enc_layers=(1, 1, 1, 1, 2, 4, 4, 4), h_dim=8, support=2,
                 im_filters=(8, 8, 8, 8, 8), remat=remat,
                 train_query_chunks=k, vox_packed_dtype=None)
        img = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 3),
                          jnp.float32)
        # 31 queries: not divisible by 4 -> exercises uneven chunking
        q = jnp.asarray(
            np.random.RandomState(1).uniform(-0.5, 0.5, (2, 31, 3)),
            jnp.float32)
        v = m.init(jax.random.PRNGKey(0), img, q)

        def loss(p):
            (occ, sdf), _ = m.apply(
                {'params': p, 'batch_stats': v['batch_stats']},
                img, q, None, True, mutable=['batch_stats'])
            return jnp.sum(sdf ** 2) + jnp.sum(occ ** 2)

        l, g = jax.value_and_grad(loss)(v['params'])
        return l, g

    l0, g0 = build(1, False)
    l1, g1 = build(4, True)
    assert float(l0) == float(l1)  # forward bit-exact
    paths0, _ = jax.tree_util.tree_flatten_with_path(g0)
    paths1, _ = jax.tree_util.tree_flatten_with_path(g1)
    for (k, a), (_, b) in zip(paths0, paths1):
        d = float(jnp.max(jnp.abs(a - b)))
        m = float(jnp.max(jnp.abs(a)))
        # bf16 fold-packed features + remat recompute reorder rounding;
        # bf16 eps is ~0.8%, so 1% relative is the right noise floor.
        assert d <= 1e-2 * max(m, 1.0), (jax.tree_util.keystr(k), d, m)


def test_parse_collapse_samples():
    """--collapse_samples spec parser: auto per batch, halo tokens, none."""
    from list_tpu.models.list_model import parse_collapse_samples as p
    assert p('auto', 4) == ((0, 2, 3, 5), (1,))
    assert p('auto', 8) == ((0, 3, 5), (1,))
    assert p('none', 4) == ((), ())
    assert p('', 4) == ((), ())
    assert p('0,3,5', 8) == ((0, 3, 5), ())
    assert p('0,1h,3, 4H', 4) == ((0, 3), (1, 4))
    assert p((0, 2), 4) == ((0, 2), ())
