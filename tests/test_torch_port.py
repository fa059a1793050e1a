"""ResEncoder parity vs a torch.nn.functional reimplementation of the
reference encoder (torchvision resnet18 with stride-1 conv1,
network/modules.py:1027-1074), using a synthetic state_dict.

This validates both the flax ResNet architecture and the weight-port layout
conversions end to end.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from list_tpu.models import ResEncoder
from list_tpu.utils.torch_port import resencoder_from_torch


def _rand_sd(rng):
    """Synthetic torchvision-resnet18 state_dict (correct shapes)."""
    sd = {}

    def conv(name, o, i, k):
        sd[name + '.weight'] = rng.randn(o, i, k, k).astype(np.float32) * 0.05

    def bn(name, c):
        sd[name + '.weight'] = rng.rand(c).astype(np.float32) + 0.5
        sd[name + '.bias'] = rng.randn(c).astype(np.float32) * 0.1
        sd[name + '.running_mean'] = rng.randn(c).astype(np.float32) * 0.1
        sd[name + '.running_var'] = rng.rand(c).astype(np.float32) + 0.5

    conv('conv1', 64, 3, 7)
    bn('bn1', 64)
    specs = [(1, 64, 64), (2, 128, 64), (3, 256, 128), (4, 512, 256)]
    for li, c, c_in in specs:
        for bi in range(2):
            ci = c_in if bi == 0 else c
            conv(f'layer{li}.{bi}.conv1', c, ci, 3)
            conv(f'layer{li}.{bi}.conv2', c, c, 3)
            bn(f'layer{li}.{bi}.bn1', c)
            bn(f'layer{li}.{bi}.bn2', c)
            if bi == 0 and li > 1:
                conv(f'layer{li}.{bi}.downsample.0', c, ci, 1)
                bn(f'layer{li}.{bi}.downsample.1', c)
    sd['fc.weight'] = rng.randn(1000, 512).astype(np.float32) * 0.02
    sd['fc.bias'] = rng.randn(1000).astype(np.float32) * 0.1
    return sd


def _torch_forward(sd, x):
    """Reference encoder forward in torch.nn.functional (eval mode)."""
    t = lambda k: torch.tensor(sd[k])

    def bn(name, h):
        return F.batch_norm(h, t(name + '.running_mean'),
                            t(name + '.running_var'), t(name + '.weight'),
                            t(name + '.bias'), False, 0.1, 1e-5)

    h = F.conv2d(x, t('conv1.weight'), stride=1, padding=3)
    feat0 = F.relu(bn('bn1', h))
    h = F.max_pool2d(feat0, 3, 2, 1)
    feats = [feat0]
    for li in (1, 2, 3, 4):
        for bi in range(2):
            p = f'layer{li}.{bi}'
            stride = 2 if (bi == 0 and li > 1) else 1
            identity = h
            o = F.conv2d(h, t(p + '.conv1.weight'), stride=stride, padding=1)
            o = F.relu(bn(p + '.bn1', o))
            o = F.conv2d(o, t(p + '.conv2.weight'), padding=1)
            o = bn(p + '.bn2', o)
            if p + '.downsample.0.weight' in sd:
                identity = F.conv2d(h, t(p + '.downsample.0.weight'),
                                    stride=stride)
                identity = bn(p + '.downsample.1', identity)
            h = F.relu(o + identity)
        feats.append(h)
    v = F.adaptive_avg_pool2d(h, 1).flatten(1)
    v = F.linear(v, t('fc.weight'), t('fc.bias'))
    return v, feats


def test_resencoder_matches_torch(rng):
    sd = _rand_sd(rng)
    x = rng.rand(1, 3, 64, 64).astype(np.float32)

    with torch.no_grad():
        v_ref, feats_ref = _torch_forward(sd, torch.tensor(x))

    m = ResEncoder()
    x_jax = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    vars_ = m.init(jax.random.PRNGKey(0), x_jax)
    params, stats = resencoder_from_torch(sd, dict(vars_['params']),
                                          dict(vars_['batch_stats']),
                                          port_conv1=True)
    v, feats = m.apply({'params': params, 'batch_stats': stats}, x_jax)

    # pyramid parity (feat0..feat4); fc1 head is random so compare pre-fc1
    for i, (ours, ref) in enumerate(zip(feats, feats_ref)):
        ref_np = ref.permute(0, 2, 3, 1).numpy()
        # unnormalized synthetic weights blow activations up to ~700 at
        # level 4; use rtol for the deep levels
        np.testing.assert_allclose(np.asarray(ours), ref_np, atol=2e-3,
                                   rtol=3e-4, err_msg=f'pyramid level {i}')
    # fc (512 -> 1000) parity via re-applying fc1's input: compare through
    # the ported fc by recomputing v_ref -> our fc1 on both
    fc1_k = np.asarray(vars_['params']['fc1']['kernel'])
    fc1_b = np.asarray(vars_['params']['fc1']['bias'])
    expected = v_ref.numpy() @ fc1_k + fc1_b
    np.testing.assert_allclose(np.asarray(v), expected, atol=2e-2)


def test_apply_resnet_ckpt_end_to_end(rng, tmp_path):
    """--resnet_ckpt flag path: .npz state_dict -> TrainState with the
    ported weights spliced into BOTH image encoders (reference loads the
    same IME weights into im_encoder and im_encoder2, train.py:187-210)."""
    from list_tpu.train.state import TrainState, make_optimizer
    from list_tpu.utils.torch_port import apply_resnet_ckpt

    sd = _rand_sd(rng)
    path = str(tmp_path / 'resnet18.npz')
    np.savez(path, **sd)

    m = ResEncoder()
    x = jnp.zeros((1, 32, 32, 3))
    v1 = m.init(jax.random.PRNGKey(0), x)
    v2 = m.init(jax.random.PRNGKey(1), x)
    params = {'im_encoder': dict(v1['params']),
              'im_encoder2': dict(v2['params']),
              'other': {'kernel': np.zeros((2, 2), np.float32)}}
    stats = {'im_encoder': dict(v1['batch_stats']),
             'im_encoder2': dict(v2['batch_stats'])}
    state = TrainState.create(params, stats, make_optimizer(1e-4))

    state, loaded = apply_resnet_ckpt(state, path)
    assert sorted(loaded) == ['im_encoder', 'im_encoder2']
    for name in loaded:
        got = np.asarray(state.params[name]['layer3_0']['conv1']['kernel'])
        want = np.transpose(sd['layer3.0.conv1.weight'], (2, 3, 1, 0))
        np.testing.assert_allclose(got, want)
        np.testing.assert_allclose(
            np.asarray(state.batch_stats[name]['bn1']['mean']),
            sd['bn1.running_mean'])
    # untouched submodule survives
    assert 'other' in state.params


def test_full_width_splice_and_forward():
    """Full-size (real ResNet18 widths, 224^2) splice: a synthetic
    torchvision-shaped state_dict (tools/make_resnet_npz.py produces the
    real one; no egress here) ports into the default ResEncoder, the ported
    tensors land where they should, and the spliced encoder runs forward.
    Reference: network/modules.py:1027-1074, train.py:187-210."""
    import jax
    import jax.numpy as jnp
    from list_tpu.models.resnet import ResEncoder
    from list_tpu.utils.torch_port import resencoder_from_torch

    rng = np.random.RandomState(0)

    def t(*shape):
        return (rng.randn(*shape) * 0.05).astype(np.float32)

    sd = {'conv1.weight': t(64, 3, 7, 7),
          'bn1.weight': t(64), 'bn1.bias': t(64),
          'bn1.running_mean': t(64),
          'bn1.running_var': np.abs(t(64)) + 1.0,
          'fc.weight': t(1000, 512), 'fc.bias': t(1000)}
    widths = {1: (64, 64), 2: (64, 128), 3: (128, 256), 4: (256, 512)}
    for li, (cin, cout) in widths.items():
        for bi in range(2):
            src = f'layer{li}.{bi}'
            i = cin if bi == 0 else cout
            sd[f'{src}.conv1.weight'] = t(cout, i, 3, 3)
            sd[f'{src}.conv2.weight'] = t(cout, cout, 3, 3)
            for bn in ('bn1', 'bn2'):
                sd[f'{src}.{bn}.weight'] = t(cout)
                sd[f'{src}.{bn}.bias'] = t(cout)
                sd[f'{src}.{bn}.running_mean'] = t(cout)
                sd[f'{src}.{bn}.running_var'] = np.abs(t(cout)) + 1.0
            if li > 1 and bi == 0:
                sd[f'{src}.downsample.0.weight'] = t(cout, i, 1, 1)
                sd[f'{src}.downsample.1.weight'] = t(cout)
                sd[f'{src}.downsample.1.bias'] = t(cout)
                sd[f'{src}.downsample.1.running_mean'] = t(cout)
                sd[f'{src}.downsample.1.running_var'] = (
                    np.abs(t(cout)) + 1.0)

    enc = ResEncoder()  # full default widths
    img = jnp.asarray(rng.rand(1, 224, 224, 3), jnp.float32)
    v = enc.init(jax.random.PRNGKey(0), img)
    params, stats = resencoder_from_torch(
        sd, dict(v['params']), dict(v['batch_stats']))
    # ported leaves actually landed (layout-converted)
    np.testing.assert_allclose(
        params['layer3_0']['conv1']['kernel'],
        np.transpose(sd['layer3.0.conv1.weight'], (2, 3, 1, 0)))
    np.testing.assert_allclose(stats['layer4_1']['bn2']['var'],
                               sd['layer4.1.bn2.running_var'])
    np.testing.assert_allclose(params['fc']['kernel'],
                               sd['fc.weight'].T)
    # conv1 keeps OUR init (the reference also re-makes conv1 as stride-1)
    np.testing.assert_allclose(params['conv1']['kernel'],
                               v['params']['conv1']['kernel'])

    featvec, pyramid = enc.apply(
        {'params': params, 'batch_stats': stats}, img)
    assert featvec.shape == (1, 128)
    assert [tuple(f.shape) for f in pyramid] == [
        (1, 224, 224, 64), (1, 112, 112, 64), (1, 56, 56, 128),
        (1, 28, 28, 256), (1, 14, 14, 512)]
    assert np.isfinite(np.asarray(featvec)).all()
