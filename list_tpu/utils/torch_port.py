"""Import torchvision ResNet18 weights into the flax ResEncoder.

The reference builds its encoders from ImageNet-pretrained torchvision
ResNet18 (network/modules.py:1030).  This container has no torchvision (and
zero egress), so pretrained initialization is optional: when a torchvision
``resnet18`` state_dict (or a ``.pt``/``.pth`` file of one) is available,
``resencoder_from_torch`` maps it onto our parameter tree; otherwise
training starts from torch-default random init (documented deviation).

Layout conversions:
- Conv2d weight (O, I, kH, kW) -> flax kernel (kH, kW, I, O)
- Linear weight (O, I) -> flax kernel (I, O)
- BatchNorm weight/bias -> scale/bias; running_mean/var -> batch_stats

The fc1 (1000 -> 128) head is NOT part of torchvision and keeps its random
init, exactly like the reference.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _conv(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _linear(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (1, 0))


def _bn(sd: Dict, prefix: str) -> Tuple[Dict, Dict]:
    params = {'scale': np.asarray(sd[prefix + '.weight']),
              'bias': np.asarray(sd[prefix + '.bias'])}
    stats = {'mean': np.asarray(sd[prefix + '.running_mean']),
             'var': np.asarray(sd[prefix + '.running_var'])}
    return params, stats


def resencoder_from_torch(state_dict: Dict, params: Dict, batch_stats: Dict,
                          port_conv1: bool = False) -> Tuple[Dict, Dict]:
    """Return (params, batch_stats) with torchvision weights spliced in.

    ``port_conv1=False`` keeps our random stride-1 conv1 (the reference also
    REPLACES conv1 with a fresh nn.Conv2d, modules.py:1032-1033, so the
    pretrained conv1 weights are discarded there too).
    """
    params = {k: dict(v) if isinstance(v, dict) else v
              for k, v in params.items()}
    batch_stats = {k: dict(v) if isinstance(v, dict) else v
                   for k, v in batch_stats.items()}

    if port_conv1 and 'conv1.weight' in state_dict:
        params['conv1'] = {'kernel': _conv(state_dict['conv1.weight'])}
    p, s = _bn(state_dict, 'bn1')
    params['bn1'], batch_stats['bn1'] = p, s

    for li, filters in ((1, 64), (2, 128), (3, 256), (4, 512)):
        for bi in range(2):
            src = f'layer{li}.{bi}'
            dst = f'layer{li}_{bi}'
            block_p = dict(params[dst])
            block_s = dict(batch_stats[dst])
            block_p['conv1'] = {'kernel': _conv(state_dict[src + '.conv1.weight'])}
            block_p['conv2'] = {'kernel': _conv(state_dict[src + '.conv2.weight'])}
            p, s = _bn(state_dict, src + '.bn1')
            block_p['bn1'], block_s['bn1'] = p, s
            p, s = _bn(state_dict, src + '.bn2')
            block_p['bn2'], block_s['bn2'] = p, s
            if src + '.downsample.0.weight' in state_dict:
                block_p['downsample_conv'] = {
                    'kernel': _conv(state_dict[src + '.downsample.0.weight'])}
                p, s = _bn(state_dict, src + '.downsample.1')
                block_p['downsample_bn'], block_s['downsample_bn'] = p, s
            params[dst] = block_p
            batch_stats[dst] = block_s

    params['fc'] = {'kernel': _linear(state_dict['fc.weight']),
                    'bias': np.asarray(state_dict['fc.bias'])}
    # fc1 (1000 -> 128) is LIST's own head; keep its init.
    return params, batch_stats


def load_torch_state_dict(path: str) -> Dict:
    """Load a .pt/.pth state_dict (requires torch, CPU map)."""
    import torch
    sd = torch.load(path, map_location='cpu')
    if hasattr(sd, 'state_dict'):
        sd = sd.state_dict()
    if 'state_dict' in sd and isinstance(sd['state_dict'], dict):
        sd = sd['state_dict']
    return {k: v.numpy() if hasattr(v, 'numpy') else v
            for k, v in sd.items()}


def load_state_dict_file(path: str) -> Dict:
    """Load a torchvision state_dict from .npz (numpy archive of the same
    key names) or .pt/.pth (torch.load)."""
    if path.endswith('.npz'):
        return dict(np.load(path))
    return load_torch_state_dict(path)


def apply_resnet_ckpt(state, path: str,
                      encoder_names=('im_encoder', 'im_encoder2',
                                     'image_encoder')):
    """Splice pretrained ResNet18 weights (--resnet_ckpt) into every image
    encoder present in a TrainState (reference initializes from torchvision
    ImageNet weights, modules.py:1030; the same IME weights go to both
    im_encoder and im_encoder2, train.py:187-210)."""
    sd = load_state_dict_file(path)
    params = dict(state.params)
    stats = dict(state.batch_stats)
    hit = []
    for name in encoder_names:
        if name not in params:
            continue
        p, s = resencoder_from_torch(sd, dict(params[name]),
                                     dict(stats.get(name, {})))
        params[name] = p
        stats[name] = s
        hit.append(name)
    if not hit:
        raise ValueError(f'no image encoder found among {encoder_names}')
    return state.replace(params=params, batch_stats=stats), hit
