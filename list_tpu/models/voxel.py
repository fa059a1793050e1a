"""3D voxel encoder and SDF decoder head (flax, channels-last NDHWC).

VoxelEncoder2 (reference: network/modules.py:401-442), layer spec
[1,1,1,1,16,32,64,128,128]:
- l<2:  conv3x3x3 + ReLU + BN
- l==2: conv + **sigmoid** -> this 1-channel 128^3 map is features[0] and
  doubles as the refined occupancy prediction used by the occ loss.
- l>2:  conv + ReLU, conv + ReLU, BN, collect feature, maxpool(2)
Multi-scale features: [1@128^3, 16@128^3, 32@64^3, 64@32^3, 128@16^3, 128@8^3].

VoxelDecoder2 (reference: network/modules.py:192-282): per query point, 7
displaced samples (center +- 0.0722 per axis), trilinear border-padded
align-corners sampling of all 6 scales (369 ch x 7 = 2583), concat perceptual
features (1024) + xyz (3) = 3610-d, then a 1x1-conv MLP
3610 -> 2*h -> h -> h -> 1 with ReLU (h=256 -> hidden dims 512/256/256).
"""

from __future__ import annotations

from typing import List, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from list_tpu.models.init import make_torch_bias, torch_linear_kernel
from list_tpu.ops.sampling import grid_sample_3d


def _bn(train: bool, name: str):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name)


def _conv3d(features: int, in_ch: int, name: str):
    return nn.Conv(features, (3, 3, 3), padding=1,
                   kernel_init=torch_linear_kernel,
                   bias_init=make_torch_bias(in_ch * 27), name=name)


class VoxelEncoder2(nn.Module):
    layers: Sequence[int] = (1, 1, 1, 1, 16, 32, 64, 128, 128)

    @nn.compact
    def __call__(self, occ: jnp.ndarray, train: bool = False
                 ) -> List[jnp.ndarray]:
        # occ: (B, R, R, R) -> features list, channels last.
        net = occ[..., None]
        features = []
        L = list(self.layers)
        for l in range(len(L) - 1):
            if l < 2:
                net = nn.relu(_conv3d(L[l + 1], L[l], f'conv_{l}')(net))
                net = _bn(train, f'bn_{l}')(net)
            elif l == 2:
                net = nn.sigmoid(_conv3d(L[l + 1], L[l], f'conv_{l}')(net))
                features.append(net)
            else:
                net = nn.relu(_conv3d(L[l + 1], L[l], f'conv_{l}')(net))
                net = nn.relu(_conv3d(L[l + 1], L[l + 1], f'conv_{l}_0')(net))
                net = _bn(train, f'bn_{l}')(net)
                features.append(net)
                net = nn.max_pool(net, (2, 2, 2), strides=(2, 2, 2))
        return features


def make_displacements(delta: float = 0.0722) -> np.ndarray:
    """(7, 3): center, then +-delta on each axis in the reference's order
    (modules.py:205-214)."""
    disp = [[0.0, 0.0, 0.0]]
    for ax in range(3):
        for s in (-1.0, 1.0):
            d = [0.0, 0.0, 0.0]
            d[ax] = s * delta
            disp.append(d)
    return np.asarray(disp, np.float32)


def sample_multiscale(feat: Sequence[jnp.ndarray], p: jnp.ndarray,
                      delta: float = 0.0722) -> jnp.ndarray:
    """Displaced multi-scale trilinear feature gather.

    feat: list of (B, D, H, W, Ci); p: (B, N, 3) normalized coords.
    Returns (B, N, sum(Ci)*7) ordered channel-major (c*7 + d), matching the
    reference's reshape of (B, C, 7, N) -> (B, C*7, N) (modules.py:270-273).
    """
    B, N, _ = p.shape
    disp = jnp.asarray(make_displacements(delta), p.dtype)  # (7, 3)
    pd = p[:, None, :, :] + disp[None, :, None, :]  # (B, 7, N, 3)
    pd = pd.reshape(B, 7 * N, 3)
    outs = []
    for f in feat:
        s = grid_sample_3d(f, pd, padding_mode='border', align_corners=True)
        s = s.reshape(B, 7, N, f.shape[-1])
        outs.append(jnp.transpose(s, (0, 2, 3, 1)))  # (B, N, C, 7)
    out = jnp.concatenate(outs, axis=2)  # (B, N, 369, 7)
    return out.reshape(B, N, -1)


class VoxelDecoder2(nn.Module):
    """SDF head. Returns (B, N) raw SDF values (in sdf_scale units)."""
    h_dim: int = 256
    delta: float = 0.0722

    @nn.compact
    def __call__(self, p: jnp.ndarray, feat: Sequence[jnp.ndarray],
                 percep_feat: jnp.ndarray) -> jnp.ndarray:
        # p: (B, N, 3); percep_feat: (B, N, 1024)
        vox = sample_multiscale(feat, p, self.delta)
        x = jnp.concatenate([vox, percep_feat, p], axis=-1)
        dims = [self.h_dim * 2, self.h_dim, self.h_dim]
        names = ['fc_0', 'fc_1', 'fc_2']
        for dim, name in zip(dims, names):
            x = nn.relu(nn.Dense(dim, kernel_init=torch_linear_kernel,
                                 bias_init=make_torch_bias(x.shape[-1]),
                                 name=name)(x))
        x = nn.Dense(1, kernel_init=torch_linear_kernel,
                     bias_init=make_torch_bias(x.shape[-1]), name='fc_out')(x)
        return x[..., 0]
