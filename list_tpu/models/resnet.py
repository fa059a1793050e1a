"""ResNet18 image encoder (flax, channels-last NHWC).

Behavioral spec (reference: network/modules.py:1027-1074):
- torchvision ResNet18 whose ``conv1`` is replaced by a stride-1 7x7 conv, so
  ``feat0`` keeps the full 224x224 resolution; the subsequent maxpool halves
  it twice relative to stock ResNet (layer1 runs at 56^2 for 224^2 input).
- Returns a 128-d global vector (avgpool -> fc 512->1000 -> fc1 1000->128)
  plus the 5-level pyramid [feat0(64,224^2), layer1(64,56^2), layer2(128,28^2),
  layer3(256,14^2), layer4(512,7^2)].

BatchNorm: torch defaults (eps 1e-5, momentum 0.1 == flax momentum 0.9).
Under a sharded jit the batch statistics are global across the data axis
(an intentional sync-BN upgrade over torch DataParallel's per-replica stats).

Pretrained ImageNet weights can be imported from a torchvision state_dict via
``list_tpu.utils.torch_port.resnet18_from_torch`` when a checkpoint file is
available; otherwise training starts from torch-default random init.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from list_tpu.models.init import make_torch_bias, torch_linear_kernel


class _BN(nn.Module):
    train: bool

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(use_running_average=not self.train,
                            momentum=0.9, epsilon=1e-5, name='bn')(x)


def bn(train: bool, name: str):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name)


class BasicBlock(nn.Module):
    """torchvision BasicBlock: conv3x3-bn-relu-conv3x3-bn (+downsample) -> relu."""
    filters: int
    stride: int = 1
    train: bool = False

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.Conv(self.filters, (3, 3), strides=(self.stride,) * 2,
                      padding=1, use_bias=False,
                      kernel_init=torch_linear_kernel, name='conv1')(x)
        out = bn(self.train, 'bn1')(out)
        out = nn.relu(out)
        out = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False,
                      kernel_init=torch_linear_kernel, name='conv2')(out)
        out = bn(self.train, 'bn2')(out)
        if self.stride != 1 or x.shape[-1] != self.filters:
            identity = nn.Conv(self.filters, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               kernel_init=torch_linear_kernel,
                               name='downsample_conv')(x)
            identity = bn(self.train, 'downsample_bn')(identity)
        return nn.relu(out + identity)


class ResEncoder(nn.Module):
    """Stride-1-conv1 ResNet18; returns (featvec (B,128), pyramid list).

    ``filters``/``fc_dim`` default to the reference architecture
    (modules.py:1027-1074); narrower settings exist only for cheap
    multi-device dry runs and CI (never used by shipped configs).
    """
    filters: Sequence[int] = (64, 64, 128, 256, 512)
    fc_dim: int = 1000
    out_dim: int = 128

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, Sequence[jnp.ndarray]]:
        # x: (B, H, W, 3)
        f = tuple(self.filters)
        feat0 = nn.Conv(f[0], (7, 7), strides=(1, 1), padding=3,
                        use_bias=False, kernel_init=torch_linear_kernel,
                        name='conv1')(x)
        feat0 = bn(train, 'bn1')(feat0)
        feat0 = nn.relu(feat0)
        # torch maxpool: kernel 3, stride 2, padding 1
        h = nn.max_pool(feat0, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        def layer(h, filters, stride, name):
            h = BasicBlock(filters, stride, train, name=f'{name}_0')(h)
            return BasicBlock(filters, 1, train, name=f'{name}_1')(h)

        feat1 = layer(h, f[1], 1, 'layer1')
        feat2 = layer(feat1, f[2], 2, 'layer2')
        feat3 = layer(feat2, f[3], 2, 'layer3')
        feat4 = layer(feat3, f[4], 2, 'layer4')

        pooled = jnp.mean(feat4, axis=(1, 2))  # adaptive avgpool to 1x1
        v = nn.Dense(self.fc_dim, kernel_init=torch_linear_kernel,
                     bias_init=make_torch_bias(f[4]), name='fc')(pooled)
        featvec = nn.Dense(self.out_dim, kernel_init=torch_linear_kernel,
                           bias_init=make_torch_bias(self.fc_dim),
                           name='fc1')(v)
        return featvec, [feat0, feat1, feat2, feat3, feat4]
