"""Per-point MLP (flax).

Behavioral spec (reference: network/modules.py:62-104): 1x1 Conv2d MLP
3 -> 64 -> 256 -> 512 with BatchNorm+ReLU per block over a (B,3,1,N) layout,
Xavier-normal conv init, zero bias.  A 1x1 conv over points is a Dense over
the channel axis, so we run (B, N, 3) -> (B, N, 512) channels-last; BatchNorm
reduces over (batch, points), matching BatchNorm2d over (B, 1, N).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from list_tpu.models.init import xavier_normal


class PointMLP(nn.Module):
    features: tuple = (64, 256, 512)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # x: (B, N, 3) -> (B, N, features[-1])
        for i, f in enumerate(self.features):
            x = nn.Dense(f, kernel_init=xavier_normal,
                         bias_init=nn.initializers.zeros,
                         name=f'block{i + 1}_conv')(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f'block{i + 1}_bn')(x)
            x = nn.relu(x)
        return x
