"""Weight initializers matching PyTorch defaults and the reference's explicit
init choices, so from-scratch training dynamics match the reference.

- ``torch_linear_kernel`` / ``torch_linear_bias``: torch ``nn.Linear``/``nn.Conv``
  defaults (kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))).
- ``xavier_normal``: PointMLP conv init (reference: network/modules.py:85).
- ``kaiming_normal_leaky``: TreeGCN W_branch init (reference: layers/gcn.py:36).
- ``uniform_stdv``: TreeGCN bias init (reference: layers/gcn.py:38-39).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _fan_in_linear(shape):
    # flax Dense kernel shape: (in, out)
    return shape[0]


def _fan_in_conv(shape):
    # flax Conv kernel shape: (*window, in, out)
    receptive = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    return shape[-2] * receptive


def torch_linear_kernel(key, shape, dtype=jnp.float32):
    """U(+-1/sqrt(fan_in)) — torch Linear/Conv default kernel init."""
    fan_in = _fan_in_conv(shape) if len(shape) > 2 else _fan_in_linear(shape)
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def make_torch_bias(fan_in: int):
    """U(+-1/sqrt(fan_in)) — torch Linear/Conv default bias init."""
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def xavier_normal(key, shape, dtype=jnp.float32):
    """torch ``nn.init.xavier_normal_`` on the flax kernel layout."""
    if len(shape) > 2:
        fan_in, fan_out = _fan_in_conv(shape), shape[-1] * int(np.prod(shape[:-2]))
    else:
        fan_in, fan_out = shape[0], shape[1]
    std = np.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype)


def make_kaiming_normal_leaky(fan_in: int, a: float = 0.2):
    """torch ``kaiming_normal_(a, mode='fan_in', nonlinearity='leaky_relu')``
    with an explicitly provided fan_in (torch computes fan_in from the raw
    tensor layout, which differs from flax's)."""
    gain = np.sqrt(2.0 / (1.0 + a * a))
    std = gain / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


def make_uniform_stdv(stdv: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -stdv, stdv)

    return init


def normal_std(std: float):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init
