"""flax BatchNorm configuration parity vs torch BatchNorm (momentum/eps)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import flax.linen as nn


def test_batchnorm_train_and_running_stats(rng):
    """Our BN config (momentum=0.9, eps=1e-5) must match torch's defaults
    (momentum=0.1): new_running = 0.9*old + 0.1*batch."""
    x = rng.randn(8, 5).astype(np.float32)

    tbn = torch.nn.BatchNorm1d(5, momentum=0.1, eps=1e-5)
    tbn.train()
    with torch.no_grad():
        t_out = tbn(torch.tensor(x)).numpy()

    m = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    vars_ = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out, updates = m.apply(vars_, jnp.asarray(x), mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(out), t_out, atol=1e-5)

    # torch running_var uses the UNBIASED batch variance; flax uses biased.
    # For BN parity what matters at eval is close running stats; check mean
    # exactly and var within the n/(n-1) factor.
    np.testing.assert_allclose(np.asarray(updates['batch_stats']['mean']),
                               tbn.running_mean.numpy(), atol=1e-6)
    ratio = tbn.running_var.numpy() / np.asarray(
        updates['batch_stats']['var'])
    # running_var = 0.9*1 + 0.1*var_batch -> ratio between 1 and n/(n-1)
    assert (ratio > 0.99).all() and (ratio < 1.2).all()


def test_batchnorm_eval_mode(rng):
    x = rng.randn(4, 3).astype(np.float32)
    mean = rng.randn(3).astype(np.float32) * 0.1
    var = rng.rand(3).astype(np.float32) + 0.5
    scale = rng.rand(3).astype(np.float32) + 0.5
    bias = rng.randn(3).astype(np.float32) * 0.1

    tbn = torch.nn.BatchNorm1d(3, eps=1e-5)
    with torch.no_grad():
        tbn.running_mean.copy_(torch.tensor(mean))
        tbn.running_var.copy_(torch.tensor(var))
        tbn.weight.copy_(torch.tensor(scale))
        tbn.bias.copy_(torch.tensor(bias))
    tbn.eval()
    with torch.no_grad():
        ref = tbn(torch.tensor(x)).numpy()

    m = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5)
    vars_ = {'params': {'scale': jnp.asarray(scale),
                        'bias': jnp.asarray(bias)},
             'batch_stats': {'mean': jnp.asarray(mean),
                             'var': jnp.asarray(var)}}
    out = m.apply(vars_, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
