"""Loss numerics vs reference formulas (torch oracle where nontrivial)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from list_tpu.ops import sdf_loss, occupancy_loss, chamfer_distance, chamfer_loss


def test_sdf_loss_values(rng):
    """Parity with network/losses.py:15-38."""
    B, N = 3, 17
    pred = rng.randn(B, N).astype(np.float32)
    gt = rng.randn(B, N).astype(np.float32)
    scale = 10.0
    out = sdf_loss(jnp.asarray(pred), jnp.asarray(gt), scale)

    t_pred, t_gt = torch.tensor(pred), torch.tensor(gt)
    ref_loss = torch.mean(((t_gt * scale - t_pred) ** 2).sum(-1)).item()
    ref_real = (torch.mean((t_gt - t_pred / scale) ** 2) * 10000).item()
    ref_acc = torch.mean(
        torch.eq(t_gt > 0.5, t_pred > 0.5).float()).item()

    np.testing.assert_allclose(float(out['sdf_loss']), ref_loss, rtol=1e-5)
    np.testing.assert_allclose(float(out['ignore_sdf_loss_realvalue']),
                               ref_real, rtol=1e-4)
    np.testing.assert_allclose(float(out['ignore_sdf_accuracy']), ref_acc,
                               rtol=1e-6)


def test_occupancy_loss(rng):
    """Parity with network/executors.py:138-144."""
    occ_gt = (rng.rand(2, 8, 8, 8) > 0.5).astype(np.float32)
    occ = rng.rand(2, 8, 8, 8).astype(np.float32)
    ours = float(occupancy_loss(jnp.asarray(occ), jnp.asarray(occ_gt)))
    t_occ, t_gt = torch.tensor(occ), torch.tensor(occ_gt)
    w = 0.9
    ref = 1000 * (-w * torch.mean(t_gt * torch.log(t_occ + 1e-8))
                  - (1 - w) * torch.mean((1 - t_gt) * torch.log(1 - t_occ + 1e-8)))
    np.testing.assert_allclose(ours, ref.item(), rtol=1e-5)


def test_occupancy_loss_saturated_finite(rng):
    """Exactly-saturated sigmoid outputs (0.0 / 1.0) must give a finite
    loss AND finite gradients matching eager torch.  On TPU, XLA rewrites
    log(1 - p + 1e-8) into log1p(-p + 1e-8) whose f32 rounding at p == 1
    is log(0) = -inf: 0 * -inf NaN'd the forward mean, and an output-side
    floor still NaN'd the backward (zero cotangent x log1p's 1/0 local
    derivative); the input-side clamp guards both without changing any
    reachable numerics."""
    occ_gt = (rng.rand(2, 8, 8, 8) > 0.5).astype(np.float32)
    occ = rng.rand(2, 8, 8, 8).astype(np.float32)
    occ[0, :4] = 1.0
    occ[1, :4] = 0.0
    loss_j = jax.jit(occupancy_loss)
    ours = float(loss_j(jnp.asarray(occ), jnp.asarray(occ_gt)))
    assert np.isfinite(ours)
    g = jax.jit(jax.grad(occupancy_loss))(jnp.asarray(occ),
                                          jnp.asarray(occ_gt))
    assert np.isfinite(np.asarray(g)).all(), 'NaN/inf in saturated BCE grad'
    t_occ, t_gt = torch.tensor(occ), torch.tensor(occ_gt)
    w = 0.9
    ref = 1000 * (-w * torch.mean(t_gt * torch.log(t_occ + 1e-8))
                  - (1 - w) * torch.mean((1 - t_gt) * torch.log(1 - t_occ + 1e-8)))
    np.testing.assert_allclose(ours, ref.item(), rtol=1e-5)


def test_occ_loss_random_baseline():
    """Constant 0.5 prediction gives ~346.574 (executors.py:137 comment)."""
    occ = np.full((1, 4, 4, 4), 0.5, np.float32)
    gt = np.zeros((1, 4, 4, 4), np.float32)
    gt[0, :2] = 1.0
    val = float(occupancy_loss(jnp.asarray(occ), jnp.asarray(gt)))
    assert abs(val - 1000.0 * -np.log(0.5) / 2.0) < 0.5


def test_chamfer_identity(rng):
    x = rng.randn(2, 50, 3).astype(np.float32)
    assert float(chamfer_distance(jnp.asarray(x), jnp.asarray(x))) < 1e-5


def test_chamfer_known_value():
    x = jnp.array([[[0.0, 0, 0], [1, 0, 0]]])
    y = jnp.array([[[0.0, 0, 0], [1, 1, 0]]])
    # fwd: min dists^2 = [0, 1] -> mean 0.5 ; bwd: [0, 1] -> mean 0.5
    np.testing.assert_allclose(float(chamfer_distance(x, y)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(chamfer_loss(x, y)), 1000.0, rtol=1e-6)


def test_chamfer_asymmetric_sizes(rng):
    x = rng.randn(1, 40, 3).astype(np.float32)
    y = rng.randn(1, 70, 3).astype(np.float32)
    d2 = ((x[0][:, None, :] - y[0][None, :, :]) ** 2).sum(-1)
    ref = d2.min(1).mean() + d2.min(0).mean()
    np.testing.assert_allclose(float(chamfer_distance(jnp.asarray(x), jnp.asarray(y))),
                               ref, rtol=1e-4)
