"""Perceptual pooling: pixel-aligned image feature sampling.

Behavioral spec (reference: network/modules.py:15-59):
- bilinearly resize the 5 ResNet pyramid maps to 137x137 (align_corners=True),
- lift 3D queries to homogeneous coords, project through the learned (B,4,3)
  spatial-transformer matrix with perspective divide (+1e-8),
- clamp pixel xy to [0, 136], normalize to [-1, 1],
- grid_sample each map (align_corners=True) and concat channels -> 1024-d.

TPU-first notes: resizing is two interpolation-matrix matmuls (MXU), sampling
is a batched gather; everything fuses under jit.  Layout is channels-last;
callers get (B, N, 1024).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from list_tpu.ops.sampling import grid_sample_2d, resize_bilinear_align_corners


class PerceptualPooling(nn.Module):
    map_size: int = 137

    def __call__(self, img_featuremaps: Sequence[jnp.ndarray],
                 pc: jnp.ndarray, trans_mat: jnp.ndarray) -> jnp.ndarray:
        """img_featuremaps: list of (B, Hi, Wi, Ci); pc: (B, N, 3);
        trans_mat: (B, 4, 3).  Returns (B, N, sum(Ci))."""
        ms = self.map_size
        homo = jnp.concatenate(
            [pc, jnp.ones(pc.shape[:-1] + (1,), pc.dtype)], axis=-1)
        pc_xyz = jnp.einsum('bnk,bkj->bnj', homo, trans_mat)  # (B, N, 3)
        pc_xy = pc_xyz[..., :2] / (pc_xyz[..., 2:] + 1e-8)
        pc_xy = jnp.clip(pc_xy, 0.0, float(ms - 1))
        half = (ms - 1) / 2.0
        grid = (pc_xy - half) / half  # normalized [-1, 1]

        # Sampling is per-pixel, so concat-then-sample == sample-then-concat:
        # ONE 1024-channel gather instead of five (gather ops carry fixed
        # per-op costs on TPU — r3 train trace).  All clamped points are
        # in-bounds, so zeros-vs-border padding is irrelevant; zeros matches
        # torch's default (modules.py:48-52).
        fmaps = jnp.concatenate(
            [resize_bilinear_align_corners(f, ms, ms)
             for f in img_featuremaps], axis=-1)
        return grid_sample_2d(fmaps, grid, padding_mode='zeros',
                              align_corners=True)
