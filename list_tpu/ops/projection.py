"""Camera/pixel projection helpers (reference: network/net_util.py:5-89,
utils.py:113-137).

These are the generic world->camera->pixel utilities; the shipped LIST
configs use the learned spatial-transformer projection inside
PerceptualPooling, but the helpers are part of the public surface (used by
camera-supervised variants / --supervise_proj experiments).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def transform_points(points: jnp.ndarray, transmat: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous transform: (B, N, 3) x (B, 4, 3or4) -> (B, N, k)."""
    ones = jnp.ones(points.shape[:-1] + (1,), points.dtype)
    homo = jnp.concatenate([points, ones], axis=-1)
    return jnp.einsum('bnk,bkj->bnj', homo, transmat)


def project_points_to_pixels(homopoints: jnp.ndarray, img_res: int = 224
                             ) -> jnp.ndarray:
    """Perspective divide + integer pixel clamping (net_util semantics):
    (B, N, 3) -> (B, N, 2) int32 pixels in [0, img_res-1]."""
    xy = homopoints[..., :2] / homopoints[..., 2:3]
    pixels = xy.astype(jnp.int32)
    return jnp.clip(pixels, 0, img_res - 1)


def project_points_to_uv(homopoints: jnp.ndarray, img_res: int = 224
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Normalized uv in [-1, 1] plus depth."""
    xy = homopoints[..., :2] / homopoints[..., 2:3]
    uv = xy * 2.0 / img_res - 1.0
    return uv, homopoints[..., 2]


def check_points(points: jnp.ndarray, img_res: int) -> jnp.ndarray:
    """Clamp integer pixel coords into the image (reference utils.py:63-69)."""
    return jnp.clip(points, 0, img_res - 1)


def sample_features_by_pixels(featmap: jnp.ndarray, pixels: jnp.ndarray
                              ) -> jnp.ndarray:
    """Nearest-pixel feature lookup: featmap (B, H, W, C), pixels (B, N, 2)
    int (x, y) -> (B, N, C) (net_util index_select equivalent)."""
    b, h, w, c = featmap.shape
    flat = featmap.reshape(b, h * w, c)
    idx = pixels[..., 1] * w + pixels[..., 0]
    return jnp.take_along_axis(flat, idx[..., None], axis=1)
