"""Image-space gradients and surface normals of an ordered point cloud.

Parity: reference ``gradient``/``get_surface_normal``
(src/utils/point_utils.py:210-235), itself modeled on
tf.image.image_gradients: dx = right - left with a zero last column,
dy = bottom - top with a zero last row; normal = normalize(dx × dy).
"""

from __future__ import annotations

import jax.numpy as jnp


def image_gradients(x: jnp.ndarray):
    """x: (B, H, W, C) -> (dx, dy) same shape (NHWC; reference uses NCHW)."""
    dx = jnp.concatenate(
        [x[:, :, 1:, :] - x[:, :, :-1, :], jnp.zeros_like(x[:, :, :1, :])], axis=2)
    dy = jnp.concatenate(
        [x[:, 1:, :, :] - x[:, :-1, :, :], jnp.zeros_like(x[:, :1, :, :])], axis=1)
    return dx, dy


def surface_normals(pcl: jnp.ndarray, eps: float = 1e-8):
    """pcl: (B, H, W, 3) -> (normal (B,H,W,3), dx, dy)."""
    dx, dy = image_gradients(pcl)
    n = jnp.cross(dx, dy)
    n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + eps)
    return n, dx, dy
