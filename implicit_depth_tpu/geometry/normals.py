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


def image_gradients_planar(x: jnp.ndarray):
    """x: (B, 3, H, W) channel-planar -> (dx, dy) same shape.

    Planar layout keeps W (not the 3-wide channel dim) in the TPU lane
    dimension — the NHWC form wastes 125/128 lanes on every elementwise op
    of the surf-norm loss branch (measured ~2x on the serial train step).
    The reference's own tensors are NCHW (point_utils.py:210-235)."""
    dx = jnp.concatenate(
        [x[:, :, :, 1:] - x[:, :, :, :-1], jnp.zeros_like(x[:, :, :, :1])],
        axis=3)
    dy = jnp.concatenate(
        [x[:, :, 1:, :] - x[:, :, :-1, :], jnp.zeros_like(x[:, :, :1, :])],
        axis=2)
    return dx, dy


def surface_normals_planar(pcl: jnp.ndarray, eps: float = 1e-8):
    """pcl: (B, 3, H, W) -> (normal (B,3,H,W), dx, dy). Planar twin of
    ``surface_normals`` (same eps-inside-sqrt NaN guard)."""
    dx, dy = image_gradients_planar(pcl)
    n = jnp.stack([
        dx[:, 1] * dy[:, 2] - dx[:, 2] * dy[:, 1],
        dx[:, 2] * dy[:, 0] - dx[:, 0] * dy[:, 2],
        dx[:, 0] * dy[:, 1] - dx[:, 1] * dy[:, 0],
    ], axis=1)
    norm = jnp.sqrt(jnp.sum(n * n, axis=1, keepdims=True) + eps * eps)
    return n / norm, dx, dy


def surface_normals(pcl: jnp.ndarray, eps: float = 1e-8):
    """pcl: (B, H, W, 3) -> (normal (B,H,W,3), dx, dy).

    The norm uses sqrt(sum² + eps²) rather than ‖·‖+eps: jnp.linalg.norm has
    a NaN gradient at exactly 0, and zero cross products are guaranteed
    (image border rows/cols have zero gradients by construction) — the naive
    form NaN-poisons the whole backward pass.
    """
    dx, dy = image_gradients(pcl)
    n = jnp.cross(dx, dy)
    norm = jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True) + eps * eps)
    return n / norm, dx, dy
