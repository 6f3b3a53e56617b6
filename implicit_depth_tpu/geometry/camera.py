"""Pinhole camera back-projection.

Parity: reference ``compute_xyz`` (src/utils/data_augmentation.py:55-75):
x = (u - cx) * z / fx, y = (v - cy) * z / fy in camera space.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def compute_xyz_np(depth: np.ndarray, fx: float, fy: float, cx: float, cy: float) -> np.ndarray:
    """(H, W) depth -> (H, W, 3) ordered point cloud. Host-side numpy."""
    h, w = depth.shape
    v, u = np.mgrid[0:h, 0:w].astype(np.float32)
    x = (u - cx) * depth / fx
    y = (v - cy) * depth / fy
    return np.stack([x, y, depth], axis=-1).astype(np.float32)


def compute_xyz(depth: jnp.ndarray, fx, fy, cx, cy) -> jnp.ndarray:
    """JAX version. depth: (..., H, W); fx/fy/cx/cy scalars or (...,) batched."""
    h, w = depth.shape[-2:]
    v = jnp.arange(h, dtype=depth.dtype)[:, None]
    u = jnp.arange(w, dtype=depth.dtype)[None, :]
    fx = jnp.asarray(fx, depth.dtype)[..., None, None]
    fy = jnp.asarray(fy, depth.dtype)[..., None, None]
    cx = jnp.asarray(cx, depth.dtype)[..., None, None]
    cy = jnp.asarray(cy, depth.dtype)[..., None, None]
    x = (u - cx) * depth / fx
    y = (v - cy) * depth / fy
    return jnp.stack([x, y, depth], axis=-1)
