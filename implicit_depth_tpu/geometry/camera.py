"""Pinhole camera back-projection.

Parity: reference ``compute_xyz`` (src/utils/data_augmentation.py:55-75):
x = (u - cx) * z / fx, y = (v - cy) * z / fy in camera space.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _pixel_grid(h: int, w: int):
    v, u = np.mgrid[0:h, 0:w].astype(np.float32)
    return u, v


def compute_xyz_np(depth: np.ndarray, fx: float, fy: float, cx: float, cy: float) -> np.ndarray:
    """(H, W) depth -> (H, W, 3) ordered point cloud. Host-side numpy.

    Grid cached per (h, w) and channels written in place — this runs twice
    per item at SOURCE resolution (1080p) in the loader hot path."""
    h, w = depth.shape
    u, v = _pixel_grid(h, w)
    depth = depth.astype(np.float32, copy=False)
    out = np.empty((h, w, 3), np.float32)
    np.multiply(u - cx, depth, out=out[..., 0])
    out[..., 0] /= fx
    np.multiply(v - cy, depth, out=out[..., 1])
    out[..., 1] /= fy
    out[..., 2] = depth
    return out


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
