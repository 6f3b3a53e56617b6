"""Camera ray directions.

Parity: reference ``get_miss_ray`` direction construction
(src/models/pipeline.py:210-220): dir = normalize(x-cx, (y-cy)*fx/fy, fx),
i.e. the unnormalized direction scaled by fx; the camera sits at the origin.
"""

from __future__ import annotations

import jax.numpy as jnp


def ray_dir_map(h: int, w: int, fx, fy, cx, cy, dtype=jnp.float32) -> jnp.ndarray:
    """Normalized per-pixel ray directions, shape (..., h, w, 3).

    fx/fy/cx/cy: scalars or batched (...,) arrays.
    """
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=dtype), jnp.arange(w, dtype=dtype),
                          indexing="ij")
    fx = jnp.asarray(fx, dtype)[..., None, None]
    fy = jnp.asarray(fy, dtype)[..., None, None]
    cx = jnp.asarray(cx, dtype)[..., None, None]
    cy = jnp.asarray(cy, dtype)[..., None, None]
    cam_x = xx - cx
    cam_y = (yy - cy) * fx / fy
    cam_z = jnp.broadcast_to(fx, cam_x.shape)
    cam_x, cam_y, cam_z = jnp.broadcast_arrays(cam_x, cam_y, cam_z)
    d = jnp.stack([cam_x, cam_y, cam_z], axis=-1)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)
