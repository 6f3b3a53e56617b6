"""Procedural synthetic scenes.

Generates batches with the same contract as the real loaders (ClearGrasp /
Omniverse): a tilted background plane plus a few spheres, one of which is
"transparent" (depth removed inside its mask). Used by tests, benchmarks and
smoke training when the real datasets are absent.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from implicit_depth_tpu import constants
from implicit_depth_tpu.geometry.camera import compute_xyz_np


def synthetic_sample(rng: np.random.Generator, h: int = 240, w: int = 320) -> Dict[str, np.ndarray]:
    fov_x = 1.2112585306167603
    fov_y = 0.7428327202796936
    fx = w * 0.5 / np.tan(fov_x * 0.5)
    fy = h * 0.5 / np.tan(fov_y * 0.5)
    cx, cy = w * 0.5, h * 0.5

    v, u = np.mgrid[0:h, 0:w].astype(np.float32)
    # tilted background plane: z = z0 + a*(u-cx)/w + b*(v-cy)/h
    z0 = rng.uniform(0.8, 1.6)
    a, b = rng.uniform(-0.2, 0.2, size=2)
    depth = z0 + a * (u - cx) / w + b * (v - cy) / h

    corrupt_mask = np.zeros((h, w), np.float32)
    n_obj = rng.integers(2, 5)
    for i in range(n_obj):
        ou, ov = rng.uniform(0.2, 0.8) * w, rng.uniform(0.2, 0.8) * h
        rad = rng.uniform(0.05, 0.15) * w
        d2 = (u - ou) ** 2 + (v - ov) ** 2
        inside = d2 < rad ** 2
        bump = np.sqrt(np.maximum(rad ** 2 - d2, 0.0)) / fx
        obj_z = depth - rng.uniform(0.05, 0.3) - bump
        depth = np.where(inside, obj_z, depth)
        if i == 0:  # first object is "transparent"
            corrupt_mask = np.where(inside, 1.0, corrupt_mask).astype(np.float32)

    depth = depth.astype(np.float32)
    rgb = rng.uniform(0.0, 1.0, size=(h, w, 3)).astype(np.float32)
    rgb = (rgb - np.asarray(constants.IMG_MEAN, np.float32)) / np.asarray(
        constants.IMG_NORM, np.float32)

    depth_corrupt = depth * (1.0 - corrupt_mask)
    xyz = compute_xyz_np(depth, fx, fy, cx, cy)
    xyz_corrupt = compute_xyz_np(depth_corrupt, fx, fy, cx, cy)
    return {
        "rgb": rgb,
        "depth": depth,
        "depth_corrupt": depth_corrupt,
        "xyz": xyz,
        "xyz_corrupt": xyz_corrupt,
        "corrupt_mask": corrupt_mask,
        "valid_mask": (1.0 - corrupt_mask).astype(np.float32),
        "fx": np.float32(fx),
        "fy": np.float32(fy),
        "cx": np.float32(cx),
        "cy": np.float32(cy),
    }


def synthetic_batch(seed: int, batch_size: int, h: int = 240, w: int = 320) -> Dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    samples = [synthetic_sample(rng, h, w) for _ in range(batch_size)]
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}
