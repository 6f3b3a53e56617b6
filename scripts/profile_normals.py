#!/usr/bin/env python
"""Probe: surface-normal loss branch layout — NHWC (C=3 minor) vs planar NCHW.

The train-step ablation (profile_train_bwd.py) attributes ~7 ms to the
surf-norm branch and ~5 ms to the loss forward.  Every tensor in that branch
is (B, H, W, 3) / (B, HW, 3) — a 3-wide minor dimension on hardware with
128-lane registers.  This probe times, fwd and fwd+bwd:

  a) the shipped path: _compose_window + surface_normals + per-ray gathers
  b) a planar path: compose in rows then ONE transpose to (B, 3, H, W),
     gradients/cross/normalize on (B, H, W) planes, cos as a full-image
     plane product, masked-mean over the in-window mask (no per-ray gather)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_normals.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from implicit_depth_tpu.builder import build_static
from implicit_depth_tpu.config import load_config
from implicit_depth_tpu.data.synthetic import synthetic_batch
from implicit_depth_tpu.geometry.normals import surface_normals
from implicit_depth_tpu.models.lidf import (
    _compose_window,
    compose_pred_image,
    masked_mean,
    prepare_inputs,
)

H, W, BS = 240, 320, 4


def slope(fn, *args, iters_a=3, iters_b=13):
    times = {}
    for iters in (iters_a, iters_b):
        @jax.jit
        def loop(kk, *a, n=iters):
            def body(i, acc):
                return acc + fn(jax.random.fold_in(kk, i), *a)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        assert np.isfinite(float(loop(jax.random.key(2), *args)))
        t0 = time.perf_counter()
        assert np.isfinite(float(loop(jax.random.key(3), *args)))
        times[iters] = time.perf_counter() - t0
    return (times[iters_b] - times[iters_a]) / (iters_b - iters_a)


def surface_normals_planar(pcl, eps=1e-8):
    """pcl: (B, 3, H, W) -> (normal, dx, dy) planar."""
    z1 = jnp.zeros_like(pcl[:, :, :, :1])
    dx = jnp.concatenate([pcl[:, :, :, 1:] - pcl[:, :, :, :-1], z1], axis=3)
    z2 = jnp.zeros_like(pcl[:, :, :1, :])
    dy = jnp.concatenate([pcl[:, :, 1:, :] - pcl[:, :, :-1, :], z2], axis=2)
    n = jnp.stack([
        dx[:, 1] * dy[:, 2] - dx[:, 2] * dy[:, 1],
        dx[:, 2] * dy[:, 0] - dx[:, 0] * dy[:, 2],
        dx[:, 0] * dy[:, 1] - dx[:, 1] * dy[:, 0],
    ], axis=1)
    norm = jnp.sqrt(jnp.sum(n * n, axis=1, keepdims=True) + eps * eps)
    return n / norm, dx, dy


def main():
    cfg = load_config(overrides={
        "mask_type": "all",
        "dataset": {"img_height": H, "img_width": W},
        "tpu": {"compute_dtype": "bfloat16"},
    })
    static = build_static(cfg)
    raw = synthetic_batch(0, BS, H, W)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    inputs = jax.jit(lambda b, kk: prepare_inputs(static, b, kk, train=True))(
        batch, jax.random.key(0))
    r = static.n_rays
    pred0 = inputs["gt_pos"] + 0.01

    # ---- shipped NHWC branch ------------------------------------------------
    def nhwc_branch(pred_pos):
        base = inputs["xyz_flat"]
        pr_img = compose_pred_image(base, pred_pos, inputs, True)
        gt_n, _, _ = surface_normals(base.reshape(BS, H, W, 3))
        pr_n, dx, dy = surface_normals(pr_img.reshape(BS, H, W, 3))
        take = lambda img: jnp.take_along_axis(
            img, inputs["miss_idx"][..., None], axis=1)
        cos = jnp.sum(take(gt_n.reshape(BS, -1, 3))
                      * take(pr_n.reshape(BS, -1, 3)), -1)
        return masked_mean((1.0 - cos) / 2.0, inputs["miss_slot"])

    # ---- planar branch ------------------------------------------------------
    def planar_branch(pred_pos):
        base = inputs["xyz_flat"]
        pr_img = _compose_window(base, pred_pos, inputs["miss_mask_flat"],
                                 inputs["miss_start"], inputs["miss_idx"],
                                 inputs["miss_slot"])
        rank = jnp.cumsum(inputs["miss_mask_flat"].astype(jnp.int32), 1) - 1
        j = rank - inputs["miss_start"][:, None]
        in_win = inputs["miss_mask_flat"] & (j >= 0) & (j < r)
        pl = pr_img.reshape(BS, H, W, 3).transpose(0, 3, 1, 2)
        bl = base.reshape(BS, H, W, 3).transpose(0, 3, 1, 2)
        gt_n, _, _ = surface_normals_planar(bl)
        pr_n, dx, dy = surface_normals_planar(pl)
        cos = jnp.sum(gt_n * pr_n, axis=1).reshape(BS, -1)   # (B, HW)
        dist = (1.0 - cos) / 2.0
        denom = jnp.maximum(jnp.sum(in_win), 1)
        return jnp.sum(jnp.where(in_win, dist, 0.0)) / denom

    # ---- fully-planar compose (per-channel element gathers) ----------------
    def planar_gather_branch(pred_pos):
        base = inputs["xyz_flat"]
        rank = jnp.cumsum(inputs["miss_mask_flat"].astype(jnp.int32), 1) - 1
        j = rank - inputs["miss_start"][:, None]
        in_win = inputs["miss_mask_flat"] & (j >= 0) & (j < r)
        jc = jnp.clip(j, 0, r - 1)
        bl = base.reshape(BS, H, W, 3).transpose(0, 3, 1, 2)
        ch = [jnp.take_along_axis(pred_pos[:, :, c], jc, axis=1)
              for c in range(3)]
        vals = jnp.stack(ch, axis=1).reshape(BS, 3, H, W)
        pl = jnp.where(in_win.reshape(BS, 1, H, W), vals, bl)
        gt_n, _, _ = surface_normals_planar(bl)
        pr_n, dx, dy = surface_normals_planar(pl)
        cos = jnp.sum(gt_n * pr_n, axis=1).reshape(BS, -1)
        dist = (1.0 - cos) / 2.0
        denom = jnp.maximum(jnp.sum(in_win), 1)
        return jnp.sum(jnp.where(in_win, dist, 0.0)) / denom

    # equality check (CPU-independent: run on device, compare)
    a = jax.jit(nhwc_branch)(pred0)
    b = jax.jit(planar_branch)(pred0)
    c = jax.jit(planar_gather_branch)(pred0)
    print("values:", float(a), float(b), float(c), flush=True)

    for name, fn in (("nhwc", nhwc_branch), ("planar", planar_branch),
                     ("planar_gather", planar_gather_branch)):
        fwd = lambda kk, p: fn(p + 0 * jax.random.uniform(kk, ())).astype(jnp.float32)
        gfn = jax.grad(lambda p: fn(p))
        bwd = lambda kk, p: jnp.sum(jnp.abs(
            gfn(p + 0 * jax.random.uniform(kk, ())))).astype(jnp.float32)
        t_f = slope(fwd, pred0)
        t_b = slope(bwd, pred0)
        print(f"{name:14s} fwd {t_f*1e3:7.2f} ms   fwd+bwd {t_b*1e3:7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
