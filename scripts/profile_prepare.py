"""Break down prepare_inputs cost on the TPU."""

import time

import jax
import jax.numpy as jnp

from implicit_depth_tpu.builder import build_static
from implicit_depth_tpu.config import load_config
from implicit_depth_tpu.data.synthetic import synthetic_batch
from implicit_depth_tpu.geometry.rays import ray_dir_map
from implicit_depth_tpu.geometry.sampling import (
    sample_masked_window,
    sample_valid_stratified,
)
from implicit_depth_tpu.geometry.voxel import voxelize_points
from implicit_depth_tpu.ops.ray_grid import ray_grid_intersect


def timed(name, fn, *args, iters=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:28s} {(time.perf_counter() - t0) / iters * 1e3:8.2f} ms")
    return out


def main():
    h, w, bs = 240, 320, 4
    cfg = load_config(overrides={"dataset": {"img_height": h, "img_width": w}})
    static = build_static(cfg)
    raw = synthetic_batch(0, bs, h, w)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    key = jax.random.key(0)

    vm = batch["valid_mask"] > 0.5
    cm = batch["corrupt_mask"].reshape(bs, -1) > 0.5

    f1 = jax.jit(lambda m, k: sample_valid_stratified(m, static.n_valid, k))
    vidx, vslot, _ = timed("sample_valid_stratified", f1, vm, key)

    vxyz = jnp.take_along_axis(batch["xyz_corrupt"].reshape(bs, -1, 3),
                               vidx[..., None], axis=1)
    f2 = jax.jit(lambda p, m: voxelize_points(static.grid, p, m))
    vox = timed("voxelize_points", f2, vxyz, vslot)

    f3 = jax.jit(lambda m, k: sample_masked_window(m, static.n_rays, k))
    midx, mslot, _ = timed("sample_masked_window", f3, cm, key)

    dirs = ray_dir_map(h, w, batch["fx"], batch["fy"], batch["cx"], batch["cy"])
    mdir = jnp.take_along_axis(dirs.reshape(bs, -1, 3), midx[..., None], axis=1)
    f4 = jax.jit(lambda d, o, m: ray_grid_intersect(
        static.grid, d, o, static.k_pairs, ray_mask=m))
    timed("ray_grid_intersect", f4, mdir, vox["occupancy"], mslot)


if __name__ == "__main__":
    main()
