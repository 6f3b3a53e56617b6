"""Honest per-component timing on the remote TPU: in-graph fori_loop slope
(iters=2 vs 12), single readback — immune to relay fencing and RTT."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from implicit_depth_tpu.builder import build_lidf, build_static
from implicit_depth_tpu.config import load_config
from implicit_depth_tpu.data.synthetic import synthetic_batch
from implicit_depth_tpu.geometry.rays import ray_dir_map
from implicit_depth_tpu.geometry.sampling import (
    sample_masked_window,
    sample_valid_stratified,
)
from implicit_depth_tpu.geometry.voxel import voxelize_points
from implicit_depth_tpu.models.lidf import prepare_inputs
from implicit_depth_tpu.ops.ray_grid import ray_grid_intersect


def slope(name, make_fn, *args):
    times = {}
    for iters in (2, 12):
        fn = make_fn(iters)
        float(fn(*args))
        t0 = time.perf_counter()
        float(fn(*args))
        times[iters] = time.perf_counter() - t0
    ms = (times[12] - times[2]) / 10 * 1e3
    print(f"{name:26s} {ms:8.2f} ms/iter", flush=True)


def main():
    h, w, bs = 240, 320, 4
    cfg = load_config(overrides={
        "mask_type": "all", "dataset": {"img_height": h, "img_width": w},
        "tpu": {"compute_dtype": "bfloat16"}})
    static = build_static(cfg)
    model = build_lidf(cfg, static)
    raw = synthetic_batch(0, bs, h, w)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    key = jax.random.key(0)
    vm = batch["valid_mask"] > 0.5
    cm = batch["corrupt_mask"].reshape(bs, -1) > 0.5

    def looped(fn_of_key):
        def make(iters):
            @jax.jit
            def run(*args):
                def body(i, acc):
                    return acc + fn_of_key(jax.random.fold_in(key, i), *args)
                return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
            return run
        return make

    slope("sample_valid_stratified", looped(
        lambda k, m: sample_valid_stratified(m, static.n_valid, k)[0].sum().astype(jnp.float32)), vm)

    vidx, vslot, _ = jax.jit(
        lambda m, k: sample_valid_stratified(m, static.n_valid, k))(vm, key)
    vxyz = jnp.take_along_axis(batch["xyz_corrupt"].reshape(bs, -1, 3),
                               vidx[..., None], axis=1)
    slope("voxelize_points", looped(
        lambda k, p, m: voxelize_points(static.grid, p + 0 * jax.random.uniform(k), m)[
            "occupancy"].sum().astype(jnp.float32)), vxyz, vslot)

    slope("sample_masked_window", looped(
        lambda k, m: sample_masked_window(m, static.n_rays, k)[0].sum().astype(jnp.float32)), cm)

    midx, mslot, _, _ = jax.jit(
        lambda m, k: sample_masked_window(m, static.n_rays, k))(cm, key)
    dirs = ray_dir_map(h, w, batch["fx"], batch["fy"], batch["cx"], batch["cy"])
    mdir = jnp.take_along_axis(dirs.reshape(bs, -1, 3), midx[..., None], axis=1)
    occ = jax.jit(lambda p, m: voxelize_points(static.grid, p, m))(
        vxyz, vslot)["occupancy"]
    slope("ray_grid_intersect", looped(
        lambda k, d, o, m: ray_grid_intersect(
            static.grid, d + 0 * jax.random.uniform(k), o, static.k_pairs,
            ray_mask=m)["t_enter"].sum()), mdir, occ, mslot)

    slope("prepare_inputs (all)", looped(
        lambda k, b: prepare_inputs(static, b, k, train=True)["t_enter"].sum()),
        batch)

    inputs = jax.jit(lambda b, kk: prepare_inputs(static, b, kk, train=True))(
        batch, key)
    variables = jax.jit(lambda kk, i: model.init(
        kk, i, train=False, use_gt_label=False))(jax.random.key(1), inputs)
    slope("model fwd (prep cached)", looped(
        lambda k, v, i: jnp.abs(model.apply(
            v, dict(i, miss_dir=i["miss_dir"] + 0 * jax.random.uniform(k)),
            train=False, use_gt_label=False)["pred_pos"]).sum()),
        variables, inputs)


if __name__ == "__main__":
    main()
