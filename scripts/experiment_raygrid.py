"""Compare ray-grid traversal implementation variants on the TPU.

Variants:
  A  current: plane-sweep (sort 30 ts) + cumsum-rank + scatter compaction
  B  plane-sweep + one-hot einsum compaction (scatter-free)
  C  micro: sort of the ts only
  D  micro: occupancy gather + scatter compaction only (no sort)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

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
from implicit_depth_tpu.utils.profiling import device_slope_time


def plane_sweep_parts(grid, ray_dir, occupancy, k_pairs, ray_mask,
                      compaction: str):
    """Re-implementation of ray_grid_intersect with switchable compaction."""
    b, r, _ = ray_dir.shape
    gx, gy, gz = grid.dims
    xmin0 = jnp.asarray(grid.xmin0, jnp.float32)
    part = jnp.float32(grid.part_size)
    inv = 1.0 / (ray_dir + 1e-12)
    ext = jnp.asarray([gx, gy, gz], jnp.float32) * part
    t_lo = xmin0 * inv
    t_hi = (xmin0 + ext) * inv
    t0 = jnp.max(jnp.minimum(t_lo, t_hi), axis=-1)
    t1 = jnp.min(jnp.maximum(t_lo, t_hi), axis=-1)
    hits_grid = t1 > t0
    planes = [xmin0[a] + part * jnp.arange(grid.dims[a] + 1, dtype=jnp.float32)
              for a in range(3)]
    ts = jnp.concatenate(
        [planes[a][None, None, :] * inv[..., a:a + 1] for a in range(3)], axis=-1)
    ts = jnp.clip(ts, t0[..., None], t1[..., None])
    ts = jnp.sort(ts, axis=-1)
    t_s, t_e = ts[..., :-1], ts[..., 1:]
    seg_ok = t_e > t_s
    mid = 0.5 * (t_s + t_e)
    pt = ray_dir[..., None, :] * mid[..., None]
    ijk = grid.cell_of(pt)
    inb = grid.in_bounds(ijk)
    lin = jnp.where(inb, grid.linear_id(ijk), 0)
    occ = jnp.take_along_axis(occupancy[:, None, :], lin.reshape(b, 1, -1),
                              axis=-1).reshape(lin.shape)
    good = seg_ok & inb & occ & hits_grid[..., None] & ray_mask[..., None]

    rank = jnp.cumsum(good, axis=-1) - 1
    if compaction == "scatter":
        rank = jnp.where(good & (rank < k_pairs), rank, k_pairs)
        def compact(src, fill, dtype):
            out = jnp.full((b, r, k_pairs + 1), fill, dtype)
            bi = jnp.arange(b, dtype=jnp.int32)[:, None, None]
            ri = jnp.arange(r, dtype=jnp.int32)[None, :, None]
            return out.at[bi, ri, rank].set(src.astype(dtype))[..., :k_pairs]
    else:  # one-hot einsum
        onehot = (rank[..., None] == jnp.arange(k_pairs)[None, None, None, :])
        onehot = (onehot & good[..., None]).astype(jnp.float32)
        def compact(src, fill, dtype):
            v = jnp.einsum("brp,brpk->brk", src.astype(jnp.float32), onehot)
            return v.astype(dtype)
    valid = compact(good, False, bool) if compaction == "scatter" else (
        compact(good, 0, jnp.float32) > 0.5)
    return {
        "cell_id": compact(lin, 0, jnp.int32) if compaction == "scatter"
        else compact(lin, 0, jnp.float32).astype(jnp.int32),
        "valid": valid,
        "t_enter": compact(t_s, 0.0, jnp.float32),
        "t_exit": compact(t_e, 0.0, jnp.float32),
    }


def main():
    h, w, bs = 240, 320, 4
    cfg = load_config(overrides={"dataset": {"img_height": h, "img_width": w}})
    static = build_static(cfg)
    grid = static.grid
    raw = synthetic_batch(0, bs, h, w)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    key = jax.random.key(0)
    vm = batch["valid_mask"] > 0.5
    cm = batch["corrupt_mask"].reshape(bs, -1) > 0.5
    vidx, vslot, _ = jax.jit(
        lambda m, k: sample_valid_stratified(m, static.n_valid, k))(vm, key)
    vxyz = jnp.take_along_axis(batch["xyz_corrupt"].reshape(bs, -1, 3),
                               vidx[..., None], axis=1)
    occ = jax.jit(lambda p, m: voxelize_points(grid, p, m))(vxyz, vslot)["occupancy"]
    midx, mslot, _ = jax.jit(
        lambda m, k: sample_masked_window(m, static.n_rays, k))(cm, key)
    dirs = ray_dir_map(h, w, batch["fx"], batch["fy"], batch["cx"], batch["cy"])
    mdir = jnp.take_along_axis(dirs.reshape(bs, -1, 3), midx[..., None], axis=1)

    jitter = lambda k: 1.0 + 0.0 * jax.random.uniform(k)

    t = device_slope_time(lambda k: ray_grid_intersect(
        grid, mdir * jitter(k), occ, static.k_pairs,
        ray_mask=mslot)["t_enter"].sum(), key)
    print(f"A current (sort+scatter)   {t * 1e3:8.2f} ms", flush=True)

    t = device_slope_time(lambda k: plane_sweep_parts(
        grid, mdir * jitter(k), occ, static.k_pairs, mslot,
        "einsum")["t_enter"].sum(), key)
    print(f"B sort+einsum compaction   {t * 1e3:8.2f} ms", flush=True)

    # micro: the sort alone
    inv = 1.0 / (mdir + 1e-12)
    planes = [jnp.asarray(grid.xmin0[a], jnp.float32)
              + grid.part_size * jnp.arange(grid.dims[a] + 1, dtype=jnp.float32)
              for a in range(3)]
    def sort_only(k):
        ts = jnp.concatenate(
            [planes[a][None, None, :] * (inv[..., a:a + 1] * jitter(k))
             for a in range(3)], axis=-1)
        return jnp.sort(ts, axis=-1).sum()
    t = device_slope_time(sort_only, key)
    print(f"C sort(30) only            {t * 1e3:8.2f} ms", flush=True)

    # micro: occupancy gather only
    def gather_only(k):
        lin = (jax.random.randint(k, (bs, static.n_rays, 29), 0, grid.n_cells))
        o = jnp.take_along_axis(occ[:, None, :], lin.reshape(bs, 1, -1),
                                axis=-1)
        return o.sum().astype(jnp.float32)
    t = device_slope_time(gather_only, key)
    print(f"D occupancy gather only    {t * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
