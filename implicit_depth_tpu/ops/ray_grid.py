"""Ray / voxel-grid intersection.

TPU-native replacement for the reference's CUDA ray/AABB slab-test kernel
(src/extensions/ray_aabb/ray_aabb_cuda_kernel.cu:10-89), which tests every
(occupied voxel, ray) pair and emits a dense (V, R) mask + enter/exit
distances. Because our voxels form a regular grid, a ray's intersections are
exactly the grid cells the *line* crosses — found by sorting the ray's
parametric crossings with all axis planes (a branch-free variant of
Amanatides–Woo DDA): O(R · 3G) work instead of O(R · V), fully vectorized.

Semantics parity notes (deliberate):
- The reference kernel tests the infinite LINE (no t ≥ 0 clamp); we keep that
  (cells in the half-voxel margin behind the camera still intersect).
- Intersections come out sorted by t; keeping the first K slots truncates to
  the K *nearest* voxels (the reference keeps all pairs; a ray through a 9³
  grid crosses ≤ 3·9-2 = 25 cells, so K=25 is lossless).
- Degenerate direction components use the same 1/(d + 1e-12) guard.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from implicit_depth_tpu.geometry.voxel import VoxelGrid

# NB: no module-level jnp constants here — creating a jax array at import
# time initializes the default backend, which breaks late platform overrides
# (e.g. dryrun_multichip's CPU-mesh switch under the axon sitecustomize)


def max_cells_crossed(grid: VoxelGrid) -> int:
    """Upper bound on grid cells a single line can cross."""
    return sum(grid.dims) - 2


def ray_grid_intersect(grid: VoxelGrid,
                       ray_dir: jnp.ndarray,
                       occupancy: jnp.ndarray,
                       k_pairs: int,
                       ray_mask: jnp.ndarray | None = None) -> Dict[str, jnp.ndarray]:
    """Intersect rays (origin = camera at 0) with occupied grid cells.

    Args:
      ray_dir:   (B, R, 3) normalized directions.
      occupancy: (B, G³) bool.
      k_pairs:   static pair slots per ray (t-sorted; nearest kept).
      ray_mask:  (B, R) bool, False rays produce no pairs.

    Returns dict:
      cell_id:  (B, R, K) int32 linear cell ids (0 where invalid).
      valid:    (B, R, K) bool.
      t_enter:  (B, R, K) f32 enter distance along the ray.
      t_exit:   (B, R, K) f32 exit distance.
    """
    b, r, _ = ray_dir.shape
    gx, gy, gz = grid.dims
    xmin0 = jnp.asarray(grid.xmin0, jnp.float32)
    part = jnp.float32(grid.part_size)

    inv = 1.0 / (ray_dir + 1e-12)  # same guard as the CUDA kernel (.cu:32)

    # Full-grid AABB line test (slab): t range of the line inside the grid.
    ext = jnp.asarray([gx, gy, gz], jnp.float32) * part
    t_lo = xmin0 * inv                      # (B, R, 3)
    t_hi = (xmin0 + ext) * inv
    t0 = jnp.max(jnp.minimum(t_lo, t_hi), axis=-1)  # (B, R)
    t1 = jnp.min(jnp.maximum(t_lo, t_hi), axis=-1)
    hits_grid = t1 > t0

    # Crossing ts with every axis plane, clipped into [t0, t1] then sorted.
    planes = [xmin0[a] + part * jnp.arange(grid.dims[a] + 1, dtype=jnp.float32)
              for a in range(3)]
    ts = jnp.concatenate(
        [planes[a][None, None, :] * inv[..., a:a + 1] for a in range(3)], axis=-1)
    ts = jnp.clip(ts, t0[..., None], t1[..., None])
    ts = jnp.sort(ts, axis=-1)                       # (B, R, P)

    t_s, t_e = ts[..., :-1], ts[..., 1:]             # segments (B, R, P-1)
    seg_len_ok = t_e > t_s
    mid = 0.5 * (t_s + t_e)
    pt = ray_dir[..., None, :] * mid[..., None]      # (B, R, P-1, 3)
    ijk = grid.cell_of(pt)
    inb = grid.in_bounds(ijk)
    lin = jnp.where(inb, grid.linear_id(ijk), 0)

    # Occupancy lookup WITHOUT a gather: per-element random gathers are the
    # slowest op on TPU (~20 ms for this shape). Factor the cell id as
    # q·F + s, one-hot q on the MXU against the (F, F)-reshaped occupancy,
    # then select s with a second one-hot — two small matmuls, exact 0/1.
    f = int(np.ceil(np.sqrt(grid.n_cells)))
    occ_pad = jnp.pad(occupancy.astype(jnp.float32),
                      ((0, 0), (0, f * f - grid.n_cells))).reshape(b, f, f)
    q, s = lin // f, lin % f
    fr = jnp.arange(f, dtype=jnp.int32)
    oh_q = (q[..., None] == fr).astype(jnp.float32)            # (B, R, P, F)
    rows = jnp.einsum("brpq,bqs->brps", oh_q, occ_pad,
                      preferred_element_type=jnp.float32)
    occ_seg = jnp.sum(rows * (s[..., None] == fr), axis=-1) > 0.5

    good = seg_len_ok & inb & occ_seg & hits_grid[..., None]
    if ray_mask is not None:
        good = good & ray_mask[..., None]

    # Compact the (≤ P-1) hits into K t-ordered slots per ray. Cumsum rank
    # preserves t order (nearest K kept on overflow); the placement is a
    # one-hot contraction over the segment axis — scatters, like gathers,
    # are slow on TPU, and each (ray, k) slot has exactly one source segment
    # so the f32 sum is exact.
    rank = jnp.cumsum(good, axis=-1) - 1                       # (B, R, P-1)
    oh_k = ((rank[..., None] == jnp.arange(k_pairs, dtype=jnp.int32))
            & good[..., None]).astype(jnp.float32)             # (B, R, P, K)
    src = jnp.stack([good.astype(jnp.float32), lin.astype(jnp.float32),
                     t_s, t_e], axis=-1)                       # (B, R, P, 4)
    packed = jnp.einsum("brpc,brpk->brkc", src, oh_k,
                        preferred_element_type=jnp.float32)
    valid = packed[..., 0] > 0.5
    return {
        "cell_id": jnp.where(valid, packed[..., 1].astype(jnp.int32), 0),
        "valid": valid,
        "t_enter": jnp.where(valid, packed[..., 2], 0.0),
        "t_exit": jnp.where(valid, packed[..., 3], 0.0),
    }


def ray_aabb_slab_oracle(ray_dir: np.ndarray, voxel_bound: np.ndarray,
                         ray_bid: np.ndarray, voxel_bid: np.ndarray):
    """Dense (V, R) slab test — numpy port of the CUDA kernel semantics,
    used only as a test oracle for ray_grid_intersect (never in the hot path).
    """
    inv = 1.0 / (ray_dir + 1e-12)                       # (R, 3)
    lo, hi = voxel_bound[:, :3], voxel_bound[:, 3:]     # (V, 3)
    t_a = lo[:, None, :] * inv[None, :, :]
    t_b = hi[:, None, :] * inv[None, :, :]
    tmin = np.max(np.minimum(t_a, t_b), axis=-1)        # (V, R)
    tmax = np.min(np.maximum(t_a, t_b), axis=-1)
    same = voxel_bid[:, None] == ray_bid[None, :]
    mask = (tmin <= tmax) & same
    dist = np.stack([np.where(mask, tmin, 0.0), np.where(mask, tmax, 0.0)], axis=-1)
    return mask.astype(np.int32), dist.astype(np.float32)
