"""Dense static-shape voxelization of the camera frustum box.

TPU-native replacement for the reference's dynamic occupied-voxel extraction
(``batch_get_occupied_idx``, src/utils/point_utils.py:12-76): instead of
``torch.unique`` over a variable number of point->voxel records, we keep the
FULL dense grid of ``G³`` cells per image (G = res + 1 after the half-voxel
margin; 9³ = 729 for res 8) and carry a boolean occupancy mask. Every shape is
static; "no occupied voxel" is just an all-False mask.

Grid layout matches the reference: the box [XMIN, XMAX] is padded by half a
voxel on each side (src/models/pipeline.py:167-173), ``part_size =
min(XMAX-XMIN)/res``, and a cell's bounds are ``xmin0 + ijk*part`` ..
``+part``. Linear cell id = (ix*Gy + iy)*Gz + iz.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from implicit_depth_tpu import constants


@dataclasses.dataclass(frozen=True)
class VoxelGrid:
    """Static grid geometry (python-level; safe to close over under jit)."""

    xmin0: Tuple[float, float, float]  # grid origin (after half-voxel margin)
    part_size: float                   # voxel edge length
    dims: Tuple[int, int, int]         # cells per axis (Gx, Gy, Gz)

    @property
    def n_cells(self) -> int:
        gx, gy, gz = self.dims
        return gx * gy * gz

    # -- coordinate transforms (all jax, all static-shape) ------------------
    def cell_of(self, pts: jnp.ndarray) -> jnp.ndarray:
        """(..., 3) points -> (..., 3) int32 cell coords (may be out of bounds)."""
        xmin0 = jnp.asarray(self.xmin0, pts.dtype)
        return jnp.floor((pts - xmin0) / self.part_size).astype(jnp.int32)

    def in_bounds(self, ijk: jnp.ndarray) -> jnp.ndarray:
        """(..., 3) cell coords -> (...,) bool inside the grid."""
        dims = jnp.asarray(self.dims, jnp.int32)
        return jnp.all((ijk >= 0) & (ijk < dims), axis=-1)

    def linear_id(self, ijk: jnp.ndarray) -> jnp.ndarray:
        """(..., 3) cell coords -> (...,) linear id. Caller masks out-of-bounds."""
        gx, gy, gz = self.dims
        return (ijk[..., 0] * gy + ijk[..., 1]) * gz + ijk[..., 2]

    def unlinear(self, lin: jnp.ndarray) -> jnp.ndarray:
        """(...,) linear id -> (..., 3) cell coords."""
        gx, gy, gz = self.dims
        iz = lin % gz
        iy = (lin // gz) % gy
        ix = lin // (gy * gz)
        return jnp.stack([ix, iy, iz], axis=-1)

    def cell_min(self, ijk: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
        """(..., 3) cell coords -> (..., 3) lower corner position."""
        return jnp.asarray(self.xmin0, dtype) + ijk.astype(dtype) * self.part_size

    def cell_center(self, ijk: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
        return self.cell_min(ijk, dtype) + 0.5 * self.part_size


def make_voxel_grid(res: int = 8,
                    xmin=constants.XMIN,
                    xmax=constants.XMAX) -> VoxelGrid:
    """Build the grid the way the reference does (pipeline.py:167-173)."""
    xmin = np.asarray(xmin, np.float64)
    xmax = np.asarray(xmax, np.float64)
    part = float(np.min(xmax - xmin)) / res
    xmin0 = xmin - 0.5 * part
    xmax0 = xmax + 0.5 * part
    dims = tuple(int(d) for d in np.ceil((xmax0 - xmin0) / part - 1e-9))
    return VoxelGrid(xmin0=tuple(float(v) for v in xmin0), part_size=part, dims=dims)


def voxelize_points(grid: VoxelGrid,
                    pts: jnp.ndarray,
                    point_mask: jnp.ndarray):
    """Assign points to dense grid cells.

    Args:
      pts:        (B, N, 3) points in camera space.
      point_mask: (B, N) bool; False entries are ignored entirely.

    Returns dict with:
      cell_id:   (B, N) int32 linear cell id (0 for invalid points).
      valid:     (B, N) bool — point_mask ∧ in-bounds (the reference drops
                 out-of-grid points the same way, point_utils.py:59-62).
      rel_coord: (B, N, 3) point minus its voxel center (pnet 'rel' input).
      occupancy: (B, G³) bool — cell contains ≥1 valid point.
    """
    ijk = grid.cell_of(pts)
    valid = point_mask & grid.in_bounds(ijk)
    lin = jnp.where(valid, grid.linear_id(ijk), 0)
    rel = pts - grid.cell_center(ijk, pts.dtype)

    occ = jnp.zeros((pts.shape[0], grid.n_cells), dtype=bool)
    occ = jax.vmap(lambda o, l, v: o.at[l].max(v))(occ, lin, valid)
    return {"cell_id": lin, "valid": valid, "rel_coord": rel, "occupancy": occ}
