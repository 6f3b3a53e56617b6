from implicit_depth_tpu.geometry.camera import compute_xyz, compute_xyz_np
from implicit_depth_tpu.geometry.rays import ray_dir_map
from implicit_depth_tpu.geometry.voxel import VoxelGrid, make_voxel_grid
from implicit_depth_tpu.geometry.normals import image_gradients, surface_normals
from implicit_depth_tpu.geometry.sampling import (
    sample_masked_window,
    sample_valid_stratified,
)

__all__ = [
    "compute_xyz",
    "compute_xyz_np",
    "ray_dir_map",
    "VoxelGrid",
    "make_voxel_grid",
    "image_gradients",
    "surface_normals",
    "sample_masked_window",
    "sample_valid_stratified",
]
