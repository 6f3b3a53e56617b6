from implicit_depth_tpu.ops.ray_grid import ray_grid_intersect, ray_aabb_slab_oracle
from implicit_depth_tpu.ops.roi_align import roi_align
from implicit_depth_tpu.ops.masked import (
    masked_softmax,
    masked_log_softmax,
    masked_argmax,
)
from implicit_depth_tpu.ops.segment import segment_max0

__all__ = [
    "ray_grid_intersect",
    "ray_aabb_slab_oracle",
    "roi_align",
    "masked_softmax",
    "masked_log_softmax",
    "masked_argmax",
    "segment_max0",
]
