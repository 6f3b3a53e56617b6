"""Segment reductions with a static segment count.

Replaces ``torch_scatter.scatter(..., reduce='max')`` as used by the PointNet
voxel max-pool (src/models/pointnet.py:27,35). torch_scatter initializes the
output with zeros, so empty segments read 0 and (post-ReLU) occupied segments
match a plain max — ``segment_max0`` reproduces exactly that: max over valid
entries, 0 for empty segments.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_max0(data: jnp.ndarray,
                 segment_ids: jnp.ndarray,
                 num_segments: int,
                 valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Max-pool rows of ``data`` into ``num_segments`` buckets.

    Args:
      data:        (N, C).
      segment_ids: (N,) int32 in [0, num_segments).
      valid:       (N,) bool; False rows are excluded.

    Returns (num_segments, C); empty segments are exactly 0.
    """
    if valid is not None:
        # fill in data.dtype: a python -inf promotes bf16 data to f32 and
        # doubles the scatter's bytes — the 128-ch scatter-max measured 2x
        # slower in f32 (scripts/probe_segmax.py; 64-ch is row-overhead-bound
        # either way). Post-ReLU inputs are exactly representable, so the
        # reduced-precision scatter is bit-identical.
        data = jnp.where(valid[:, None], data, jnp.asarray(-jnp.inf, data.dtype))
        segment_ids = jnp.where(valid, segment_ids, 0)
    out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    return jnp.where(jnp.isfinite(out), out, jnp.zeros((), data.dtype))
