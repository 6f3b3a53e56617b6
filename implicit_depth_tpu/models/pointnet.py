"""Two-stage PointNet voxel feature encoder.

Parity: src/models/pointnet.py:7-38. Per-point MLPs with a voxel max-pool
between stages; the reference's ragged ``torch_scatter.scatter(reduce='max')``
becomes a static-segment ``segment_max0`` over the dense B·G³ cell space
(empty voxels get exact zeros, identical to torch_scatter's zero init on the
post-ReLU features).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from implicit_depth_tpu.ops.segment import segment_max0


class PointNet2Stage(nn.Module):
    out_channels: int = 128
    gf_dim: int = 32           # reference pnet_gf is the first layer width
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inp_feat: jnp.ndarray, seg_ids: jnp.ndarray,
                 num_segments: int, valid: jnp.ndarray | None = None) -> jnp.ndarray:
        """inp_feat: (N, C_in); seg_ids: (N,) voxel bucket per point.

        Returns (num_segments, out_channels) voxel features.
        """
        half = self.out_channels // 2
        dense = lambda n: nn.Dense(n, dtype=self.dtype)
        relu = nn.relu

        # scatters run in the compute dtype: post-ReLU values are exactly
        # representable, so max in bf16 == max in f32 on these inputs, and
        # the 128-ch scatter's bytes halve (scripts/probe_segmax.py)
        p1 = relu(dense(self.gf_dim)(inp_feat))
        p2 = relu(dense(half)(p1))
        v1 = segment_max0(p2, seg_ids, num_segments, valid)
        v1 = relu(dense(half)(v1.astype(self.dtype)))

        p3 = jnp.concatenate([v1[seg_ids].astype(self.dtype), p2.astype(self.dtype)], axis=-1)
        p4 = relu(dense(self.out_channels)(p3))
        p5 = relu(dense(self.out_channels)(p4))
        v2 = segment_max0(p5, seg_ids, num_segments, valid)
        v2 = relu(dense(self.out_channels)(v2.astype(self.dtype))).astype(jnp.float32)
        return v2
