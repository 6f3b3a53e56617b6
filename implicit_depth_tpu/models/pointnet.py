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
    # VMEM-table Pallas segmented max (ops/pallas_segment.py) instead of the
    # XLA scatter — forward-only (no VJP): serving/eval paths only; see the
    # round-5 A/B in BASELINE.md before enabling
    use_pallas_segmax: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        # explicit names reproduce the original nn.compact auto-naming
        # (Dense_0..Dense_5 in call order) — checkpoints/importer rely on it
        half = self.out_channels // 2
        dense = lambda i, n: nn.Dense(n, dtype=self.dtype, name=f"Dense_{i}")
        self.l0 = dense(0, self.gf_dim)
        self.l1 = dense(1, half)
        self.v1_mlp = dense(2, half)
        self.l3 = dense(3, self.out_channels)
        self.l4 = dense(4, self.out_channels)
        self.v2_mlp = dense(5, self.out_channels)

    def _stage1(self, inp_feat):
        relu = nn.relu
        return relu(self.l1(relu(self.l0(inp_feat))))

    def _stage2(self, p2, v1_rows):
        relu = nn.relu
        p3 = jnp.concatenate([v1_rows.astype(self.dtype),
                              p2.astype(self.dtype)], axis=-1)
        return relu(self.l4(relu(self.l3(p3))))

    def __call__(self, inp_feat: jnp.ndarray, seg_ids: jnp.ndarray,
                 num_segments: int, valid: jnp.ndarray | None = None) -> jnp.ndarray:
        """inp_feat: (N, C_in); seg_ids: (N,) voxel bucket per point.

        Returns (num_segments, out_channels) voxel features.
        """
        return self.call_split([(inp_feat, seg_ids, valid)], num_segments)

    def call_split(self, parts, num_segments: int) -> jnp.ndarray:
        """Same math as ``__call__`` over the row-concatenation of ``parts``
        (a list of (inp_feat, seg_ids, valid) tuples), but each part keeps
        its own per-point MLPs and scatters, combined with an elementwise
        max (exact: max is associative and torch_scatter's zero-init
        semantics make the empty-segment 0 a neutral element for the
        post-ReLU inputs). Why: the refine trainer calls PointNet once per
        refinement iteration on [valid points | injected predictions] — the
        valid part's stage-1 work is iteration-invariant, and splitting the
        streams lets XLA CSE it across iterations instead of recomputing it
        inside a mixed concat (models/refine.py).

        Scatters run in the compute dtype: post-ReLU values are exactly
        representable, so max in bf16 == max in f32 on these inputs and the
        128-ch scatter's bytes halve (scripts/probe_segmax.py).
        """
        relu = nn.relu
        if self.use_pallas_segmax and not self.is_initializing():
            from implicit_depth_tpu.ops.pallas_segment import pallas_segment_max0
            segmax = pallas_segment_max0  # post-ReLU data >= 0: exact
        else:
            segmax = segment_max0
        p2s = [self._stage1(inp) for inp, _, _ in parts]
        v1 = None
        for p2, (_, seg, valid) in zip(p2s, parts):
            m = segmax(p2, seg, num_segments, valid)
            v1 = m if v1 is None else jnp.maximum(v1, m)
        v1 = relu(self.v1_mlp(v1.astype(self.dtype)))

        v2 = None
        for p2, (_, seg, valid) in zip(p2s, parts):
            p5 = self._stage2(p2, v1[seg])
            m = segmax(p5, seg, num_segments, valid)
            v2 = m if v2 is None else jnp.maximum(v2, m)
        v2 = relu(self.v2_mlp(v2.astype(self.dtype))).astype(jnp.float32)
        return v2
