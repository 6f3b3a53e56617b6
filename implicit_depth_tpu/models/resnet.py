"""Dilated ResNet34 with output stride 8 and a 1×1 feature head.

Parity: ``Resnet34_8s`` (src/models/resnet_dilated.py:283-323) over the
stride-adjustable ResNet (src/models/resnet_adjusted.py:112-266): once the
running stride reaches ``output_stride`` (8), later stride-2 stages keep
stride 1 and multiply their dilation instead (layer3 -> dilation 2, layer4 ->
dilation 4; 3×3 convs use "full" padding = dilation). The classifier is
replaced by a 1×1 conv to ``out_ch`` (32) and the map is bilinearly resized
back to the input resolution (align_corners=False ≙ half-pixel centers, the
jax.image.resize default).

SyncBatchNorm parity: under GSPMD (jit + batch sharded over the 'data' mesh
axis) the batch-stat mean/var are computed over the *global* batch
automatically — XLA inserts the cross-replica reductions — so the reference's
``nn.SyncBatchNorm`` (train_lidf.py:117) needs no special handling. For
shard_map-based steps pass ``bn_axis_name``.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

_kaiming = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        conv = lambda k, s, d, name: nn.Conv(
            self.planes, (k, k), strides=(s, s), padding=d if k == 3 else 0,
            kernel_dilation=(d, d) if k == 3 else (1, 1), use_bias=False,
            kernel_init=_kaiming, dtype=self.dtype, name=name)
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            axis_name=self.bn_axis_name, dtype=jnp.float32, name=name)

        residual = x
        y = nn.relu(bn("bn1")(conv(3, self.stride, self.dilation, "conv1")(x)))
        y = bn("bn2")(conv(3, 1, self.dilation, "conv2")(y))
        if self.downsample:
            residual = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, kernel_init=_kaiming, dtype=self.dtype,
                               name="down_conv")(x)
            residual = bn("down_bn")(residual)
        return nn.relu(y + residual)


class ResNet34_8s(nn.Module):
    out_ch: int = 32
    inp_ch: int = 3
    output_stride: int = 8
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x: (B, H, W, inp_ch) -> (B, H, W, out_ch)."""
        in_h, in_w = x.shape[1], x.shape[2]
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    kernel_init=_kaiming, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         axis_name=self.bn_axis_name, dtype=jnp.float32, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        current_stride, dilation = 4, 1
        widths = (64, 128, 256, 512)
        for stage, (blocks, planes) in enumerate(zip(self.stage_sizes, widths)):
            stride = 1 if stage == 0 else 2
            if stride != 1 and current_stride == self.output_stride:
                dilation *= stride
                stride = 1
            else:
                current_stride *= stride
            for i in range(blocks):
                needs_down = i == 0 and (stride != 1 or x.shape[-1] != planes)
                x = BasicBlock(planes, stride if i == 0 else 1, dilation,
                               downsample=needs_down, dtype=self.dtype,
                               bn_axis_name=self.bn_axis_name,
                               name=f"layer{stage + 1}_{i}")(x, train)

        x = nn.Conv(self.out_ch, (1, 1),
                    kernel_init=nn.initializers.normal(0.01), dtype=self.dtype,
                    name="fc")(x)
        # stay in compute dtype through the upsample: every downstream
        # consumer (window ROI pool -> ray_feat -> decode kernel) casts to
        # compute dtype anyway, and the f32 form doubles the HBM traffic of
        # the (B, H, W, C) resize + pooled/packed chain fwd AND bwd
        return jax.image.resize(x, (x.shape[0], in_h, in_w, x.shape[-1]), "bilinear")
