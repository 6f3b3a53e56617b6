"""ROIAlign feature pooling.

Replaces ``torchvision.ops.roi_align`` as used by the reference
(src/models/pipeline.py:372-387, 952-967): an 8×8-pixel box around each ray's
pixel, pooled to 2×2 with ``aligned=True``, ``spatial_scale=1.0`` and
adaptive sampling ratio.

Two implementations:

- ``roi_align``: general, torchvision-exact semantics (aligned offset,
  adaptive per-box sampling grid capped at 4, bilinear with the -1/H border
  convention). Static shapes via slot masking. Used by tests and the exact
  path.

- ``roi_window_pool``: the TPU hot path. For an INTERIOR pixel box the
  torchvision sample positions land exactly on integer pixels, so the 2×2
  output bins are plain 4×4 pixel-block means. We therefore mean-pool the
  feature map once (4×4, stride 1 — one separable reduction per image) and
  gather 4 values per ray. Border rays (px<4 or px>W-5, <2% of a frame) get a
  window shifted fully inside instead of torchvision's shrunken box — a
  deliberate, documented divergence that keeps the op gather-only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _bilinear(feat: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """feat: (H, W, C); y, x: (...,) sample coords. torchvision border rule:
    zero outside [-1, H]/[−1, W], clamp into [0, H-1] otherwise."""
    h, w, _ = feat.shape
    outside = (y < -1.0) | (y > h) | (x < -1.0) | (x > w)
    y = jnp.clip(y, 0.0, h - 1)
    x = jnp.clip(x, 0.0, w - 1)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly, lx = y - y0, x - x0
    hy, hx = 1.0 - ly, 1.0 - lx
    g = lambda yy, xx: feat[yy, xx]
    val = (g(y0, x0) * (hy * hx)[..., None] + g(y0, x1) * (hy * lx)[..., None]
           + g(y1, x0) * (ly * hx)[..., None] + g(y1, x1) * (ly * lx)[..., None])
    return jnp.where(outside[..., None], 0.0, val)


def roi_align(feat: jnp.ndarray, boxes: jnp.ndarray, box_batch: jnp.ndarray,
              output_size: int = 2, max_grid: int = 4,
              sampling_ratio: int = -1, aligned: bool = True) -> jnp.ndarray:
    """General ROIAlign.

    Args:
      feat:      (B, H, W, C).
      boxes:     (N, 4) as (x1, y1, x2, y2) in image coords.
      box_batch: (N,) int32 image index per box.

    Returns (N, output_size, output_size, C).
    """
    oh = ow = output_size
    off = 0.5 if aligned else 0.0
    x1, y1, x2, y2 = boxes[:, 0] - off, boxes[:, 1] - off, boxes[:, 2] - off, boxes[:, 3] - off
    roi_w, roi_h = x2 - x1, y2 - y1
    if not aligned:
        roi_w, roi_h = jnp.maximum(roi_w, 1.0), jnp.maximum(roi_h, 1.0)
    bin_w, bin_h = roi_w / ow, roi_h / oh
    if sampling_ratio > 0:
        gw = jnp.full_like(roi_w, sampling_ratio)
        gh = jnp.full_like(roi_h, sampling_ratio)
    else:
        gw = jnp.clip(jnp.ceil(bin_w), 1, max_grid)
        gh = jnp.clip(jnp.ceil(bin_h), 1, max_grid)

    s = jnp.arange(max_grid, dtype=feat.dtype)
    # sample coords: (N, o, S)
    ys = (y1[:, None, None] + jnp.arange(oh, dtype=feat.dtype)[None, :, None] * bin_h[:, None, None]
          + (s[None, None, :] + 0.5) * (bin_h / gh)[:, None, None])
    xs = (x1[:, None, None] + jnp.arange(ow, dtype=feat.dtype)[None, :, None] * bin_w[:, None, None]
          + (s[None, None, :] + 0.5) * (bin_w / gw)[:, None, None])
    ay = s[None, None, :] < gh[:, None, None]
    ax = s[None, None, :] < gw[:, None, None]

    yy = ys[:, :, None, :, None]                                # (N, oh, 1, S, 1)
    xx = xs[:, None, :, None, :]                                # (N, 1, ow, 1, S)
    yy, xx = jnp.broadcast_arrays(yy, xx)
    act = ay[:, :, None, :, None] & ax[:, None, :, None, :]

    vals = jax.vmap(lambda fi, y, x: _bilinear(feat[fi], y, x))(box_batch, yy, xx)
    vals = jnp.where(act[..., None], vals, 0.0)
    count = jnp.maximum(gh * gw, 1.0)[:, None, None, None]
    return jnp.sum(vals, axis=(3, 4)) / count


def roi_window_pool(feat: jnp.ndarray, pix_xy: jnp.ndarray, pix_batch: jnp.ndarray,
                    inp_bbox: int = 8, out_bbox: int = 2) -> jnp.ndarray:
    """Hot-path ROI pooling for pixel-centered boxes (see module docstring).

    Args:
      feat:     (B, H, W, C) feature map.
      pix_xy:   (..., 2) int pixel coords (x, y) per ray.
      pix_batch:(...,) int image index per ray.

    Returns (..., out_bbox, out_bbox, C).
    """
    b, h, w, c = feat.shape
    half = inp_bbox // 2
    win = inp_bbox // out_bbox  # pixels per output bin (4)

    # mean pool over win×win blocks, stride 1, as two banded matmuls
    # (pooled[y, x] = mean feat[y:y+win, x:x+win]): cumsum scans run on the
    # VPU with C lanes (<128) idle-heavy, while a (len, len-win+1) band of
    # 1/win entries contracts on the MXU — measured faster and numerically
    # a direct 16-term mean rather than a difference of long prefix sums
    def band(n):
        m = np.zeros((n, n - win + 1), np.float32)
        for i in range(n - win + 1):
            m[i:i + win, i] = 1.0 / win
        return jnp.asarray(m, feat.dtype)

    row = jnp.einsum("hp,bhwc->bpwc", band(h), feat)   # (B, H-win+1, W, C)
    pooled = jnp.einsum("wq,bpwc->bpqc", band(w), row)  # (B, ph, pw, C)
    ph, pw = pooled.shape[1], pooled.shape[2]

    # Pack the out×out window corners channel-wise so each ray needs ONE
    # gather of a (out²·C)-channel row (full 128 lanes at C=32) instead of
    # out² gathers of C-channel rows — TPU row-gathers cost per row, and
    # narrow rows idle 3/4 of the lanes. The shifts are static slices.
    ph2, pw2 = ph - win * (out_bbox - 1), pw - win * (out_bbox - 1)
    corners = [pooled[:, dy:dy + ph2, dx:dx + pw2]
               for dy in range(0, out_bbox * win, win)
               for dx in range(0, out_bbox * win, win)]
    packed = jnp.concatenate(corners, axis=-1)          # (B, ph2, pw2, out²·C)

    px = jnp.clip(pix_xy[..., 0], half, w - half)                 # shifted-inside window
    py = jnp.clip(pix_xy[..., 1], half, h - half)
    gy = jnp.clip(py - half, 0, ph2 - 1)
    gx = jnp.clip(px - half, 0, pw2 - 1)

    flat = packed.reshape(b * ph2 * pw2, out_bbox * out_bbox * c)
    lin = (pix_batch * ph2 + gy) * pw2 + gx
    return flat[lin].reshape(*pix_xy.shape[:-1], out_bbox, out_bbox, c)
