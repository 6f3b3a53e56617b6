"""Static-shape point/ray samplers.

TPU replacements for the reference's per-image Python loops:

- ``sample_valid_stratified`` ≙ ``point_utils.sample_valid_points`` (:79-125):
  exactly ``n`` valid pixels per image, stratified over the valid set in 8×8
  pixel block-scan order, resampling with repetition when fewer exist.
- ``sample_masked_window`` ≙ miss-ray sampling (pipeline.py:226-254): when an
  image has more mask pixels than the budget, take a random *contiguous
  window* of the nonzero list (keeps rays spatially coherent); otherwise keep
  them all, padding the remaining slots (slot mask False).

Both return fixed-size index tensors + slot-validity masks; degenerate images
(zero mask pixels) simply yield all-False masks — no control flow, which is
what lets the SPMD train step skip the reference's DDP consensus barriers
(pipeline.py:662-701).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _block_order_perm(h: int, w: int, block_y: int, block_x: int) -> np.ndarray:
    """perm[k] = flat image index of the k-th pixel in block-scan order.

    Block-scan order: blocks row-major over the (h//by, w//bx) block grid,
    pixels row-major inside each block — matching the reshape/permute trick in
    the reference (point_utils.py:84-85,120-121).
    """
    ids = np.arange(h * w).reshape(h, w)
    ids = ids.reshape(h // block_y, block_y, w // block_x, block_x)
    ids = ids.transpose(0, 2, 1, 3)  # (nby, nbx, by, bx)
    return ids.reshape(-1)


def _nonzero_first_order(mask_flat: jnp.ndarray) -> jnp.ndarray:
    """order[j] = index of the j-th True entry (index order); entries past
    the True count are 0 (callers mask them).

    Built with cumsum-rank + scatter instead of argsort: O(M) VPU work
    versus a bitonic sort's O(M log² M) — this runs per image per step on
    76 800-pixel masks, so the difference is milliseconds on TPU.
    """
    m = mask_flat.shape[0]
    idx = jnp.arange(m, dtype=jnp.int32)
    rank = jnp.cumsum(mask_flat.astype(jnp.int32)) - 1
    rank = jnp.where(mask_flat, rank, m)  # False entries dropped
    return jnp.zeros(m, jnp.int32).at[rank].set(
        idx, mode="drop", unique_indices=True, indices_are_sorted=True)


def sample_masked_window(mask_flat: jnp.ndarray, n_sample: int, key: jax.Array,
                         rank: jnp.ndarray | None = None):
    """Sample ≤ n_sample indices per image from a boolean mask.

    Args:
      mask_flat: (B, M) bool.
      n_sample:  static slot count.
      key:       PRNG key.
      rank:      optional precomputed ``cumsum(mask_flat, 1) - 1`` (B, M)
                 int32 — callers that also need the rank downstream (the
                 scatter-free loss-image writes) pass it in so the 307k-pixel
                 scan runs once per step, not three times (profiled at
                 ~1.4 ms per scan on TPU).

    Returns:
      idx:   (B, n_sample) int32 flat indices (garbage where slot invalid).
      slot:  (B, n_sample) bool slot validity.
      cnt:   (B,) int32 number of mask pixels.
      start: (B,) int32 window start — slot j holds the (start+j)-th True
             entry of ``mask_flat`` in index order, so ``idx`` is strictly
             increasing over the valid slots. Downstream image writes exploit
             this: pixel p maps to slot ``rank(p) - start`` with
             ``rank = cumsum(mask) - 1`` (see models/lidf.py
             ``compose_pred_image`` — scatter-free, gather-only).
    """
    b, m = mask_flat.shape
    keys = jax.random.split(key, b)
    if rank is None:
        rank = jnp.cumsum(mask_flat.astype(jnp.int32), axis=1) - 1

    def one(mask, k, rank_row):
        r = jnp.where(mask, rank_row, m)  # False entries dropped
        order = jnp.zeros(m, jnp.int32).at[r].set(
            jnp.arange(m, dtype=jnp.int32), mode="drop",
            unique_indices=True, indices_are_sorted=True)
        cnt = jnp.sum(mask).astype(jnp.int32)
        max_start = jnp.maximum(cnt - n_sample, 0)
        start = jax.random.randint(k, (), 0, max_start + 1)
        idx = jax.lax.dynamic_slice(order, (start,), (n_sample,))
        slot = (start + jnp.arange(n_sample, dtype=jnp.int32)) < cnt
        return idx, slot, cnt, start

    return jax.vmap(one)(mask_flat, keys, rank)


def sample_valid_stratified(valid_mask: jnp.ndarray, n_sample: int, key: jax.Array,
                            block_y: int = 8, block_x: int = 8):
    """Sample exactly n_sample valid pixels per image, stratified.

    Args:
      valid_mask: (B, H, W) bool.

    Returns:
      idx:  (B, n_sample) int32 flat (h*w) indices.
      slot: (B, n_sample) bool — all True unless the image has zero valid
            pixels (then all False; reference would crash on that input).
      cnt:  (B,) int32 valid-pixel counts.
    """
    b, h, w = valid_mask.shape
    perm = jnp.asarray(_block_order_perm(h, w, block_y, block_x))
    keys = jax.random.split(key, b)

    def one(mask, k):
        mask_block = mask.reshape(-1)[perm]                     # block-scan order
        order = _nonzero_first_order(mask_block)                # positions in block order
        cnt = jnp.sum(mask_block).astype(jnp.int32)
        cnt_safe = jnp.maximum(cnt, 1)

        i = jnp.arange(n_sample, dtype=jnp.int32)
        # Plenty of points: stratified ranks with random jitter inside each
        # stride (≙ reference's sample_offset, point_utils.py:108-111).
        stride = jnp.maximum(cnt_safe // n_sample, 1)
        jitter = jax.random.randint(k, (n_sample,), 0, stride)
        rank_many = jnp.minimum((i * cnt_safe) // n_sample + jitter, cnt_safe - 1)
        # Too few: cycle through all of them (each point used ≥ once,
        # ≙ reference's resample-with-repeat, point_utils.py:99-106).
        rank_few = i % cnt_safe
        rank = jnp.where(cnt >= n_sample, rank_many, rank_few)

        block_pos = order[rank]
        idx = perm[block_pos]
        slot = jnp.broadcast_to(cnt > 0, (n_sample,))
        return idx.astype(jnp.int32), slot, cnt

    return jax.vmap(one)(valid_mask, keys)
