"""Masked row-wise reductions over the static (R, K) pair tensor.

These replace the reference's ragged per-ray segment ops
(``torch_scatter`` scatter_softmax / scatter_log_softmax / scatter_max,
pipeline.py:442-455,482,553-556): our per-ray pair groups are rows, so the
reductions are plain VPU ops with -inf padding.
"""

from __future__ import annotations

import jax.numpy as jnp

_NEG = -1e30


def masked_softmax(logits: jnp.ndarray, mask: jnp.ndarray, axis: int = -1):
    """Softmax with False entries excluded. All-False rows return zeros."""
    z = jnp.where(mask, logits, _NEG)
    z = z - jnp.max(z, axis=axis, keepdims=True)
    e = jnp.where(mask, jnp.exp(z), 0.0)
    denom = jnp.sum(e, axis=axis, keepdims=True)
    return e / jnp.maximum(denom, 1e-30)


def masked_log_softmax(logits: jnp.ndarray, mask: jnp.ndarray, axis: int = -1):
    """Log-softmax over the True entries; False entries return ~-1e30."""
    z = jnp.where(mask, logits, _NEG)
    m = jnp.max(z, axis=axis, keepdims=True)
    e = jnp.where(mask, jnp.exp(z - m), 0.0)
    lse = m + jnp.log(jnp.maximum(jnp.sum(e, axis=axis, keepdims=True), 1e-30))
    return jnp.where(mask, logits - lse, _NEG)


def masked_argmax(values: jnp.ndarray, mask: jnp.ndarray, axis: int = -1):
    """Argmax over True entries. Ties -> first True slot (matches
    torch_scatter's first-hit argmax closely enough for label comparison).

    Returns (argmax_idx, any_valid): for all-False rows idx is 0 and
    any_valid is False — the caller masks, mirroring the reference's
    dummy-row trick (pipeline.py:452-454).
    """
    z = jnp.where(mask, values, -jnp.inf)
    idx = jnp.argmax(z, axis=axis)
    any_valid = jnp.any(mask, axis=axis)
    return jnp.where(any_valid, idx, 0), any_valid


def take_slot(values: jnp.ndarray, idx: jnp.ndarray, axis: int = -1):
    """``take_along_axis(values, idx[..., None], axis)[..., 0]`` for a small
    static slot dimension, as a one-hot masked SUM instead of a gather.

    Per-element gathers of (B, R) scalars from (B, R, K) serialize on TPU
    (~0.9 ms per 80k-element gather measured, BASELINE.md pathology table);
    the one-hot select+reduce over the K lanes is plain VPU work (<0.1 ms).
    Grad flows through the selected element exactly like the gather's.
    """
    k = values.shape[axis]
    iota = jnp.arange(k, dtype=idx.dtype)
    onehot = iota == idx[..., None]  # (..., K)
    if axis != -1 and axis != values.ndim - 1:
        onehot = jnp.moveaxis(onehot, -1, axis)
    zero = jnp.zeros((), values.dtype)
    return jnp.sum(jnp.where(onehot, values, zero), axis=axis)
