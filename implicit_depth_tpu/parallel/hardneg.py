"""Distributed hard-negative mining.

The reference's hard-negative top-k is per-rank local (pipeline.py:475-478,
487-490): each GPU picks its own top ``ratio`` fraction of per-ray losses, so
the mined set depends on the sharding. Here the top-k is GLOBAL across the
data mesh:

- Under GSPMD jit (the default train step), ``hard_neg_mean`` in
  models/lidf.py operates on the logically-global array — XLA partitions the
  top-k itself. Nothing extra to do.
- Under ``shard_map`` (explicit-collective paths, scaling benches),
  ``sharded_hard_neg_mean`` does the classic two-stage reduction: each shard
  takes its local top-k candidates, ``all_gather``s only those (k·world
  values, not the full loss tensor), and reduces the global top-k mean —
  identical result to the single-device computation whenever the global k is
  ≤ every shard's candidate count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from implicit_depth_tpu.models.lidf import hard_neg_mean


def sharded_hard_neg_mean(x_local: jnp.ndarray, mask_local: jnp.ndarray,
                          ratio: float, axis_name: str) -> jnp.ndarray:
    """Global hard-neg mean from inside shard_map.

    Args:
      x_local, mask_local: this shard's per-ray losses / validity.
      ratio: global fraction; k_global = ceil(total_global · ratio).
    """
    n_local = x_local.size
    world = jax.lax.axis_size(axis_name)
    k_global = max(int(n_local * world * ratio), 1)
    k_local = min(k_global, n_local)

    flat = jnp.where(mask_local, x_local, -jnp.inf).reshape(-1)
    cand, _ = jax.lax.top_k(flat, k_local)                      # local candidates
    all_cand = jax.lax.all_gather(cand, axis_name).reshape(-1)  # (world·k_local,)
    top, _ = jax.lax.top_k(all_cand, min(k_global, all_cand.size))
    ok = jnp.isfinite(top)
    return jnp.sum(jnp.where(ok, top, 0.0)) / jnp.maximum(jnp.sum(ok), 1)


__all__ = ["hard_neg_mean", "sharded_hard_neg_mean"]
