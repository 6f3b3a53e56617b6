#!/usr/bin/env python
"""Micro-profile of the PointNet voxel-pool path on the real TPU.

The refine PointNet re-encode (120k points -> 2916 cells, twice per
two-stage forward) measures 3.44 ms (scripts/profile_refine.py) while its
MLP FLOPs are ~0.05 ms of MXU work — the cost is the two scatter-max
segment reductions and the broadcast-back gather. This times each piece
and the candidate replacements:

  seg_max scatter   jax.ops.segment_max (XLA scatter-max) — current impl
  seg_max sortscan  argsort by cell + segmented associative cummax + gather
  seg_max onehotKmax K-slot one-hot trick (exact when counts fit a budget)
  bcast gather      v1[seg_ids] row gather — current impl
  bcast onehot      one-hot MXU matmul (rows, n_seg) @ (n_seg, C)

Run:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_pnet.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from implicit_depth_tpu.ops.segment import segment_max0

N = 120_000          # valid (40k) + injected pred (80k) points, B=4
NSEG = 4 * 729       # B * G^3


def slope(name, fn, *args, iters_a=2, iters_b=12):
    times = {}
    for iters in (iters_a, iters_b):
        @jax.jit
        def loop(kk, *a, n=iters):
            def body(i, acc):
                return acc + fn(jax.random.fold_in(kk, i), *a)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        assert np.isfinite(float(loop(jax.random.key(2), *args)))
        t0 = time.perf_counter()
        assert np.isfinite(float(loop(jax.random.key(3), *args)))
        times[iters] = time.perf_counter() - t0
    ms = (times[iters_b] - times[iters_a]) / (iters_b - iters_a) * 1e3
    print(f"{name:24s} {ms:8.3f} ms", flush=True)


def sortscan_segment_max0(data, seg_ids, num_segments, valid=None):
    """Sort rows by segment id, segmented running max (associative scan),
    gather each segment's last row. Exact ≡ segment_max0."""
    n = data.shape[0]
    if valid is not None:
        data = jnp.where(valid[:, None], data, -jnp.inf)
        seg_ids = jnp.where(valid, seg_ids, num_segments - 1)
    order = jnp.argsort(seg_ids)
    ids_s = seg_ids[order]
    rows = data[order]

    def op(a, b):
        ida, va = a
        idb, vb = b
        same = (ida == idb)[..., None]
        return idb, jnp.where(same, jnp.maximum(va, vb), vb)

    _, run = jax.lax.associative_scan(op, (ids_s, rows))
    # segment end position: last index with id <= s
    ends = jnp.searchsorted(ids_s, jnp.arange(num_segments, dtype=ids_s.dtype),
                            side="right") - 1
    counts = jnp.bincount(ids_s, length=num_segments)
    out = run[jnp.clip(ends, 0, n - 1)]
    out = jnp.where((counts > 0)[:, None], out, 0.0)
    return jnp.where(jnp.isfinite(out), out, 0.0)


def main():
    key = jax.random.key(0)
    data64 = jax.random.uniform(key, (N, 64), jnp.float32)
    data128 = jax.random.uniform(key, (N, 128), jnp.float32)
    ids = jax.random.randint(jax.random.key(1), (N,), 0, NSEG, jnp.int32)
    valid = jax.random.uniform(jax.random.key(2), (N,)) > 0.1
    table = jax.random.uniform(jax.random.key(3), (NSEG, 64), jnp.float32)

    jitter = lambda k, x: x + 0 * jax.random.uniform(k, (1,), x.dtype)

    slope("seg_max scatter 64", lambda k, d, i, v: segment_max0(
        jitter(k, d), i, NSEG, v).sum(), data64, ids, valid)
    slope("seg_max scatter 128", lambda k, d, i, v: segment_max0(
        jitter(k, d), i, NSEG, v).sum(), data128, ids, valid)
    slope("seg_max sortscan 64", lambda k, d, i, v: sortscan_segment_max0(
        jitter(k, d), i, NSEG, v).sum(), data64, ids, valid)
    slope("seg_max sortscan 128", lambda k, d, i, v: sortscan_segment_max0(
        jitter(k, d), i, NSEG, v).sum(), data128, ids, valid)
    slope("bcast gather", lambda k, t, i: jitter(k, t)[i].sum(), table, ids)

    def bcast_onehot(k, t, i):
        t = jitter(k, t).astype(jnp.bfloat16)
        cols = jax.lax.broadcasted_iota(jnp.int32, (N, NSEG), 1)
        oh = (i[:, None] == cols).astype(jnp.bfloat16)
        return jax.lax.dot_general(oh, t, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32).sum()

    slope("bcast onehot", bcast_onehot, table, ids)

    # equality check for the sortscan variant
    a = segment_max0(data64, ids, NSEG, valid)
    b = sortscan_segment_max0(data64, ids, NSEG, valid)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    print("sortscan ≡ scatter: OK")


if __name__ == "__main__":
    main()
