#!/usr/bin/env python
"""Scatter-max scaling probe on the real TPU (refine-pnet shapes).

Questions (round 3): does XLA's scatter-max cost scale with bytes (dtype,
channels) or with rows? Is a split (40k valid + 80k pred) pair of scatters
cheaper/equal to the joint 120k one?

Run:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_segmax.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from implicit_depth_tpu.ops.segment import segment_max0

NSEG = 4 * 736


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
    print(f"{name:32s} {ms:8.3f} ms", flush=True)


def main():
    key = jax.random.key(0)
    jitter = lambda k, x: x + 0 * jax.random.uniform(k, (1,), x.dtype).astype(x.dtype)

    for n in (40_000, 80_000, 120_000):
        data = jax.random.uniform(key, (n, 64), jnp.float32)
        ids = jax.random.randint(jax.random.key(1), (n,), 0, NSEG, jnp.int32)
        valid = jax.random.uniform(jax.random.key(2), (n,)) > 0.1
        slope(f"scatter f32 {n}x64", lambda k, d, i, v: segment_max0(
            jitter(k, d), i, NSEG, v).sum(), data, ids, valid)

    for ch in (64, 128):
        for dt in (jnp.float32, jnp.bfloat16):
            data = jax.random.uniform(key, (120_000, ch), jnp.float32).astype(dt)
            ids = jax.random.randint(jax.random.key(1), (120_000,), 0, NSEG,
                                     jnp.int32)
            valid = jax.random.uniform(jax.random.key(2), (120_000,)) > 0.1

            def segmax_dt(k, d, i, v):
                dd = jnp.where(v[:, None], jitter(k, d),
                               jnp.asarray(-jnp.inf, d.dtype))
                out = jax.ops.segment_max(dd, i, num_segments=NSEG)
                return jnp.where(jnp.isfinite(out), out,
                                 jnp.zeros((), d.dtype)).astype(jnp.float32).sum()

            slope(f"scatter {dt.__name__} 120kx{ch}", segmax_dt, data, ids, valid)

    # split vs joint on the real shapes (40k + 80k vs 120k)
    d_a = jax.random.uniform(key, (40_000, 64), jnp.float32)
    d_b = jax.random.uniform(key, (80_000, 64), jnp.float32)
    i_a = jax.random.randint(jax.random.key(1), (40_000,), 0, NSEG, jnp.int32)
    i_b = jax.random.randint(jax.random.key(3), (80_000,), 0, NSEG, jnp.int32)
    v_a = jax.random.uniform(jax.random.key(2), (40_000,)) > 0.1
    v_b = jax.random.uniform(jax.random.key(4), (80_000,)) > 0.1

    def joint(k, da, db, ia, ib, va, vb):
        d = jnp.concatenate([jitter(k, da), db], 0)
        return segment_max0(d, jnp.concatenate([ia, ib]), NSEG,
                            jnp.concatenate([va, vb])).sum()

    def split(k, da, db, ia, ib, va, vb):
        a = segment_max0(jitter(k, da), ia, NSEG, va)
        b = segment_max0(db, ib, NSEG, vb)
        return jnp.maximum(a, b).sum()

    slope("joint 120k (concat+scatter)", joint, d_a, d_b, i_a, i_b, v_a, v_b)
    slope("split 40k+80k (2 scatters)", split, d_a, d_b, i_a, i_b, v_a, v_b)


if __name__ == "__main__":
    main()
