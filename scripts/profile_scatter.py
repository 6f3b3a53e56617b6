#!/usr/bin/env python
"""Micro-profile: scatter_into_image vs rank-gather compose on the real TPU.

The loss path writes 20k per-ray values into the (76 800, 3) xyz image twice
(gt + pred), and the surf-norm branch differentiates through one of them —
profile_train_bwd.py measures that whole branch at ~14 ms/step. The miss
indices are a contiguous window of the mask's nonzero list in raster order
(geometry/sampling.py), so the scatter is exactly expressible as elementwise
mask algebra + ONE gather:

  rank(p)  = cumsum(mask)[p] - 1
  j        = rank(p) - start
  img[p]   = values[j]  if mask[p] and 0 <= j < R  else base[p]

Variants timed, fwd and fwd+bwd (grad wrt values):
  scatter           current .at[idx].set(mode=drop, unique)
  scatter_sorted    + indices_are_sorted=True hint
  rank_gather       the compose above
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

B, HW, R = 4, 76_800, 20_000


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
    print(f"{name:22s} {ms:8.3f} ms", flush=True)


def make_inputs():
    key = jax.random.key(0)
    base = jax.random.uniform(key, (B, HW, 3), jnp.float32)
    values = jax.random.uniform(jax.random.key(1), (B, R, 3), jnp.float32)
    # contiguous window over a random mask, raster order (as the sampler does)
    mask = jax.random.uniform(jax.random.key(2), (B, HW)) < 0.6
    cnt = mask.sum(1)
    start = jnp.minimum(jnp.arange(B) * 7, jnp.maximum(cnt - R, 0))
    from implicit_depth_tpu.geometry.sampling import _nonzero_first_order

    # idx[j] = position of the (start+j)-th True; slot = j < cnt - start
    order = jax.vmap(_nonzero_first_order)(mask)
    idx = jax.vmap(lambda o, s: jax.lax.dynamic_slice(o, (s,), (R,)))(
        order, start)
    nslot = jnp.minimum(cnt - start, R)
    slot = jnp.arange(R)[None] < nslot[:, None]
    return base, values, mask, start, idx, slot


def scatter(base, idx, slot, values, sorted_hint=False):
    hw = base.shape[1]
    safe_idx = jnp.where(slot, idx, hw)
    return jax.vmap(lambda img, i, v: img.at[i].set(
        v, mode="drop", unique_indices=True,
        indices_are_sorted=sorted_hint))(base, safe_idx, values)


def rank_gather(base, mask, start, values):
    rank = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1
    j = rank - start[:, None]
    in_win = mask & (j >= 0) & (j < values.shape[1])
    vals = jnp.take_along_axis(values, jnp.clip(j, 0, values.shape[1] - 1)[..., None],
                               axis=1)
    return jnp.where(in_win[..., None], vals, base)


def main():
    base, values, mask, start, idx, slot = make_inputs()

    # equality
    a = scatter(base, idx, slot, values)
    c = rank_gather(base, mask, start, values)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=0)
    print("rank_gather ≡ scatter: OK", flush=True)

    jit1 = lambda k, v: v + 0 * jax.random.uniform(k, (1,), v.dtype)

    slope("scatter fwd", lambda k, b_, i, s, v: scatter(
        b_, i, s, jit1(k, v)).sum(), base, idx, slot, values)
    slope("scatter_sorted fwd", lambda k, b_, i, s, v: scatter(
        b_, i, s, jit1(k, v), True).sum(), base, idx, slot, values)
    slope("rank_gather fwd", lambda k, b_, m, st, v: rank_gather(
        b_, m, st, jit1(k, v)).sum(), base, mask, start, values)

    # (out**2).sum() keeps the forward alive in the grad graph — grad of a
    # plain .sum() lets XLA drop the scatter/gather entirely (measured ~0)
    slope("scatter fwd+bwd", lambda k, b_, i, s, v: jax.grad(
        lambda vv: (scatter(b_, i, s, vv) ** 2).sum())(jit1(k, v)).sum(),
        base, idx, slot, values)
    slope("scatter_sorted f+b", lambda k, b_, i, s, v: jax.grad(
        lambda vv: (scatter(b_, i, s, vv, True) ** 2).sum())(jit1(k, v)).sum(),
        base, idx, slot, values)
    slope("rank_gather fwd+bwd", lambda k, b_, m, st, v: jax.grad(
        lambda vv: (rank_gather(b_, m, st, vv) ** 2).sum())(jit1(k, v)).sum(),
        base, mask, start, values)

    # the ROI-pool backward shape: (B·R, 128) rows scatter-added into the
    # (B·ph2·pw2, 128) pooled map (ops/roi_align.py roi_window_pool vjp)
    n_tgt = 4 * 233 * 313
    lin = jnp.asarray(
        np.sort(np.random.default_rng(3).integers(0, n_tgt, B * R)),
        jnp.int32)
    d_rows = jax.random.uniform(jax.random.key(5), (B * R, 128), jnp.float32)

    def roi_bwd_scatter(k, d):
        tgt = jnp.zeros((n_tgt, 128), jnp.float32)
        return tgt.at[lin].add(jit1(k, d)).sum()

    slope("roi bwd scatter 128ch", roi_bwd_scatter, d_rows)


if __name__ == "__main__":
    main()
