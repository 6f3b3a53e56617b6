#!/usr/bin/env python
"""ResNet34-8s fwd vs bwd cost on the real TPU (stage-1 backbone).

The train-step decomposition (profile_train_bwd.py) attributes ~10.5 ms to
the feat-map gradient path; the ROI-pool backward scatter is only 1.2 ms
(profile_scatter.py), so the dilated-ResNet backward is the remainder.
Dilated convolutions lower to space-to-batch on TPU and their filter/input
gradients can be far more expensive than the forward — measure the split,
plus a remat variant and the BN train/eval difference.

Run:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_resnet.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from implicit_depth_tpu.models.resnet import ResNet34_8s

H, W, BS = 240, 320, 4


def slope(name, fn, *args, iters_a=2, iters_b=10):
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
    print(f"{name:28s} {ms:8.2f} ms", flush=True)


def main():
    model = ResNet34_8s(out_ch=32, dtype=jnp.bfloat16)
    rgb = jax.random.normal(jax.random.key(0), (BS, H, W, 3), jnp.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, False))(
        jax.random.key(1), rgb)
    params, bstats = variables["params"], variables["batch_stats"]

    jit1 = lambda k, x: x * (1 + 0 * jax.random.uniform(k, (1,), x.dtype))

    slope("fwd eval-BN", lambda k, p, b, x: jnp.abs(model.apply(
        {"params": p, "batch_stats": b}, jit1(k, x), False)).sum()
        .astype(jnp.float32), params, bstats, rgb)

    def fwd_train(k, p, b, x):
        out, _ = model.apply({"params": p, "batch_stats": b}, jit1(k, x),
                             True, mutable=["batch_stats"])
        return jnp.abs(out).sum().astype(jnp.float32)

    slope("fwd train-BN", fwd_train, params, bstats, rgb)

    def fwd_bwd(k, p, b, x):
        def loss(pp):
            out, _ = model.apply({"params": pp, "batch_stats": b},
                                 jit1(k, x), True, mutable=["batch_stats"])
            return jnp.abs(out).sum().astype(jnp.float32)
        g = jax.grad(loss)(p)
        return jax.tree_util.tree_reduce(
            lambda a, y: a + jnp.abs(y).sum().astype(jnp.float32), g,
            jnp.float32(0))

    slope("fwd+bwd train-BN", fwd_bwd, params, bstats, rgb)

    def fwd_bwd_remat(k, p, b, x):
        rmodel = ResNet34_8s(out_ch=32, dtype=jnp.bfloat16)

        def loss(pp):
            apply = jax.checkpoint(
                lambda pp_, xx: rmodel.apply(
                    {"params": pp_, "batch_stats": b}, xx, True,
                    mutable=["batch_stats"])[0])
            return jnp.abs(apply(pp, jit1(k, x))).sum().astype(jnp.float32)

        g = jax.grad(loss)(p)
        return jax.tree_util.tree_reduce(
            lambda a, y: a + jnp.abs(y).sum().astype(jnp.float32), g,
            jnp.float32(0))

    slope("fwd+bwd remat", fwd_bwd_remat, params, bstats, rgb)


if __name__ == "__main__":
    main()
