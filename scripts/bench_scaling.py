#!/usr/bin/env python
"""Multi-chip scaling efficiency of the SPMD train step (BASELINE.json
north-star: >=80% rays/s scaling from 1 chip to a slice).

For each device count n (powers of two up to what's attached), builds the
(data x rays) mesh the trainer uses, runs the REAL jitted stage-1 train step
(fwd+bwd+Adam, donated state) with the global batch scaled so per-device work
is constant (weak scaling, the production regime: more chips => bigger global
batch at fixed B=1 x 20k rays per data shard), and slope-times it in-graph.

Efficiency(n) = rays_per_sec(n) / (n * rays_per_sec(1)).

On this image only ONE real TPU chip is attached, so a TPU run degenerates to
the n=1 row; run on the 8-device CPU mesh to exercise the harness end-to-end:

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_scaling.py

(CPU rows measure collective/partitioner overhead, not ICI bandwidth — the
numbers are a harness check, not the north-star measurement.)
"""

import json
import os

import jax

# sitecustomize force-sets the axon (remote TPU) platform at interpreter
# start; honor an explicit JAX_PLATFORMS=cpu the way tests/conftest.py does
if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from implicit_depth_tpu.builder import build_lidf, build_static
from implicit_depth_tpu.config import load_config
from implicit_depth_tpu.data.synthetic import synthetic_batch
from implicit_depth_tpu.models.lidf import prepare_inputs
from implicit_depth_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from implicit_depth_tpu.train.state import TrainState, make_tx
from implicit_depth_tpu.train.steps import make_lidf_train_step
from implicit_depth_tpu.utils.profiling import device_slope_time

H, W = 240, 320
PER_DEV_BATCH = 1  # 1 image x 20k rays per data shard


def measure(n_dev: int, cfg) -> float:
    """Seconds per train step on an n_dev-device (data,) mesh."""
    mesh = make_mesh((n_dev, 1), ("data", "rays"), devices=jax.devices()[:n_dev])
    bs = PER_DEV_BATCH * n_dev
    static = build_static(cfg)
    model = build_lidf(cfg, static)
    raw = synthetic_batch(0, bs, H, W)
    batch = shard_batch({k: jnp.asarray(v) for k, v in raw.items()}, mesh)
    key = jax.random.key(0)
    inputs = jax.jit(lambda b, k: prepare_inputs(static, b, k, train=True))(batch, key)
    variables = jax.jit(lambda k, i: model.init(
        k, i, train=False, use_gt_label=True))(key, inputs)
    state = replicate(
        TrainState.create(variables["params"], variables["batch_stats"],
                          make_tx(cfg.training, 100)), mesh)
    train_step = make_lidf_train_step(cfg, model, mesh=mesh)

    # inside the slope-timer's fori_loop the inner jit inlines, so the
    # donate_argnames marker is moot; per-iteration keys block CSE
    def fn(k, s, b):
        _, losses = train_step(s, b, k, jnp.asarray(0))
        return losses["loss_net"]

    return device_slope_time(fn, jax.random.key(1), state, batch,
                             iters_a=1, iters_b=5)


def main():
    n_total = len(jax.devices())
    cfg = load_config(overrides={
        "mask_type": "all",
        "dataset": {"img_height": H, "img_width": W},
        "training": {"batch_size": PER_DEV_BATCH},
        "tpu": {"compute_dtype": "bfloat16"},
    })
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_total]
    base_rps = None
    for n in sizes:
        dt = measure(n, cfg)
        static_rays = 20000  # grid.miss_sample_num default
        rps = PER_DEV_BATCH * n * static_rays / dt
        if base_rps is None:
            base_rps = rps
        row = {
            "devices": n,
            "step_ms": round(dt * 1e3, 2),
            "rays_per_sec": round(rps, 0),
            "scaling_efficiency": round(rps / (base_rps * n), 3),
        }
        if jax.default_backend() == "cpu":
            # virtual devices share the box's physical cores: total FLOPs is
            # constant, so weak-scaling efficiency ~1/n by construction
            row["note"] = "cpu harness check - not an ICI measurement"
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
