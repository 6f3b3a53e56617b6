#!/usr/bin/env python
"""A/B: host->device feed cost in the real train loop (VERDICT r1 weak #7).

Measures wall-clock per train step — device compute PLUS host feed — for
three feed strategies on the procedural synthetic set at production shapes
(B=4 x 240x320, 20k rays, budget 8):

  perkey : round-1 path — one device_put per batch key (~10 calls/step)
  packed : train/feed.put_batch — 2 payload arrays, xyz derived on device
  feeder : packed + one-deep background prefetch thread (the trainer default)

Device-only step time (slope-timed, BASELINE.md) is ~48 ms; the delta over
that is feed overhead the device pipeline could not hide.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_feed.py
"""

import json
import time

import jax
import jax.numpy as jnp

from implicit_depth_tpu.builder import build_lidf, build_static
from implicit_depth_tpu.config import load_config
from implicit_depth_tpu.data.datasets import get_dataset
from implicit_depth_tpu.data.loader import DataLoader
from implicit_depth_tpu.models.lidf import prepare_inputs
from implicit_depth_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from implicit_depth_tpu.train.feed import DeviceFeeder, put_batch
from implicit_depth_tpu.train.state import TrainState, make_tx
from implicit_depth_tpu.train.steps import make_lidf_train_step

N_STEPS = 24
H, W, BS = 240, 320, 4


def main():
    cfg = load_config(overrides={
        "mask_type": "all",
        "dataset": {"img_height": H, "img_width": W,
                    "synthetic_len": BS * (N_STEPS + 4)},
        "training": {"batch_size": BS, "num_workers": 4},
        "tpu": {"compute_dtype": "bfloat16"},
    })
    n_dev = len(jax.devices())
    mesh = make_mesh((min(BS, n_dev), n_dev // min(BS, n_dev)),
                     ("data", "rays"))
    static = build_static(cfg)
    model = build_lidf(cfg, static)
    ds = get_dataset(cfg.dataset, "train")
    loader = DataLoader(ds, BS, shuffle=True, num_workers=4)

    batch0 = next(iter(loader.epoch(0)))
    batch0 = {k: v for k, v in batch0.items() if k != "item_path"}
    jb = shard_batch({k: jnp.asarray(v) for k, v in batch0.items()}, mesh)
    key = jax.random.key(0)
    inputs = jax.jit(lambda b, k: prepare_inputs(static, b, k, train=True))(jb, key)
    variables = jax.jit(lambda k, i: model.init(
        k, i, train=False, use_gt_label=True))(key, inputs)
    tx = make_tx(cfg.training, 100)
    state0 = replicate(
        TrainState.create(variables["params"], variables["batch_stats"], tx), mesh)
    train_step = make_lidf_train_step(cfg, model, mesh=mesh)

    def run(feed_iter, state):
        n = 0
        losses = None
        t0 = None
        for batch in feed_iter:
            batch.pop("item_path", None)
            state, losses = train_step(state, batch, jax.random.key(n),
                                       jnp.asarray(0))
            n += 1
            if n == 4:  # warm: compile + pipeline fill
                jax.block_until_ready(losses["loss_net"])
                t0 = time.perf_counter()
                n0 = n
            if n >= N_STEPS + 4:
                break
        jax.block_until_ready(losses["loss_net"])
        float(losses["loss_net"])  # relay fence: readback, not just ready-flag
        return (time.perf_counter() - t0) / (n - n0), state

    def perkey():
        for b in loader.epoch(1):
            b = {k: v for k, v in b.items() if k != "item_path"}
            yield shard_batch({k: jnp.asarray(v) for k, v in b.items()}, mesh)

    def packed():
        for b in loader.epoch(1):
            yield put_batch({k: v for k, v in b.items() if k != "item_path"},
                            mesh, axis="data", derive_xyz=True)

    def devonly():
        # no feed at all: the same on-device batch every step — the pure
        # device pipeline rate this loop could reach with a free feed
        b0 = put_batch(dict(batch0), mesh, axis="data", derive_xyz=True)
        for _ in range(N_STEPS + 5):
            yield dict(b0)

    def run_superfeed(state, k=8):
        """Scanned superstep phase: K optimizer steps per device call."""
        from implicit_depth_tpu.train.steps import make_lidf_train_superstep
        superstep = make_lidf_train_superstep(cfg, model, mesh=mesh)
        feeder = DeviceFeeder(loader, mesh, "data", steps_per_call=k)
        n, t0, n0, losses = 0, None, 0, None
        for item in feeder.epoch(1):
            if item[0] == "super":
                _, buf, spec, kk = item
                state, losses = superstep(state, buf, jax.random.key(n),
                                          jnp.asarray(0), spec=spec)
                n += kk
            else:
                b = dict(item[1])
                b.pop("item_path", None)
                state, losses = train_step(state, b, jax.random.key(n),
                                           jnp.asarray(0))
                n += 1
            if t0 is None and n >= k:  # first superbatch done: warm
                jax.block_until_ready(losses["loss_net"])
                t0, n0 = time.perf_counter(), n
        lv = losses["loss_net"]
        float(lv if lv.ndim == 0 else lv[-1])  # relay fence
        return (time.perf_counter() - t0) / (n - n0), state

    import sys
    all_phases = {"devonly": devonly, "perkey": perkey, "packed": packed,
                  "feeder": lambda: DeviceFeeder(loader, mesh, "data").epoch(1)}
    names = sys.argv[1:] or list(all_phases)
    state = state0
    results = {}
    for name in names:
        if name.startswith("super"):  # "super" or "super<K>"
            k = int(name[5:]) if len(name) > 5 else 8
            dt, state = run_superfeed(state, k)
        else:
            dt, state = run(all_phases[name](), state)
        results[name] = dt
        print(json.dumps({"feed": name, "step_ms": round(dt * 1e3, 2),
                          "rays_per_sec": round(BS * static.n_rays / dt, 0)}),
              flush=True)
    if "perkey" in results and "feeder" in results:
        print(json.dumps({"speedup_perkey_to_feeder":
                          round(results["perkey"] / results["feeder"], 2)}))


if __name__ == "__main__":
    main()
