#!/usr/bin/env python
"""Capture + analyze a device-op trace of the stage-1 forward or train step.

jax.profiler WORKS through the remote-TPU relay (discovered late round 2):
the trace contains real per-HLO device durations with source attribution —
use this instead of stop_gradient-ablation guesswork.

Run:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_trace.py [fwd|train]

Prints ms/step, per-op top list, per-source and per-category aggregates.
"""

import collections
import glob
import gzip
import json
import os
import sys

import jax
import jax.numpy as jnp

from implicit_depth_tpu.builder import build_lidf, build_static
from implicit_depth_tpu.config import load_config
from implicit_depth_tpu.data.synthetic import synthetic_batch
from implicit_depth_tpu.models.lidf import prepare_inputs

H, W, BS = 240, 320, 4
ITERS = 3


def analyze(trace_dir):
    f = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(f) as fh:
        tr = json.load(fh)
    dev_pids = {e.get("pid") for e in tr["traceEvents"]
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    ev = [e for e in tr["traceEvents"]
          if e.get("ph") == "X" and e.get("pid") in dev_pids]
    # module-level events are named by bare program ids (digits) or jit_*
    ops = [e for e in ev
           if not e["name"].startswith("jit_") and not e["name"].isdigit()]
    outer = sum(e["dur"] for e in ev if e["name"].isdigit()) or sum(
        e["dur"] for e in ev if e["name"].startswith("jit_"))
    print(f"device: {outer / ITERS / 1e3:.2f} ms/iter, "
          f"{len(ops) // ITERS} ops/iter")
    agg = collections.Counter()
    srcs = {}
    cat = collections.Counter()
    ncat = collections.Counter()
    bysrc = collections.Counter()
    for e in ops:
        a = e.get("args", {})
        agg[e["name"]] += e["dur"]
        srcs[e["name"]] = a.get("source") or "?"
        c = a.get("hlo_category", "?")
        cat[c] += e["dur"]
        ncat[c] += 1
        bysrc[a.get("source") or "?"] += e["dur"]
    print("\n-- top ops (ms/iter) --")
    for n, d in agg.most_common(25):
        print(f"{d / ITERS / 1e3:7.2f}  {n[:44]:44s} {srcs[n][-48:]}")
    print("\n-- by source --")
    for s, d in bysrc.most_common(20):
        print(f"{d / ITERS / 1e3:7.2f}  {s[-70:]}")
    print("\n-- by category --")
    for c, d in cat.most_common(12):
        print(f"{d / ITERS / 1e3:7.2f}  x{ncat[c] // ITERS:5d}  {c}")
    # top ops inside the glue categories, with shapes — these are the
    # layout/copy costs the source-level view hides
    glue = {"data formatting", "copy-done", "loop fusion", "?"}
    gagg = collections.Counter()
    ginfo = {}
    for e in ops:
        a = e.get("args", {})
        if a.get("hlo_category", "?") not in glue:
            continue
        gagg[e["name"]] += e["dur"]
        ginfo[e["name"]] = (a.get("hlo_category", "?"),
                            (a.get("shape") or a.get("long_name") or "")[:60],
                            (a.get("source") or "?")[-40:])
    print("\n-- top glue ops (ms/iter) --")
    for n, d in gagg.most_common(20):
        c, sh, s = ginfo[n]
        print(f"{d / ITERS / 1e3:7.2f}  {n[:28]:28s} {c[:14]:14s} {sh} {s}")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "train"
    out = f"/tmp/idt_trace_{mode}"
    os.system(f"rm -rf {out}")
    cfg = load_config(overrides={
        "mask_type": "all",
        "dataset": {"img_height": H, "img_width": W},
        "tpu": {"compute_dtype": "bfloat16"}})
    static = build_static(cfg)
    model = build_lidf(cfg, static)
    raw = synthetic_batch(0, BS, H, W)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    prep = jax.jit(lambda b, kk: prepare_inputs(static, b, kk, train=True))
    inputs = prep(batch, jax.random.key(0))
    variables = jax.jit(lambda kk, i: model.init(
        kk, i, train=False, use_gt_label=False))(jax.random.key(1), inputs)

    if mode == "fwd":
        fn = jax.jit(lambda v, i: model.apply(
            v, i, train=False, use_gt_label=False)["pred_pos"])
        r = fn(variables, inputs)
        r.block_until_ready()
        with jax.profiler.trace(out):
            for _ in range(ITERS):
                r = fn(variables, inputs)
            r.block_until_ready()
    elif mode == "refine":
        # stage-2 only: forward_times refine iterations on a fixed lidf_out
        from implicit_depth_tpu.builder import build_refine
        refine = build_refine(cfg, static)
        lidf_out = jax.jit(lambda v, i: model.apply(
            v, i, train=False, use_gt_label=False))(variables, inputs)
        rvars = jax.jit(lambda kk, i, o: refine.init(
            kk, i, o, o["pred_pos"]))(jax.random.key(4), inputs, lidf_out)
        fwd_times = int(cfg.refine.forward_times)

        @jax.jit
        def fn(rv, i, o):
            pred = o["pred_pos"]
            for _ in range(fwd_times):
                pred = refine.apply(rv, i, o, pred)
            return pred

        r = fn(rvars, inputs, lidf_out)
        r.block_until_ready()
        with jax.profiler.trace(out):
            for _ in range(ITERS):
                r = fn(rvars, inputs, lidf_out)
            r.block_until_ready()
    else:
        from implicit_depth_tpu.parallel.mesh import make_mesh, replicate
        from implicit_depth_tpu.train.state import TrainState, make_tx
        from implicit_depth_tpu.train.steps import _lidf_train_core
        mesh = make_mesh((1, 1), ("data", "rays"), devices=jax.devices()[:1])
        core = jax.jit(_lidf_train_core(cfg, model, mesh), donate_argnums=0)
        state = replicate(TrainState.create(
            variables["params"], variables["batch_stats"],
            make_tx(cfg.training, 100)), mesh)
        state, losses = core(state, batch, jax.random.key(5), jnp.asarray(0))
        jax.block_until_ready(losses["loss_net"])
        with jax.profiler.trace(out):
            for i in range(ITERS):
                state, losses = core(
                    state, batch, jax.random.fold_in(jax.random.key(6), i),
                    jnp.asarray(0))
            jax.block_until_ready(losses["loss_net"])
    analyze(out)


if __name__ == "__main__":
    main()
