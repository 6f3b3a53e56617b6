#!/usr/bin/env python
"""Interleaved A/B of the stage-2 refine decode: fused IEF kernel vs XLA.

Both RefineModel variants share the same params and run in one process with
interleaved phases (A B A B) — the first-measured-phase inflation and
cross-process drift of sequential runs don't contaminate the comparison
(CLAUDE.md benching discipline).

Run:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_refine_ab.py
"""

import dataclasses

import jax
import jax.numpy as jnp

from implicit_depth_tpu.builder import build_lidf, build_refine, build_static
from implicit_depth_tpu.config import load_config
from implicit_depth_tpu.data.synthetic import synthetic_batch
from implicit_depth_tpu.models.lidf import prepare_inputs
from implicit_depth_tpu.utils.profiling import device_slope_time

H, W, BS = 240, 320, 4


def main():
    cfg = load_config(overrides={
        "mask_type": "all",
        "dataset": {"img_height": H, "img_width": W},
        "tpu": {"compute_dtype": "bfloat16"},
    })
    static = build_static(cfg)
    model = build_lidf(cfg, static)
    # full tpu.use_pallas_decode=off LIDF (VERDICT r3 #8: re-validate the
    # two-stage serving default with BOTH stages' decode flipped)
    model_x = dataclasses.replace(model, use_pallas_decode=False)
    refine_k = build_refine(cfg, static)            # fused kernel (default)
    refine_x = dataclasses.replace(refine_k, use_pallas_decode=False)
    variants = {"kernel": refine_k, "xla": refine_x}
    for tile in (512, 2048):
        variants[f"kernel_t{tile}"] = dataclasses.replace(
            refine_k, decode_rows_per_tile=tile)
    # round-5: VMEM-table Pallas segmented max for the PointNet voxel
    # max-pool (VERDICT r4 #2) on top of the shipped decode kernel
    variants["kernel+segmax"] = dataclasses.replace(
        refine_k, use_pallas_segmax=True)

    raw = synthetic_batch(0, BS, H, W)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    key = jax.random.key(0)
    inputs = jax.jit(lambda b, kk: prepare_inputs(static, b, kk, train=True))(
        batch, key)
    variables = jax.jit(lambda kk, i: model.init(
        kk, i, train=False, use_gt_label=False))(jax.random.key(1), inputs)
    lidf_out = jax.jit(lambda v, i: model.apply(
        v, i, train=False, use_gt_label=False))(variables, inputs)
    rvars = jax.jit(lambda kk, i, o: refine_x.init(
        kk, i, o, o["pred_pos"]))(jax.random.key(4), inputs, lidf_out)

    def refine_iter(mdl):
        def fn(k, rv, i, o):
            return jnp.abs(mdl.apply(
                rv, i, o, o["pred_pos"] + 0 * jax.random.uniform(k))).sum()
        return fn

    fwd_times = int(cfg.refine.forward_times)

    def two_stage(mdl, lidf_mdl):
        def fn(k, v, rv, b):
            inp = prepare_inputs(static, b, k, train=True)
            lout = lidf_mdl.apply(v, inp, train=False, use_gt_label=False)
            pred = lout["pred_pos"]
            for _ in range(fwd_times):
                pred = mdl.apply(rv, inp, lout, pred)
            return jnp.abs(pred).sum().astype(jnp.float32)
        return fn

    for rep in range(3):
        for name, mdl in variants.items():
            ms = device_slope_time(refine_iter(mdl), key, rvars, inputs,
                                   lidf_out) * 1e3
            print(f"rep{rep} refine-iter {name:12s} {ms:8.2f} ms", flush=True)
    # two-stage: refine decode flip (stage-1 kernel on), then the FULL
    # use_pallas_decode=off path (both stages XLA)
    ts_variants = {"kernel": (variants["kernel"], model),
                   "kernel+segmax": (variants["kernel+segmax"], model),
                   "xla_refine": (variants["xla"], model),
                   "xla_both": (variants["xla"], model_x)}
    for rep in range(2):
        for name, (rmdl, lmdl) in ts_variants.items():
            ms = device_slope_time(two_stage(rmdl, lmdl), key, variables,
                                   rvars, batch) * 1e3
            rps = BS * static.n_rays / (ms / 1e3)
            print(f"rep{rep} two-stage  {name:12s} {ms:8.2f} ms "
                  f"({rps / 1e6:.2f} M rays/s)", flush=True)


if __name__ == "__main__":
    main()
