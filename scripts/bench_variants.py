#!/usr/bin/env python
"""A/B decode variants on the real TPU (full stage-1 forward + train step).

Run:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_variants.py \
      [--variants per_ray_xla,per_ray_pallas,...] [--train]

Timing method: in-graph fori-loop slope (utils/profiling.device_slope_time);
block_until_ready is not a fence through this image's remote-TPU relay.
"""

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from implicit_depth_tpu.builder import build_lidf, build_static
from implicit_depth_tpu.config import load_config
from implicit_depth_tpu.data.synthetic import synthetic_batch
from implicit_depth_tpu.models.lidf import lidf_loss, prepare_inputs
from implicit_depth_tpu.utils.profiling import device_slope_time

H, W, BS = 240, 320, 4

VARIANTS = {
    # name: (pairs_budget, mode, use_pallas, decode_bwd)
    "global_xla": (8, "global", False, "xla"),
    "per_ray_xla": (8, "per_ray", False, "xla"),
    "per_ray_pallas": (8, "per_ray", True, "xla"),
    "per_ray_pallas_kbwd": (8, "per_ray", True, "kernel"),
    "per_ray_pallas_ksave": (8, "per_ray", True, "kernel_save"),
    "per_ray_pallas_ksaveall": (8, "per_ray", True, "kernel_save_all"),
    "per_ray4_pallas": (4, "per_ray", True, "xla"),
    "dense_xla": (0, "per_ray", False, "xla"),
}


def build(budget, mode, pallas, decode_bwd="xla", tile=0, train_tile=0):
    tpu = {"compute_dtype": "bfloat16", "pairs_budget_per_ray": budget,
           "pairs_budget_mode": mode, "use_pallas_decode": pallas,
           "decode_bwd": decode_bwd}
    if tile:
        tpu["decode_rays_per_tile"] = tile
    if train_tile:
        tpu["decode_train_rays_per_tile"] = train_tile
    cfg = load_config(overrides={
        "mask_type": "all",
        "dataset": {"img_height": H, "img_width": W},
        "tpu": tpu,
    })
    static = build_static(cfg)
    return cfg, static, build_lidf(cfg, static)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="per_ray_xla,per_ray_pallas")
    ap.add_argument("--train", action="store_true",
                    help="also time the train step (fwd+bwd+adam)")
    ap.add_argument("--tile", type=int, default=0,
                    help="override tpu.decode_rays_per_tile")
    ap.add_argument("--train-tile", type=int, default=0,
                    help="override tpu.decode_train_rays_per_tile")
    ap.add_argument("--serial", action="store_true",
                    help="train timing with state threaded through the loop "
                         "(true serial step; default is the pipelined upper "
                         "bound — see BASELINE.md timing-methodology note)")
    args = ap.parse_args()

    raw = synthetic_batch(0, BS, H, W)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}

    for name in args.variants.split(","):
        budget, mode, pallas, decode_bwd = VARIANTS[name]
        cfg, static, model = build(budget, mode, pallas, decode_bwd,
                                   args.tile, args.train_tile)
        prep = jax.jit(lambda b, kk: prepare_inputs(static, b, kk, train=True))
        inputs = prep(batch, jax.random.key(0))
        variables = jax.jit(lambda kk, i: model.init(
            kk, i, train=False, use_gt_label=False))(jax.random.key(1), inputs)

        def fwd(kk, v, b):
            out = model.apply(v, prepare_inputs(static, b, kk, train=True),
                              train=False, use_gt_label=False)
            return jnp.abs(out["pred_pos"]).sum()

        dt = device_slope_time(fwd, jax.random.key(2), variables, batch)
        rps = BS * static.n_rays / dt
        print(json.dumps({"variant": name, "fwd_ms": round(dt * 1e3, 2),
                          "rays_per_sec": round(rps, 1)}), flush=True)

        if args.train:
            from implicit_depth_tpu.train.state import TrainState, make_tx
            tx = make_tx(cfg.training, 100)
            state = TrainState.create(variables["params"],
                                      variables["batch_stats"], tx)

            def tstep(kk, st, b):
                inp = prepare_inputs(static, b, kk, train=True)

                def loss_fn(params):
                    out, mut = model.apply(
                        {"params": params, "batch_stats": st.batch_stats},
                        inp, train=True, use_gt_label=False,
                        mutable=["batch_stats"])
                    return lidf_loss(inp, out, train=True,
                                     img_hw=(H, W))["loss_net"], mut

                (l, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    st.params)
                st2 = st.apply_gradients(grads,
                                         new_batch_stats=mut["batch_stats"])
                return l + jax.tree.leaves(st2.params)[0].astype(jnp.float32).sum() * 0

            if args.serial:
                # honest serial methodology (BASELINE.md "Timing-methodology
                # correction"): thread the optimizer state through the loop
                # carry so iterations have a true dependence — XLA cannot
                # pipeline them into a throughput upper bound
                import time

                def serial_loop_factory(iters):
                    @jax.jit
                    def loop(kk, st, b):
                        def body(i, carry):
                            st, acc = carry
                            inp = prepare_inputs(static, b,
                                                 jax.random.fold_in(kk, i),
                                                 train=True)

                            def loss_fn(params):
                                out, mut = model.apply(
                                    {"params": params,
                                     "batch_stats": st.batch_stats},
                                    inp, train=True, use_gt_label=False,
                                    mutable=["batch_stats"])
                                return lidf_loss(
                                    inp, out, train=True,
                                    img_hw=(H, W))["loss_net"], mut

                            (l, mut), grads = jax.value_and_grad(
                                loss_fn, has_aux=True)(st.params)
                            st = st.apply_gradients(
                                grads, new_batch_stats=mut["batch_stats"])
                            return (st, acc + l.astype(jnp.float32))
                        return jax.lax.fori_loop(
                            0, iters, body, (st, jnp.float32(0)))[1]
                    return loop

                times = {}
                for iters in (2, 8):
                    loop = serial_loop_factory(iters)
                    assert np.isfinite(float(loop(jax.random.key(5), state,
                                                  batch)))
                    t0 = time.perf_counter()
                    assert np.isfinite(float(loop(jax.random.key(6), state,
                                                  batch)))
                    times[iters] = time.perf_counter() - t0
                dt = (times[8] - times[2]) / 6
                label = name + "+train_serial"
            else:
                dt = device_slope_time(tstep, jax.random.key(3), state, batch)
                label = name + "+train"
            print(json.dumps({"variant": label,
                              "step_ms": round(dt * 1e3, 2),
                              "rays_per_sec": round(BS * static.n_rays / dt, 1)}),
                  flush=True)


if __name__ == "__main__":
    main()
