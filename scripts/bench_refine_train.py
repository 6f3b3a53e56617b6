#!/usr/bin/env python
"""TRUE-serial stage-2 training throughput (frozen LIDF + RefineNet +
hard-neg loss) — the first official stage-2 train number (round 4); gives
future rounds a regression target alongside bench.py's stage-1 metric.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_refine_train.py
"""

import json

import jax

from implicit_depth_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax.numpy as jnp
import numpy as np

from implicit_depth_tpu.builder import build_lidf, build_refine, build_static
from implicit_depth_tpu.config import load_config
from implicit_depth_tpu.data.synthetic import synthetic_batch
from implicit_depth_tpu.models.lidf import prepare_inputs
from implicit_depth_tpu.parallel.mesh import make_mesh, replicate
from implicit_depth_tpu.train.state import TrainState, make_tx
from implicit_depth_tpu.train.steps import _refine_train_core

H, W, BS = 240, 320, 4


def main():
    cfg = load_config(overrides={
        "mask_type": "all",
        "dataset": {"img_height": H, "img_width": W},
        "loss": {"hard_neg": True, "hard_neg_ratio": 0.1, "pos_w": 20.0},
        "tpu": {"compute_dtype": "bfloat16"},
    })
    static = build_static(cfg)
    model = build_lidf(cfg, static)
    refine = build_refine(cfg, static)

    raw = synthetic_batch(0, BS, H, W)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    inputs = jax.jit(lambda b, kk: prepare_inputs(static, b, kk, train=True))(
        batch, jax.random.key(0))
    lidf_vars = jax.jit(lambda kk, i: model.init(
        kk, i, train=False, use_gt_label=False))(jax.random.key(1), inputs)
    lidf_out = jax.jit(lambda v, i: model.apply(
        v, i, train=False, use_gt_label=False))(lidf_vars, inputs)
    rvars = jax.jit(lambda kk, i, o: refine.init(
        kk, i, o, o["pred_pos"]))(jax.random.key(2), inputs, lidf_out)

    mesh = make_mesh((1, 1), ("data", "rays"), devices=jax.devices()[:1])
    core = _refine_train_core(cfg, model, refine, mesh)
    state = replicate(TrainState.create(rvars["params"], {},
                                        make_tx(cfg.training, 100)), mesh)

    def make_serial(iters):
        @jax.jit
        def loop(kk, s, lv, b):
            def body(i, carry):
                s, acc = carry
                s, losses = core(s, lv, b, jax.random.fold_in(kk, i),
                                 jnp.asarray(10 ** 6))
                return (s, acc + losses["loss_net"].astype(jnp.float32))
            return jax.lax.fori_loop(0, iters, body, (s, jnp.float32(0)))[1]

        def go():
            assert np.isfinite(float(loop(jax.random.key(5), state,
                                          lidf_vars, batch)))
        return go

    from implicit_depth_tpu.utils.profiling import interleaved_slope
    dt = interleaved_slope(make_serial(3), make_serial(9), 3, 9,
                           verbose=True)
    rps = BS * static.n_rays / dt
    print(json.dumps({"metric": "refine_train_serial_rays_per_sec_per_chip",
                      "step_ms": round(dt * 1e3, 2),
                      "value": round(rps, 1), "unit": "rays/s/chip"}),
          flush=True)


if __name__ == "__main__":
    main()
