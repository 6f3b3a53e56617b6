#!/usr/bin/env python
"""Decompose the serial train step (fwd+bwd+Adam) on the real TPU.

Times state-threaded (true serial) variants with pieces of the backward
ablated via stop_gradient, so the difference against the full step isolates
each component's cost:

  full        everything differentiated (= the shipped train step, BN frozen)
  sg_vox      vox_feat detached  -> removes PointNet bwd + the 640k-row
              scatter-add of d_pair_vox into the (B*G^3, Cv) table
  sg_feat     feat_map detached  -> removes ResNet + ROI-pool bwd
  sg_trunk    both detached      -> decoder-MLP bwd + loss bwd only
  loss_min    full diff paths, loss = pos L1 + prob CE only -> isolates the
              surface-normal branch (scatter_into_image + normals, fwd+bwd)
  fwd_only    loss value, no grad, no Adam

Run:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_train_bwd.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from implicit_depth_tpu.builder import build_lidf, build_static
from implicit_depth_tpu.config import load_config
from implicit_depth_tpu.data.synthetic import synthetic_batch
from implicit_depth_tpu.models.lidf import (
    LIDFModel,
    lidf_loss,
    masked_mean,
    prepare_inputs,
)
from implicit_depth_tpu.ops.masked import masked_argmax, masked_log_softmax
from implicit_depth_tpu.train.state import TrainState, make_tx

H, W, BS = 240, 320, 4


def serial_slope(step, state, batch, iters_a=2, iters_b=8):
    """State-threaded fori-loop slope: one readback per run, serial chain."""
    times = {}
    for iters in (iters_a, iters_b):
        @jax.jit
        def loop(kk, s, b, n=iters):
            def body(i, carry):
                s, acc = carry
                s, val = step(s, b, jax.random.fold_in(kk, i))
                return (s, acc + val)
            return jax.lax.fori_loop(0, n, body, (s, jnp.float32(0)))[1]

        assert np.isfinite(float(loop(jax.random.key(2), state, batch)))
        t0 = time.perf_counter()
        assert np.isfinite(float(loop(jax.random.key(3), state, batch)))
        times[iters] = time.perf_counter() - t0
    return (times[iters_b] - times[iters_a]) / (iters_b - iters_a)


def main():
    cfg = load_config(overrides={
        "mask_type": "all",
        "dataset": {"img_height": H, "img_width": W},
        "tpu": {"compute_dtype": "bfloat16"},
    })
    static = build_static(cfg)
    model = build_lidf(cfg, static)

    raw = synthetic_batch(0, BS, H, W)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    inputs0 = jax.jit(lambda b, kk: prepare_inputs(static, b, kk, train=True))(
        batch, jax.random.key(0))
    variables = jax.jit(lambda kk, i: model.init(
        kk, i, train=False, use_gt_label=False))(jax.random.key(1), inputs0)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              make_tx(cfg.training, 100))

    sg = jax.lax.stop_gradient
    loss_kw = dict(train=True, img_hw=(H, W),
                   pos_w=float(cfg.loss.pos_w), prob_w=float(cfg.loss.prob_w),
                   surf_norm_w=float(cfg.loss.surf_norm_w),
                   smooth_w=float(cfg.loss.smooth_w),
                   surf_norm_on=True, smooth_on=False,
                   hard_neg=False, hard_neg_ratio=0.1)

    def make_step(ablate):
        def step(s, b, key):
            inputs = prepare_inputs(static, b, key, train=True)

            def loss_fn(params):
                v = {"params": params, "batch_stats": s.batch_stats}
                feat_map, vox_feat = model.apply(
                    v, inputs, False, method=LIDFModel.trunk)
                if ablate in ("sg_vox", "sg_trunk"):
                    vox_feat = sg(vox_feat)
                if ablate in ("sg_feat", "sg_trunk"):
                    feat_map = sg(feat_map)
                # decode train=True: pick the training decode path (per-image
                # table kernel) rather than the serving rows path
                out = model.apply(v, inputs, feat_map, vox_feat, True, False,
                                  method=LIDFModel.decode_rays)
                if ablate == "loss_min":
                    slot = inputs["miss_slot"]
                    pos_l1 = jnp.mean(
                        jnp.abs(out["pred_pos"] - inputs["gt_pos"]), axis=-1)
                    pv = out["pair_valid"]
                    lab = inputs["pair_label"][..., :pv.shape[-1]]
                    log_sm = masked_log_softmax(out["prob_logit"], pv)
                    has_label = jnp.any(lab & pv, axis=-1)
                    gt_slot, _ = masked_argmax(lab.astype(jnp.float32), pv)
                    ce = -jnp.take_along_axis(
                        log_sm, gt_slot[..., None], axis=-1)[..., 0]
                    return (loss_kw["pos_w"] * masked_mean(pos_l1, slot)
                            + loss_kw["prob_w"]
                            * masked_mean(ce, slot & has_label))
                return lidf_loss(inputs, out, **loss_kw)["loss_net"]

            if ablate == "fwd_only":
                return s, loss_fn(s.params).astype(jnp.float32)
            grads = jax.grad(loss_fn)(s.params)
            s = s.apply_gradients(grads)
            return s, jax.tree_util.tree_reduce(
                lambda a, x: a + jnp.sum(jnp.abs(x).astype(jnp.float32)),
                grads, jnp.float32(0)) * 0 + 1
        return step

    for name in ("fwd_only", "sg_trunk", "sg_vox", "sg_feat",
                 "loss_min", "full"):
        dt = serial_slope(make_step(name), state, batch)
        print(f"{name:10s} {dt * 1e3:8.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
