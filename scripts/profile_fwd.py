"""Time the stage-1 forward piecewise on the real TPU."""

import time

import jax
import jax.numpy as jnp

from implicit_depth_tpu.builder import build_lidf, build_static
from implicit_depth_tpu.config import load_config
from implicit_depth_tpu.data.synthetic import synthetic_batch
from implicit_depth_tpu.models.lidf import prepare_inputs


def timed(name, fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt * 1e3:8.2f} ms")
    return out


def main():
    h, w, bs = 240, 320, 4
    cfg = load_config(overrides={
        "mask_type": "all",
        "dataset": {"img_height": h, "img_width": w},
        "tpu": {"compute_dtype": "bfloat16"},
    })
    static = build_static(cfg)
    model = build_lidf(cfg, static)
    raw = synthetic_batch(0, bs, h, w)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    key = jax.random.key(0)

    prep = jax.jit(lambda b, kk: prepare_inputs(static, b, kk, train=True))
    inputs = timed("prepare_inputs", prep, batch, key)

    variables = jax.jit(lambda kk, i: model.init(
        kk, i, train=False, use_gt_label=False))(jax.random.key(1), inputs)

    resnet = jax.jit(lambda v, i: model.apply(
        v, i["rgb"], train=False, method=lambda m, x, train: m.resnet(x, train)))
    timed("resnet backbone", resnet, variables, inputs)

    pnet = jax.jit(lambda v, i: model.apply(
        v, i, method=lambda m, inp: m.voxel_features(inp)))
    timed("pointnet voxel feats", pnet, variables, inputs)

    full = jax.jit(lambda v, i: model.apply(
        v, i, train=False, use_gt_label=False)["pred_pos"])
    timed("full forward", full, variables, inputs)

    n_valid = float(jnp.sum(inputs["pair_valid"]))
    n_slots = inputs["pair_valid"].size
    print(f"pair slots {n_slots}  valid {n_valid:.0f} "
          f"({100 * n_valid / n_slots:.1f}%)")


if __name__ == "__main__":
    main()
