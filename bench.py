"""Benchmark: LIDF implicit-query throughput (rays/sec/chip).

Runs the full stage-1 forward (geometry prep + backbone + PointNet + per-pair
implicit decode) at production shapes on the available accelerator and prints
ONE JSON line. The reference publishes no throughput numbers
(SURVEY.md §6); ``vs_baseline`` is therefore reported against a nominal
1M rays/s/chip target from BASELINE.md's north-star framing.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from implicit_depth_tpu.builder import build_lidf, build_static
from implicit_depth_tpu.config import load_config
from implicit_depth_tpu.data.synthetic import synthetic_batch
from implicit_depth_tpu.models.lidf import prepare_inputs

NOMINAL_RAYS_PER_SEC = 1_000_000.0


def main():
    h, w = 240, 320
    batch_size = 4
    cfg = load_config(overrides={
        "mask_type": "all",
        "dataset": {"img_height": h, "img_width": w},
        "tpu": {"compute_dtype": "bfloat16"},
    })
    static = build_static(cfg)
    model = build_lidf(cfg, static)

    raw = synthetic_batch(0, batch_size, h, w)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}

    prep = jax.jit(lambda b, kk: prepare_inputs(static, b, kk, train=True))
    inputs = prep(batch, jax.random.key(0))
    variables = jax.jit(
        lambda kk, i: model.init(kk, i, train=False, use_gt_label=False)
    )(jax.random.key(1), inputs)

    def one(v, b, kk):
        return jnp.abs(model.apply(
            v, prepare_inputs(static, b, kk, train=True),
            train=False, use_gt_label=False)["pred_pos"]).sum()

    # The whole timing loop runs in-graph (lax.fori_loop) with ONE host
    # readback at the end: block_until_ready is not a reliable fence through
    # the remote-TPU relay, and a per-iteration readback would pay the
    # ~25 ms tunnel round-trip every step.
    iters = 10

    @jax.jit
    def loop(v, b, kk):
        def body(i, acc):
            return acc + one(v, b, jax.random.fold_in(kk, i))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    assert np.isfinite(float(loop(variables, batch, jax.random.key(2))))  # warm
    t0 = time.perf_counter()
    assert np.isfinite(float(loop(variables, batch, jax.random.key(3))))
    dt = (time.perf_counter() - t0) / iters

    n_chips = jax.local_device_count()
    rays_per_sec = batch_size * static.n_rays / dt / n_chips
    print(json.dumps({
        "metric": "lidf_fwd_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s/chip",
        "vs_baseline": round(rays_per_sec / NOMINAL_RAYS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
