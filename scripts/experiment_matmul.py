"""Calibrate achievable MXU throughput on this chip/relay: pure bf16 matmuls
at the decode's shapes, plus the full model fwd with the Pallas decode."""

import jax
import jax.numpy as jnp
import numpy as np

from implicit_depth_tpu.builder import build_lidf, build_static
from implicit_depth_tpu.config import load_config
from implicit_depth_tpu.data.synthetic import synthetic_batch
from implicit_depth_tpu.models.lidf import prepare_inputs
from implicit_depth_tpu.utils.profiling import device_slope_time


def main():
    key = jax.random.key(0)
    rng = np.random.default_rng(0)

    for m, k, n in [(655360, 401, 256), (655360, 385, 256), (8192, 4096, 4096)]:
        a = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32), jnp.bfloat16)
        bmat = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32), jnp.bfloat16)

        def f(kk, a, bmat):
            return jnp.dot(a * (1 + 0 * jax.random.uniform(kk, dtype=jnp.bfloat16)),
                           bmat, preferred_element_type=jnp.float32).sum()

        t = device_slope_time(f, key, a, bmat)
        tflops = 2 * m * k * n / t / 1e12
        print(f"matmul {m}x{k}x{n}: {t * 1e3:7.2f} ms  {tflops:6.1f} TFLOP/s",
              flush=True)

    h, wd, bs = 240, 320, 4
    cfg = load_config(overrides={
        "mask_type": "all", "dataset": {"img_height": h, "img_width": wd},
        "tpu": {"compute_dtype": "bfloat16", "use_pallas_decode": True}})
    static = build_static(cfg)
    raw = synthetic_batch(0, bs, h, wd)
    batch = {k2: jnp.asarray(v) for k2, v in raw.items()}
    inputs = jax.jit(lambda b, kk: prepare_inputs(static, b, kk, train=True))(
        batch, key)
    model = build_lidf(cfg, static)
    variables = jax.jit(lambda kk, i: model.init(
        kk, i, train=False, use_gt_label=False))(jax.random.key(1), inputs)

    def fwd_fn(k2, v, i):
        i2 = dict(i, miss_dir=i["miss_dir"] * (1 + 0 * jax.random.uniform(k2)))
        return jnp.abs(model.apply(v, i2, train=False,
                                   use_gt_label=False)["pred_pos"]).sum()
    try:
        t = device_slope_time(fwd_fn, key, variables, inputs)
        print(f"model fwd pallas=True (tile 512): {t * 1e3:7.2f} ms", flush=True)
    except Exception as e:
        print(f"model fwd pallas FAILED: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
