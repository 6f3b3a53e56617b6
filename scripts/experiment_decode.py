"""XLA vs fused-Pallas pair decode on the TPU, plus full model fwd with and
without the kernel. Big arrays are passed as jit arguments (closed-over
constants blow the remote-compile request size)."""

import jax
import jax.numpy as jnp
import numpy as np

from implicit_depth_tpu.builder import build_lidf, build_static
from implicit_depth_tpu.config import load_config
from implicit_depth_tpu.data.synthetic import synthetic_batch
from implicit_depth_tpu.models.lidf import prepare_inputs
from implicit_depth_tpu.ops.pallas_decode import fused_pair_decode, xla_pair_decode
from implicit_depth_tpu.utils.profiling import device_slope_time


def main():
    key = jax.random.key(0)
    p, gf = 655360, 64
    rng = np.random.default_rng(0)
    feats = {
        "pv": rng.normal(size=(p, 128)).astype(np.float32),
        "roi": rng.normal(size=(p, 128)).astype(np.float32),
        "en": rng.normal(scale=0.5, size=(p, 3)).astype(np.float32),
        "lv": rng.normal(scale=0.5, size=(p, 3)).astype(np.float32),
        "de": rng.normal(size=(p, 27)).astype(np.float32),
    }
    feats = {k: jnp.asarray(v) for k, v in feats.items()}

    w = {"off_enc_w": rng.normal(scale=0.02, size=(1, 16)).astype(np.float32),
         "off_enc_b": np.zeros(16, np.float32)}
    for i, (a, b) in enumerate([(401, 4 * gf), (4 * gf, 2 * gf), (2 * gf, gf), (gf, 1)]):
        w[f"off_w{i+1}"] = rng.normal(scale=0.02, size=(a, b)).astype(np.float32)
        w[f"off_b{i+1}"] = np.zeros(b, np.float32)
    for i, (a, b) in enumerate([(385, 4 * gf), (4 * gf, 2 * gf), (2 * gf, gf), (gf, 1)]):
        w[f"prob_w{i+1}"] = rng.normal(scale=0.02, size=(a, b)).astype(np.float32)
        w[f"prob_b{i+1}"] = np.zeros(b, np.float32)
    w = {k: jnp.asarray(v) for k, v in w.items()}

    def xla_fn(k, f, ww):
        o, l = xla_pair_decode(f["pv"] * (1 + 0 * jax.random.uniform(k)),
                               f["roi"], f["en"], f["lv"], f["de"], ww,
                               dtype=jnp.bfloat16)
        return o.sum() + l.sum()

    t = device_slope_time(xla_fn, key, feats, w)
    print(f"XLA decode  (P=640k)      {t * 1e3:8.2f} ms", flush=True)

    for tile in (512, 1024, 2048):
        def pl_fn(k, f, ww, tile=tile):
            o, l = fused_pair_decode(f["pv"] * (1 + 0 * jax.random.uniform(k)),
                                     f["roi"], f["en"], f["lv"], f["de"], ww,
                                     dtype=jnp.bfloat16, tile=tile)
            return o.sum() + l.sum()
        try:
            t = device_slope_time(pl_fn, key, feats, w)
            print(f"Pallas decode tile={tile:5d}  {t * 1e3:8.2f} ms", flush=True)
        except Exception as e:
            print(f"Pallas tile={tile} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)

    h, wd, bs = 240, 320, 4
    for use_pallas in (False, True):
        cfg = load_config(overrides={
            "mask_type": "all", "dataset": {"img_height": h, "img_width": wd},
            "tpu": {"compute_dtype": "bfloat16", "use_pallas_decode": use_pallas}})
        static = build_static(cfg)
        raw = synthetic_batch(0, bs, h, wd)
        batch = {k: jnp.asarray(v) for k, v in raw.items()}
        inputs = jax.jit(lambda b, kk: prepare_inputs(static, b, kk, train=True))(
            batch, key)
        model = build_lidf(cfg, static)
        variables = jax.jit(lambda kk, i: model.init(
            kk, i, train=False, use_gt_label=False))(jax.random.key(1), inputs)

        def fwd_fn(k, v, i):
            i2 = dict(i, miss_dir=i["miss_dir"] * (1 + 0 * jax.random.uniform(k)))
            return jnp.abs(model.apply(v, i2, train=False,
                                       use_gt_label=False)["pred_pos"]).sum()
        try:
            t = device_slope_time(fwd_fn, key, variables, inputs)
            print(f"model fwd pallas={use_pallas}   {t * 1e3:8.2f} ms", flush=True)
        except Exception as e:
            print(f"model fwd pallas={use_pallas} FAILED: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
