#!/usr/bin/env python
"""Standalone per-pair decode sweep on the real TPU.

Times xla_ray_decode and the fused Pallas kernel (tile sweep, one-hot
variant) at the production shapes (B*R = 80k rays, kb=8, cv=128, cr=155,
gf4=256). Run:

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_decode.py \
      [--variants xla,k64,k128,k256,oh64,oh128]

Timing: in-graph fori-loop slope, one readback (remote relay is not fenced
by block_until_ready).
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from implicit_depth_tpu.ops.pallas_ray_decode import (
    fused_ray_decode,
    fused_ray_decode_onehot,
    xla_ray_decode,
)

N_RAYS, KB, CV, CR, GF4 = 80_000, 8, 128, 155, 256
N_CELLS = 4 * 512  # B * G^3 at grid res 8


def _weights(rng):
    c_embed = CV + 128 + 102 + 27
    dims = [(c_embed + 16, GF4), (GF4, GF4 // 2), (GF4 // 2, GF4 // 4),
            (GF4 // 4, 1)]
    w = {"off_enc_w": rng.normal(size=(1, 16)).astype(np.float32),
         "off_enc_b": rng.normal(size=(16,)).astype(np.float32)}
    for i, (a, b) in enumerate(dims, 1):
        w[f"off_w{i}"] = (rng.normal(size=(a, b)) * 0.05).astype(np.float32)
        w[f"off_b{i}"] = (rng.normal(size=(b,)) * 0.05).astype(np.float32)
        ap = a if i > 1 else c_embed
        w[f"prob_w{i}"] = (rng.normal(size=(ap, b)) * 0.05).astype(np.float32)
        w[f"prob_b{i}"] = (rng.normal(size=(b,)) * 0.05).astype(np.float32)
    return {k: jnp.asarray(v) for k, v in w.items()}


def slope(fn, *args):
    times = {}
    for iters in (2, 12):
        @jax.jit
        def run(*a, it=iters):
            def body(i, acc):
                out = fn(jnp.float32(1) + acc * 1e-9, *a)
                return acc + out
            return jax.lax.fori_loop(0, it, body, jnp.float32(0))
        float(run(*args))
        t0 = time.perf_counter()
        float(run(*args))
        times[iters] = time.perf_counter() - t0
    return (times[12] - times[2]) / 10


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="xla,k64,k128,k256,oh64,oh128")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    table = jnp.asarray((rng.normal(size=(N_CELLS, CV)) * 0.3).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, N_CELLS, N_RAYS * KB,
                                   dtype=np.int32)).reshape(N_RAYS, KB)
    pair_vox = table[ids.reshape(-1)]
    # ray-major lane-packed positions (N, kb*6) — the kernel operand layout
    pos = jnp.asarray((rng.normal(size=(N_RAYS, KB * 6)) * 0.5).astype(np.float32))
    ray_feat = jnp.asarray(rng.normal(size=(N_RAYS, CR)).astype(np.float32))
    w = _weights(rng)
    bf = jnp.bfloat16
    pv16, rf16, tb16 = pair_vox.astype(bf), ray_feat.astype(bf), table.astype(bf)

    def run_variant(name):
        if name == "xla":
            fn = lambda s, pv, p, rf: jnp.sum(xla_ray_decode(
                pv * s.astype(bf), p.reshape(N_RAYS * KB, 6), rf, w,
                kb=KB)[1])
            return slope(fn, pv16, pos, rf16)
        if name.startswith("k"):
            t = int(name[1:])
            fn = lambda s, pv, p, rf: jnp.sum(fused_ray_decode(
                pv * s.astype(bf), p, rf, w, KB, 8, 2, 0.001, False, bf,
                t, False)[1])
            return slope(fn, pv16, pos, rf16)
        if name.startswith("oh"):
            t = int(name[2:])
            fn = lambda s, i_, p, rf, tb: jnp.sum(fused_ray_decode_onehot(
                i_, p, (rf * s.astype(bf), tb), w, KB, 8, 2, 0.001, False,
                bf, t, False)[1])
            return slope(fn, ids, pos, rf16, tb16)
        raise ValueError(name)

    for name in args.variants.split(","):
        try:
            dt = run_variant(name)
            print(json.dumps({"variant": name, "ms": round(dt * 1e3, 3),
                              "rays_per_sec": round(N_RAYS / dt, 1)}),
                  flush=True)
        except Exception as e:  # tile too big for VMEM etc — record and go on
            print(json.dumps({"variant": name,
                              "error": str(e).splitlines()[0][:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
