#!/usr/bin/env python
"""A/B: Pallas VMEM-table segmented max vs jax.ops.segment_max at the
stage-2 refine shapes (VERDICT r4 #2).

Shapes from the round-4 refine trace (BASELINE.md): per PointNet stage the
two split streams pool (B·n_valid=40k, C) and (B·R=80k, C) rows into
B·729 = 2916 cells, C=64 (stage 1) and 128 (stage 2).

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_segmax_pallas.py
"""

import json

import jax

from implicit_depth_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax.numpy as jnp
import numpy as np

from implicit_depth_tpu.ops.pallas_segment import pallas_segment_max0
from implicit_depth_tpu.ops.segment import segment_max0
from implicit_depth_tpu.utils.profiling import device_slope_time

S = 4 * 729


def run_case(n, c, dtype, rows_per_tile=4096):
    rng = np.random.default_rng(0)
    data = jnp.asarray(np.abs(rng.normal(size=(n, c))), dtype)
    ids = jnp.asarray(rng.integers(0, S, n).astype(np.int32))
    valid = jnp.asarray(rng.random(n) > 0.1)

    ref = jax.jit(lambda d, i, v: segment_max0(d, i, S, v))
    ker = jax.jit(lambda d, i, v: pallas_segment_max0(
        d, i, S, v, rows_per_tile=rows_per_tile))

    a, b = ref(data, ids, valid), ker(data, ids, valid)
    exact = bool(jnp.all(a == b))

    def loop(fn):
        def body(k, d, i, v):
            # vary data so the loop isn't CSE'd; shift keeps values >= 0
            shift = jax.random.uniform(k, (), d.dtype) * 0.01
            return fn(d + shift, i, v).max().astype(jnp.float32)
        return body

    t_ref = device_slope_time(loop(ref), jax.random.key(1), data, ids, valid)
    t_ker = device_slope_time(loop(ker), jax.random.key(1), data, ids, valid)
    print(json.dumps({
        "n": n, "c": c, "dtype": str(dtype.__name__), "exact": exact,
        "xla_ms": round(t_ref * 1e3, 3),
        "pallas_ms": round(t_ker * 1e3, 3),
        "speedup": round(t_ref / t_ker, 2),
    }), flush=True)


if __name__ == "__main__":
    for n, c in ((40_000, 64), (80_000, 64), (40_000, 128), (80_000, 128)):
        for dt in (jnp.float32, jnp.bfloat16):
            run_case(n, c, dt)
