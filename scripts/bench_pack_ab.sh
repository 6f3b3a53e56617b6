#!/bin/sh
# Interleaved A/B of the off|prob layer-1 width pack (VERDICT r3 #4):
# alternate unpacked/packed PROCESSES (the flag is read at trace time),
# 3 reps each, serving fwd + true-serial train step. Compile cache makes
# repeat processes cheap; read steady-state reps only (CLAUDE.md).
#   sh scripts/bench_pack_ab.sh [variant] > /tmp/pack_ab.log
set -e
cd "$(dirname "$0")/.."
V=${1:-per_ray_pallas_ksave}
export PYTHONPATH="/root/repo:/root/.axon_site"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_tpu_cache}
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
for rep in 1 2 3; do
  for pack in 0 1; do
    echo "== rep $rep pack=$pack =="
    IDT_DECODE_PACK_L1=$pack python scripts/bench_variants.py \
        --variants "$V" --train --serial
  done
done
