#!/bin/sh
# Stage-1 with OOM-resilient resume loop (round-4: host RSS leak under
# diagnosis — each restart resumes from the preemption-safe checkpoints).
set -x
cd "$(dirname "$0")/.."
D=${1:-datasets_disk_big}
L=${2:-logs/disk_run_r4}
export PYTHONPATH="/root/repo:/root/.axon_site"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_tpu_cache}
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
DATA_SET="dataset.cleargrasp_root_dir=$D/cleargrasp dataset.omniverse_root_dir=$D/omniverse"
n=0
until python -m implicit_depth_tpu.main --cfg_paths configs/train_lidf.yaml --set \
    base_log_dir="$L" log_name=lidf60 $DATA_SET resume=latest_network \
    training.batch_size=4 training.valid_batch_size=2 \
    training.num_workers=8 training.worker_type=process \
    training.ckpt_every_steps=500; do
  n=$((n+1))
  echo "== stage-1 died (attempt $n) — resuming =="
  [ $n -ge 10 ] && exit 1
  sleep 5
done
