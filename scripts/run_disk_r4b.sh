#!/bin/sh
# Round-4 stages 2a/2b + tests, OOM-resilient: this image's remote-TPU
# plugin leaks every device_put payload host-side (scripts/probe_put_leak.py
# — ~12 MB/step), so each trainer self-recycles via tpu.host_rss_exit_gb
# and the loops here resume it. Run after stage-1 (lidf60) completes.
#   sh scripts/run_disk_r4b.sh [dataset_dir] [log_dir]
set -x
cd "$(dirname "$0")/.."
D=${1:-datasets_disk_big}
L=${2:-logs/disk_run_r4}
export PYTHONPATH="/root/repo:/root/.axon_site"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_tpu_cache}
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
DATA_SET="dataset.cleargrasp_root_dir=$D/cleargrasp dataset.omniverse_root_dir=$D/omniverse"
TRAIN_SET="training.batch_size=4 training.valid_batch_size=2 \
    training.num_workers=8 training.worker_type=process \
    training.ckpt_every_steps=500 tpu.host_rss_exit_gb=80"

retry() {
  n=0
  until "$@"; do
    n=$((n+1)); echo "== died (attempt $n): $* =="
    [ $n -ge 12 ] && return 1
    sleep 5
  done
}

retry python -m implicit_depth_tpu.main --cfg_paths configs/train_refine_hardneg.yaml --set \
    base_log_dir="$L" log_name=refine_hardneg resume=latest_network \
    lidf_ckpt_path="$L/lidf60/ckpt" lidf_ckpt_name=best_network $DATA_SET $TRAIN_SET

retry python -m implicit_depth_tpu.main --cfg_paths configs/train_refine.yaml --set \
    base_log_dir="$L" log_name=refine_plain resume=latest_network \
    lidf_ckpt_path="$L/lidf60/ckpt" lidf_ckpt_name=best_network $DATA_SET $TRAIN_SET

for V in refine_hardneg refine_plain; do
  retry python -m implicit_depth_tpu.main --cfg_paths configs/test_refine.yaml --set \
      base_log_dir="$L" log_name=test_$V \
      checkpoint_path="$L/$V/ckpt" checkpoint_name=best_network \
      lidf_ckpt_path="$L/lidf60/ckpt" lidf_ckpt_name=best_network $DATA_SET
done
ls "$L"/test_refine_hardneg/result "$L"/test_refine_plain/result 2>/dev/null || true
