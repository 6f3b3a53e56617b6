#!/bin/sh
# Full reference recipe, end-to-end from reference-format disk data on the
# real TPU: 60-epoch stage-1 (train_lidf.yaml) -> 30-epoch hard-negative
# stage-2 (train_refine_hardneg.yaml, frozen stage-1 best_network) ->
# two-stage test CSVs (test_refine.yaml). Only paths / per-chip batch size
# are overridden; datasets come from scripts/make_disk_datasets.py.
#
#   sh scripts/run_disk_full.sh [dataset_dir] [log_dir]
set -e
cd "$(dirname "$0")/.."
D=${1:-datasets_disk_big}
L=${2:-logs/disk_run_full}
export PYTHONPATH="/root/repo:/root/.axon_site"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_tpu_cache}
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

DATA_SET="dataset.cleargrasp_root_dir=$D/cleargrasp dataset.omniverse_root_dir=$D/omniverse"

echo "== stage 1: train_lidf (60 epochs) =="
python -m implicit_depth_tpu.main --cfg_paths configs/train_lidf.yaml --set \
    base_log_dir="$L" log_name=lidf60 $DATA_SET \
    training.batch_size=4 training.valid_batch_size=2 \
    training.num_workers=8 training.worker_type=process \
    training.ckpt_every_steps=100

echo "== stage 2: train_refine_hardneg (30 epochs, frozen best_network) =="
python -m implicit_depth_tpu.main --cfg_paths configs/train_refine_hardneg.yaml --set \
    base_log_dir="$L" log_name=refine30 \
    lidf_ckpt_path="$L/lidf60/ckpt" lidf_ckpt_name=best_network $DATA_SET \
    training.batch_size=4 training.valid_batch_size=2 \
    training.num_workers=8 training.worker_type=process \
    training.ckpt_every_steps=100

echo "== test: two-stage inference, per-image CSVs =="
python -m implicit_depth_tpu.main --cfg_paths configs/test_refine.yaml --set \
    base_log_dir="$L" log_name=test \
    checkpoint_path="$L/refine30/ckpt" \
    lidf_ckpt_path="$L/lidf60/ckpt" lidf_ckpt_name=best_network $DATA_SET

echo "== done; results =="
ls "$L"/test/result 2>/dev/null || true
