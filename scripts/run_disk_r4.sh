#!/bin/sh
# Round-4 convergence-to-saturation study (VERDICT r3 #2): full reference
# recipe on the BIG generated dataset (~1k mixed train images), with a
# hardneg-vs-plain stage-2 A/B on identical data and identical frozen
# stage-1 weights:
#   stage 1 (train_lidf.yaml, 60 epochs)
#   stage 2a (train_refine_hardneg.yaml, 30 epochs, frozen best_network)
#   stage 2b (train_refine.yaml,        30 epochs, same frozen stage-1)
#   test CSVs for both stage-2 variants (test_refine.yaml, best_network)
#
#   sh scripts/run_disk_r4.sh [dataset_dir] [log_dir]
set -e
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
    training.ckpt_every_steps=500"

echo "== stage 1: train_lidf (60 epochs) =="
python -m implicit_depth_tpu.main --cfg_paths configs/train_lidf.yaml --set \
    base_log_dir="$L" log_name=lidf60 $DATA_SET $TRAIN_SET

echo "== stage 2a: train_refine_hardneg (30 epochs, frozen best_network) =="
python -m implicit_depth_tpu.main --cfg_paths configs/train_refine_hardneg.yaml --set \
    base_log_dir="$L" log_name=refine_hardneg \
    lidf_ckpt_path="$L/lidf60/ckpt" lidf_ckpt_name=best_network $DATA_SET $TRAIN_SET

echo "== stage 2b: train_refine PLAIN (30 epochs, same frozen stage-1) =="
python -m implicit_depth_tpu.main --cfg_paths configs/train_refine.yaml --set \
    base_log_dir="$L" log_name=refine_plain \
    lidf_ckpt_path="$L/lidf60/ckpt" lidf_ckpt_name=best_network $DATA_SET $TRAIN_SET

for V in refine_hardneg refine_plain; do
  echo "== test: two-stage inference ($V best_network) =="
  python -m implicit_depth_tpu.main --cfg_paths configs/test_refine.yaml --set \
      base_log_dir="$L" log_name=test_$V \
      checkpoint_path="$L/$V/ckpt" checkpoint_name=best_network \
      lidf_ckpt_path="$L/lidf60/ckpt" lidf_ckpt_name=best_network $DATA_SET
done

echo "== done; results =="
ls "$L"/test_refine_hardneg/result "$L"/test_refine_plain/result 2>/dev/null || true
