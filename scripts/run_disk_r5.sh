#!/bin/sh
# Round-5 FROZEN procedural quality benchmark (VERDICT r4 #3): the round-4
# recipe re-run on a PINNED dataset with >=50-image test splits, so the
# resulting per-split MEAN table (committed to BASELINE.md) is a standing
# regression gate rather than a one-off study.
#
# Dataset: scripts/make_disk_datasets.py --seed 0 --n_train 560 --n_val 56
# --n_test 56 (generator is fully seed-deterministic; manifest sha256
# recorded in docs/ROUND5.md + BASELINE.md). All 4 CSV splits (syn/real x
# known/novel) then have 56 images — vs round 4's 8-12, whose noise made
# the hardneg RMSE anomaly unresolvable.
#
# OOM-resilient like run_disk_r4b.sh: this image's remote-TPU plugin leaks
# every device_put payload host-side (scripts/probe_put_leak.py), so each
# trainer self-recycles via tpu.host_rss_exit_gb and the retry loops resume.
#
#   sh scripts/run_disk_r5.sh [dataset_dir] [log_dir]
set -x
cd "$(dirname "$0")/.."
D=${1:-datasets_disk_r5}
L=${2:-logs/disk_run_r5}
export PYTHONPATH="/root/repo:/root/.axon_site"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/implicit_depth_tpu_xla}
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

DATA_SET="dataset.cleargrasp_root_dir=$D/cleargrasp dataset.omniverse_root_dir=$D/omniverse"
# valid_interval=3: the 56-image validation splits are 7x round 4's — thin
# per-epoch validation to keep the epoch budget on training (the last epoch
# always validates; best_network tracking still sees 20 validation points)
TRAIN_SET="training.batch_size=4 training.valid_batch_size=2 \
    training.num_workers=8 training.worker_type=process \
    training.ckpt_every_steps=500 training.valid_interval=3 \
    tpu.host_rss_exit_gb=80"

retry() {
  n=0
  until "$@"; do
    n=$((n+1)); echo "== died (attempt $n): $* =="
    [ $n -ge 12 ] && return 1
    sleep 5
  done
}

if [ ! -d "$D" ]; then
  echo "== generating pinned dataset (seed 0, 560/56/56) =="
  python scripts/make_disk_datasets.py --out "$D" --seed 0 \
      --n_train 560 --n_val 56 --n_test 56
  python scripts/dataset_manifest.py "$D"
fi

echo "== stage 1: train_lidf (60 epochs) =="
retry python -m implicit_depth_tpu.main --cfg_paths configs/train_lidf.yaml --set \
    base_log_dir="$L" log_name=lidf60 resume=latest_network $DATA_SET $TRAIN_SET

echo "== stage 2a: train_refine_hardneg (30 epochs, frozen best_network) =="
retry python -m implicit_depth_tpu.main --cfg_paths configs/train_refine_hardneg.yaml --set \
    base_log_dir="$L" log_name=refine_hardneg resume=latest_network \
    lidf_ckpt_path="$L/lidf60/ckpt" lidf_ckpt_name=best_network $DATA_SET $TRAIN_SET

echo "== stage 2b: train_refine PLAIN (30 epochs, same frozen stage-1) =="
retry python -m implicit_depth_tpu.main --cfg_paths configs/train_refine.yaml --set \
    base_log_dir="$L" log_name=refine_plain resume=latest_network \
    lidf_ckpt_path="$L/lidf60/ckpt" lidf_ckpt_name=best_network $DATA_SET $TRAIN_SET

echo "== test: stage-1 only baseline =="
retry python -m implicit_depth_tpu.main --cfg_paths configs/test_lidf.yaml --set \
    base_log_dir="$L" log_name=test_lidf_only \
    checkpoint_path="$L/lidf60/ckpt" checkpoint_name=best_network $DATA_SET

for V in refine_hardneg refine_plain; do
  echo "== test: two-stage inference ($V best_network) =="
  retry python -m implicit_depth_tpu.main --cfg_paths configs/test_refine.yaml --set \
      base_log_dir="$L" log_name=test_$V \
      checkpoint_path="$L/$V/ckpt" checkpoint_name=best_network \
      lidf_ckpt_path="$L/lidf60/ckpt" lidf_ckpt_name=best_network $DATA_SET
done
ls "$L"/test_refine_hardneg/result "$L"/test_refine_plain/result 2>/dev/null || true
