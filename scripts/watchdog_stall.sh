#!/bin/sh
# Stall watchdog for long TPU runs on this image (pair with the retry loops
# in scripts/run_disk_r5.sh): kills the trainer when (a) neither the run
# log nor any log-dir artifact has grown for >8 minutes AND (b) no
# connection to the TPU relay (port 8093) is open. (b) distinguishes the
# observed failure — every thread parked in futex_wait, zero CPU, no RPC in
# flight (~1-in-3 process starts under the axon backend, round 5) — from a
# legitimately silent remote compile, which keeps an HTTP connection open.
# The runner's retry loop + mid-epoch checkpoints make the kill lossless.
#
#   sh scripts/watchdog_stall.sh [log_dir] [run_log]
LOGDIR=${1:-/root/repo/logs/disk_run_r5}
RUNLOG=${2:-/tmp/disk_r5.log}
while true; do
  sleep 60
  PID=$(pgrep -f "implicit_depth_tpu.main" | head -1)
  [ -z "$PID" ] && continue
  LOG=$(stat -c %Y "$RUNLOG" 2>/dev/null || echo 0)
  NEW=$(find "$LOGDIR" -name "*.jsonl" -o -name "valid_log.txt" 2>/dev/null | xargs -r stat -c %Y 2>/dev/null | sort -n | tail -1)
  [ -z "$NEW" ] && NEW=0
  LAST=$(( NEW > LOG ? NEW : LOG ))
  NOW=$(date +%s)
  CONN=$(ss -t 2>/dev/null | grep -c 8093)
  if [ $((NOW - LAST)) -gt 480 ] && [ "$CONN" -eq 0 ]; then
    echo "$(date) watchdog: stalled $((NOW-LAST))s, no relay conn, killing $PID" >> "${RUNLOG%.log}_watchdog.log"
    kill -9 "$PID"
    sleep 30
  fi
done
