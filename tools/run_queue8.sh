#!/bin/bash
# Round-3 queue 8: takes over from queue7 after the frcnn calibration
# run. Re-runs the N3K1 FT cell (queue7's attempt crashed at step 0 and
# the retry was silently skipped by the pre-FT_DONE dir-existence check
# — now fixed in main_ft.py), then the N3K1 LR sweep, then stretch.
#
#   bash tools/run_queue8.sh <frcnn_watchdog_pid>
set -u
cd /root/repo
LOG_DIR=/tmp/queue_logs
mkdir -p "$LOG_DIR"
LAST_START=${LAST_START:-1786998900}
RC=0

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  echo "queue8: waiting for pid $WAIT_PID (frcnn) ..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "queue8: pid $WAIT_PID exited at $(date -u +%H:%M:%S)"
  sleep 60
fi

run() {
  local name="$1"; shift
  if [ "$(date +%s)" -gt "$LAST_START" ]; then
    echo "=== $(date -u +%H:%M:%S) SKIP $name (past deadline) ==="
    RC=125
    return
  fi
  echo "=== $(date -u +%H:%M:%S) START $name ==="
  python tools/watchdog.py "$LOG_DIR/$name.log" 1500 -- "$@"
  RC=$?
  echo "=== $(date -u +%H:%M:%S) END $name rc=$RC ==="
  sleep 45
}

ln -sfn /root/repo/runs/mnistiseg_n3k1_b8 /root/repo/runs/mnistiseg_n3k3_adam_N3K1
run ft_n3k1b python -m fgn_tpu.main_ft fgn_tpu/configs/fgn_ft_mnistiseg.py --gammas 0.1 --nks 3x1
run n3k1_lrlow  python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n3k1_lr_low.py
run n3k1_lrhigh python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n3k1_lr_high.py
run n1k1_adam python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n1k1_adam.py

echo "=== QUEUE8 DONE $(date -u) ==="
