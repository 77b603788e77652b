#!/bin/bash
# Round-3 queue 7 (reprioritized takeover of queue5's tail + queue6).
# Launched while queue5's ft_omni cell is still on the chip: waits for
# that watchdog PID to exit, then runs the remaining quality-grid cells
# in VERDICT-priority order with a wall-clock deadline so the chip is
# idle before the driver's end-of-round bench.py run.
#
#   bash tools/run_queue7.sh <ft_omni_watchdog_pid>
set -u
cd /root/repo
LOG_DIR=/tmp/queue_logs
mkdir -p "$LOG_DIR"
# latest allowed START of a new run (runs take ~35-40 min; hard stop
# for chip use is ~21:15 UTC, round end ~21:25)
LAST_START=${LAST_START:-1786998900}
RC=0

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  echo "queue7: waiting for pid $WAIT_PID (ft_omni) ..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "queue7: pid $WAIT_PID exited at $(date -u +%H:%M:%S)"
  sleep 60   # let the tunnel/TPU worker settle between runs
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

# --- 1. N3K1 stage-1 bisect (TPU worker kernel-fault crash, queue5):
#        retry as-is; on crash, batch-8 geometry; then jnp RoIAlign ---
run n3k1_retry python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n3k1_adam.py
if [ "$RC" != 0 ] && [ "$RC" != 125 ]; then
  run n3k1_b8 python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n3k1_b8.py
  if [ "$RC" != 0 ] && [ "$RC" != 125 ]; then
    run n3k1_jnp python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n3k1_jnp.py
  fi
fi

# --- 2. non-N3K3 FT cell (VERDICT item 2c), init from whichever
#        bisect variant produced a stage-1 checkpoint ---
for d in runs/mnistiseg_n3k1_adam runs/mnistiseg_n3k1_b8 runs/mnistiseg_n3k1_jnp; do
  if [ -n "$(ls $d/checkpoints 2>/dev/null)" ]; then
    ln -sfn "/root/repo/$d" /root/repo/runs/mnistiseg_n3k3_adam_N3K1
    run ft_n3k1 python -m fgn_tpu.main_ft fgn_tpu/configs/fgn_ft_mnistiseg.py --gammas 0.1 --nks 3x1
    break
  fi
done

# --- 3. plain-detector calibration run (VERDICT item 4) ---
run frcnn python -m fgn_tpu.main fgn_tpu/configs/frcnn_mnistiseg.py

# --- 4. N3K1 LR sweep (VERDICT item 2b; mid point = n3k1_adam) ---
run n3k1_lrlow  python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n3k1_lr_low.py
run n3k1_lrhigh python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n3k1_lr_high.py

# --- 5. stretch: N1K1 stage-1 on round-3 code + remaining FT grid ---
run n1k1_adam python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n1k1_adam.py
ln -sfn /root/repo/runs/mnistiseg_n1k1_adam /root/repo/runs/mnistiseg_n3k3_adam_N1K1
run ft_grid python -m fgn_tpu.main_ft fgn_tpu/configs/fgn_ft_mnistiseg.py --gammas 0.1,0.05,0.01 --nks 1x1,3x1,3x3

echo "=== QUEUE7 DONE $(date -u) ==="
