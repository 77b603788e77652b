#!/bin/bash
# Round-4 queue 39 (end-of-round window): refresh the two remaining
# round-3 headline stage-1 cells on the round-4 code path (support
# banks + RoIAlign rework + one-hot merges): MNISTISEG N3K1 8-epoch
# (round-3 quote 0.947) and OMNIISEG N3K3 8-epoch (round-3 0.935).
# Budget-gated: a run is skipped rather than started if it cannot
# finish before KILL_BY, so the chip is idle for the driver's
# round-end bench.
set -u
cd /root/repo
LOG_DIR=/tmp/queue_logs
mkdir -p "$LOG_DIR"
export FGN_CKPT_EVERY=200
export FGN_STACK_DUMP_S=180
export FGN_WD_COOLDOWN_S=300
KILL_BY=${KILL_BY:?epoch seconds by which the chip must be idle}

run() {
  local name="$1"; shift
  local budget=$(( KILL_BY - $(date +%s) ))
  if [ "$budget" -lt 1500 ]; then
    echo "=== SKIP $name (only ${budget}s left) ==="
    return 1
  fi
  setsid python tools/stall_nudge.py "$LOG_DIR/$name.log" \
    > "$LOG_DIR/nudge_$name.log" 2>&1 &
  local nudge=$!
  timeout -k 60 "$budget" \
    python tools/watchdog.py "$LOG_DIR/$name.log" 2700 -- "$@"
  local rc=$?
  kill "$nudge" 2>/dev/null
  echo "=== $name rc=$rc $(date -u) ==="
  sleep 20
}

run n3k1_8ep python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n3k1_8ep.py
run omni_8ep python -m fgn_tpu.main fgn_tpu/configs/fgn_train_omniiseg_8ep.py
echo "=== QUEUE39 DONE $(date -u) ==="
