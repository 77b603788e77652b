#!/bin/bash
# Round-3 queue 9: takes over from queue8. Retries the N3K1 FT grid
# cell — queue8's attempt crashed at step 0 because main_ft.py applied
# the reference batch heuristic (N3K1 -> 10), the exact geometry that
# kills the TPU worker (HBM exhaustion; see RESULTS.md). The heuristic
# is now capped at 8 for N3K1. N1K1 stage-1 is a stretch goal.
#
#   bash tools/run_queue9.sh <queue8_shell_pid>
set -u
cd /root/repo
LOG_DIR=/tmp/queue_logs
mkdir -p "$LOG_DIR"
LAST_START=${LAST_START:-1786999800}   # 20:50 UTC — runs must finish by ~21:20
KILL_BY=${KILL_BY:-1787000900}         # 21:08 UTC — hard wall so the chip is
                                       # idle before the driver's bench.py
                                       # (round-2's bench was polluted by a
                                       # concurrent training process)
RC=0

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  echo "queue9: waiting for pid $WAIT_PID (queue8) ..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "queue9: pid $WAIT_PID exited at $(date -u +%H:%M:%S)"
  sleep 45
fi

run() {
  local name="$1"; shift
  if [ "$(date +%s)" -gt "$LAST_START" ]; then
    echo "=== $(date -u +%H:%M:%S) SKIP $name (past deadline) ==="
    RC=125
    return
  fi
  echo "=== $(date -u +%H:%M:%S) START $name ==="
  local budget=$(( KILL_BY - $(date +%s) ))
  if [ "$budget" -lt 120 ]; then
    echo "=== SKIP $name (under 120s to KILL_BY) ==="
    RC=125
    return
  fi
  timeout -k 60 "$budget" python tools/watchdog.py "$LOG_DIR/$name.log" 1500 -- "$@"
  RC=$?
  echo "=== $(date -u +%H:%M:%S) END $name rc=$RC ==="
  sleep 45
}

run ft_n3k1c python -m fgn_tpu.main_ft fgn_tpu/configs/fgn_ft_mnistiseg.py --gammas 0.1 --nks 3x1
run n1k1_adam python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n1k1_adam.py

echo "=== QUEUE9 DONE $(date -u) ==="
