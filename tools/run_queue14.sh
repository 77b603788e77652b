#!/bin/bash
# Round-3 queue 14 (stretch, launched only if queue 13 finishes with
# chip budget left): extended-schedule stage-1 cells. The N3K1 cell
# proved the doubled-recipe lever closes the deformed-glyph gap
# (0.674 -> 0.947 vs reference 0.955); these run the same lever on the
# two remaining flagship cells, then a bench.py pass warms .jax_cache
# for the driver's end-of-round measurement.
#
#   KILL_BY=<epoch> bash tools/run_queue14.sh
set -u
cd /root/repo
LOG_DIR=/tmp/queue_logs
mkdir -p "$LOG_DIR"
KILL_BY=${KILL_BY:?set KILL_BY to the epoch second the chip must be idle}
RC=0

run() {
  local name="$1"; shift
  local budget=$(( KILL_BY - $(date +%s) ))
  if [ "$budget" -lt 300 ]; then
    echo "=== $(date -u +%H:%M:%S) SKIP $name (under 300s to KILL_BY) ==="
    RC=125
    return 1
  fi
  echo "=== $(date -u +%H:%M:%S) START $name (budget ${budget}s) ==="
  timeout -k 60 "$budget" python tools/watchdog.py "$LOG_DIR/$name.log" 1500 -- "$@"
  RC=$?
  echo "=== $(date -u +%H:%M:%S) END $name rc=$RC ==="
  sleep 30
}

run n3k3_8ep python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n3k3_8ep.py
run omni_8ep python -m fgn_tpu.main fgn_tpu/configs/fgn_train_omniiseg_8ep.py

echo "=== QUEUE14 DONE $(date -u) rc=$RC ==="
