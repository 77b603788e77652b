#!/bin/bash
# Round-3 queue 10: the N3K1 FT grid cell, unblocked by the
# support-pool fallback fix (episodic.py get_support — the K=1 novel
# cat with a single greedy-selected instance emptied the post-exclusion
# pool and killed the cell at step 0 in queues 8/9). Relaunched once the
# round proved to still be alive past the queue9 deadline estimate.
#
#   KILL_BY=<epoch> bash tools/run_queue10.sh
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
    return
  fi
  echo "=== $(date -u +%H:%M:%S) START $name (budget ${budget}s) ==="
  timeout -k 60 "$budget" python tools/watchdog.py "$LOG_DIR/$name.log" 1500 -- "$@"
  RC=$?
  echo "=== $(date -u +%H:%M:%S) END $name rc=$RC ==="
  sleep 30
}

run ft_n3k1d python -m fgn_tpu.main_ft fgn_tpu/configs/fgn_ft_mnistiseg.py --gammas 0.1 --nks 3x1
# Stretch: N3K1 extended schedule (trajectory still steeply rising at
# 4 epochs; reference best 0.955) — only if hours remain.
run n3k1_8ep python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n3k1_8ep.py

echo "=== QUEUE10 DONE $(date -u) rc=$RC ==="
