#!/bin/bash
# Round-3 queue 17: the gradient-accumulation study (the reference's
# CumIters experiment, graphs/MNISTISEG_N3_K3 Experiments_CumIters:
# curves for CumIters {1,2,3,5} with LR scaled by the accumulation
# factor; 1-3 track each other, 5 falls badly). CumIters-1 is the
# existing N3K3 Adam cell (runs/mnistiseg_n3k3_adam, RESULTS.md); this
# queue runs the 2/3/5 points, then a bench pass to warm .jax_cache
# for the driver's end-of-round measurement. Runs after queue16.
set -u
cd /root/repo
LOG_DIR=/tmp/queue_logs
mkdir -p "$LOG_DIR"

if [ -f /tmp/queue16.pid ] && kill -0 "$(cat /tmp/queue16.pid)" 2>/dev/null; then
  echo "waiting on queue16 (pid $(cat /tmp/queue16.pid))"
  while kill -0 "$(cat /tmp/queue16.pid)" 2>/dev/null; do sleep 60; done
fi
sleep 30

for k in 2 3 5; do
  python tools/watchdog.py "$LOG_DIR/n3k3_cum$k.log" 1800 -- \
    python -m fgn_tpu.main "fgn_tpu/configs/fgn_train_mnistiseg_n3k3_cum$k.py"
  sleep 30
done

python bench.py > "$LOG_DIR/bench_warm.log" 2>&1

echo "=== QUEUE17 DONE $(date -u) ==="
