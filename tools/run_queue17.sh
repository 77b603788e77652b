#!/bin/bash
# Round-3 queue 17: gradient-accumulation validation cell (the
# reference's CumIters-2 study point, graphs/MNISTISEG_N3_K3
# Experiments_CumIters) + a bench pass to warm .jax_cache for the
# driver's end-of-round measurement. Runs after queue16 (COCO2VOC).
set -u
cd /root/repo
LOG_DIR=/tmp/queue_logs
mkdir -p "$LOG_DIR"

if [ -f /tmp/queue16.pid ] && kill -0 "$(cat /tmp/queue16.pid)" 2>/dev/null; then
  echo "waiting on queue16 (pid $(cat /tmp/queue16.pid))"
  while kill -0 "$(cat /tmp/queue16.pid)" 2>/dev/null; do sleep 60; done
fi
sleep 30

python tools/watchdog.py "$LOG_DIR/n3k3_cum2.log" 1800 -- \
  python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n3k3_cum2.py
sleep 30

python bench.py > "$LOG_DIR/bench_warm.log" 2>&1

echo "=== QUEUE17 DONE $(date -u) ==="
