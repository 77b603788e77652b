#!/bin/bash
# Round-3 queue 20 (after queue 19): the reference's BEST N3K3 recipe
# (Adam lr .01 wd 5e-5, cosine min_lr_ratio .01, 10 epochs) — the one
# published schedule shape we had not mirrored (step-decay cells top
# out at 0.951 vs the reference's 0.985).
set -u
cd /root/repo
LOG_DIR=/tmp/queue_logs
mkdir -p "$LOG_DIR"

if [ -f /tmp/queue19.pid ] && kill -0 "$(cat /tmp/queue19.pid)" 2>/dev/null; then
  echo "waiting on queue19 (pid $(cat /tmp/queue19.pid))"
  while kill -0 "$(cat /tmp/queue19.pid)" 2>/dev/null; do sleep 60; done
fi

if [ ! -d runs/mnistiseg_n3k3_cosine/checkpoints ]; then
  python tools/watchdog.py "$LOG_DIR/mnistiseg_n3k3_cosine.log" 2700 -- \
    python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n3k3_cosine.py
fi

echo "=== QUEUE20 DONE $(date -u) ==="
