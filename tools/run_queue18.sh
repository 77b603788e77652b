#!/bin/bash
# Round-3 queue 18: COCO2VOC scratch All-NK study on the synthetic
# stand-in (reference graphs/COCO2VOC_Scratch_All_NK: N1K1, N3K1, N3K3,
# N6K5 — N3K3 already ran as runs/coco2voc_synth). Waits out the
# resumed FT run first (one chip, one host core).
set -u
cd /root/repo
LOG_DIR=/tmp/queue_logs
mkdir -p "$LOG_DIR"

if [ -f /tmp/c2vft.pid ] && kill -0 "$(cat /tmp/c2vft.pid)" 2>/dev/null; then
  echo "waiting on resumed FT (pid $(cat /tmp/c2vft.pid))"
  while kill -0 "$(cat /tmp/c2vft.pid)" 2>/dev/null; do sleep 60; done
fi

for nk in n1k1 n3k1 n6k5; do
  if [ ! -d "runs/coco2voc_synth_${nk}/checkpoints" ]; then
    python tools/watchdog.py "$LOG_DIR/coco2voc_synth_${nk}.log" 2700 -- \
      python -m fgn_tpu.main "fgn_tpu/configs/fgn_train_coco2voc_synth_${nk}.py"
    sleep 15
  fi
done

echo "=== QUEUE18 DONE $(date -u) ==="
