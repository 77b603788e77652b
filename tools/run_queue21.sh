#!/bin/bash
# Round-3 queue 21 (replaces queued 19/20, value-ordered in case the
# round ends mid-queue):
#   1. COCO2VOC N1K1 LR-pair low cell (reference DCL_N1_K1 LR table)
#   2. MNISTISEG N3K3 cosine best-recipe cell (reference 0.985 recipe)
#   3. COCO2VOC FT gamma row completion (gamma 0.05, then 0.01)
set -u
cd /root/repo
LOG_DIR=/tmp/queue_logs
mkdir -p "$LOG_DIR"

if [ -f /tmp/queue18.pid ] && kill -0 "$(cat /tmp/queue18.pid)" 2>/dev/null; then
  echo "waiting on queue18 (pid $(cat /tmp/queue18.pid))"
  while kill -0 "$(cat /tmp/queue18.pid)" 2>/dev/null; do sleep 60; done
fi

if [ ! -d runs/coco2voc_synth_n1k1_lrlow/checkpoints ]; then
  python tools/watchdog.py "$LOG_DIR/coco2voc_synth_n1k1_lrlow.log" 2700 -- \
    python -m fgn_tpu.main fgn_tpu/configs/fgn_train_coco2voc_synth_n1k1_lrlow.py
  sleep 15
fi

if [ ! -d runs/mnistiseg_n3k3_cosine/checkpoints ]; then
  python tools/watchdog.py "$LOG_DIR/mnistiseg_n3k3_cosine.log" 2700 -- \
    python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n3k3_cosine.py
  sleep 15
fi

for g in 0.05 0.01; do
  python tools/watchdog.py "$LOG_DIR/coco2voc_ft_synth_grid.log" 2700 -- \
    python -m fgn_tpu.main_ft fgn_tpu/configs/fgn_ft_coco2voc_synth.py \
      --gammas "$g" --nks 3x3
  sleep 15
done

echo "=== QUEUE21 DONE $(date -u) ==="
