#!/bin/bash
# Round-3 queue 19 (after queue 18): COCO2VOC synthetic follow-ups —
#   1. N1K1 LR pair, low cell (reference graphs/COCO2VOC_DCL_N1_K1 LR
#      table: 0.271 @ lr .01 vs 0.151 @ .001);
#   2. FT gamma row completion via the main_ft grid driver (reference
#      COCO2VOC FT curves are published for gamma in {.01,.05,.1};
#      the standalone runs/coco2voc_ft_synth run is the gamma=0.1 cell).
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

python tools/watchdog.py "$LOG_DIR/coco2voc_ft_synth_grid.log" 2700 -- \
  python -m fgn_tpu.main_ft fgn_tpu/configs/fgn_ft_coco2voc_synth.py \
    --gammas 0.05,0.01 --nks 3x3

echo "=== QUEUE19 DONE $(date -u) ==="
