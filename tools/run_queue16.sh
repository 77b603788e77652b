#!/bin/bash
# Round-3 queue 16: COCO2VOC end-to-end on the synthetic stand-in data
# (tools/make_synthetic_cocovoc.py). Stage-1 (parents scenario, 8 ep,
# scratch arch — fgn_train_coco2voc_synth.py) then FT (children
# scenario, VOC-trainval novel Select + FT=Use eval —
# fgn_ft_coco2voc_synth.py). Mirrors the reference COCO2VOC protocol
# (fgn_train.py / fgn_ft.py) at the synthetic stand-in scale.
set -u
cd /root/repo
LOG_DIR=/tmp/queue_logs
mkdir -p "$LOG_DIR"

# If a stage-1 watchdog is already running (pid file), wait it out.
if [ -f /tmp/c2v.pid ] && kill -0 "$(cat /tmp/c2v.pid)" 2>/dev/null; then
  echo "waiting on running stage-1 (pid $(cat /tmp/c2v.pid))"
  while kill -0 "$(cat /tmp/c2v.pid)" 2>/dev/null; do sleep 60; done
fi

if [ ! -d runs/coco2voc_synth/checkpoints ]; then
  python tools/watchdog.py "$LOG_DIR/coco2voc_synth.log" 2700 -- \
    python -m fgn_tpu.main fgn_tpu/configs/fgn_train_coco2voc_synth.py
  sleep 30
fi

# FT stage: first eval compile at COCO geometry can exceed 30 min —
# give the stall watchdog 45 min of log silence before kill+resume.
python tools/watchdog.py "$LOG_DIR/coco2voc_ft_synth.log" 2700 -- \
  python -m fgn_tpu.main fgn_tpu/configs/fgn_ft_coco2voc_synth.py

echo "=== QUEUE16 DONE $(date -u) ==="
