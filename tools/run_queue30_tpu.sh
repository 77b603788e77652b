#!/bin/bash
# Round-3 queue 30 (TPU lane): resume ONLY the COCO2VOC FT gamma0.01
# cell (stage-1 rebuild finished, incl. its final fresh-support eval —
# cached 0.456 / fresh 0.388, RESULTS.md). Same tunnel mitigations as
# queue29: checkpoint-only saves every 50 steps, single-threaded feed,
# sidecar stack dumps, watchdog + phase-aware stall nudger.
set -u
cd /root/repo
LOG_DIR=/tmp/queue_logs
mkdir -p "$LOG_DIR"
export FGN_CKPT_EVERY=50
export FGN_NO_FEED_THREAD=1
export FGN_STACK_DUMP_S=180

sleep "${FGN_COOLDOWN_S:-60}"

FGN_STACK_DUMP_FILE="$LOG_DIR/coco2voc_ft_g001.stacks" \
python tools/watchdog.py "$LOG_DIR/coco2voc_ft_g001.log" 2700 -- \
  python -m fgn_tpu.main_ft fgn_tpu/configs/fgn_ft_coco2voc_synth.py \
    --gammas 0.01 --nks 3x3
echo "=== FT gamma0.01 rc=$? $(date -u) ==="

echo "=== QUEUE30-TPU DONE $(date -u) ==="
