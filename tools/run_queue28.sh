#!/bin/bash
# Round-3 queue 28: replaces queue 27. Since the VM restart the axon
# tunnel hangs an upload RPC a few minutes into every training attempt
# (3/3 attempts froze at ~it50-100 with threads in futex/socket wait,
# nothing new compiling), and with no checkpoint before the first
# epoch boundary the stall-kill+resume cycle made no progress. Changes:
#   - FGN_CKPT_EVERY=50: checkpoint-only saves every 50 steps bound the
#     lost work per hang (train/loop.py)
#   - tools/stall_nudge.py (phase-aware) detects step-loop hangs in
#     ~8 min instead of the watchdog's 45
#   - stage-1 guard checks for an actual checkpoint, not just the dir
set -u
cd /root/repo
LOG_DIR=/tmp/queue_logs
mkdir -p "$LOG_DIR"
export FGN_CKPT_EVERY=50
export FGN_NO_FEED_THREAD=1
export FGN_STACK_DUMP_S=180

if [ -z "$(ls runs/coco2voc_synth/checkpoints 2>/dev/null)" ]; then
  rm -rf runs/coco2voc_synth   # partial TB from killed attempts
  python tools/watchdog.py "$LOG_DIR/coco2voc_synth_rebuild.log" 2700 -- \
    python -m fgn_tpu.main fgn_tpu/configs/fgn_train_coco2voc_synth.py
  echo "=== stage-1 rebuild rc=$? $(date -u) ==="
  sleep 15
fi

python tools/watchdog.py "$LOG_DIR/coco2voc_ft_g001.log" 2700 -- \
  python -m fgn_tpu.main_ft fgn_tpu/configs/fgn_ft_coco2voc_synth.py \
    --gammas 0.01 --nks 3x3
echo "=== FT gamma0.01 rc=$? $(date -u) ==="
sleep 15

timeout 5400 python -m pytest tests/ -q > "$LOG_DIR/pytest_full.log" 2>&1
echo "=== pytest rc=$? $(date -u) ==="
sleep 10

timeout 3600 python __graft_entry__.py > "$LOG_DIR/dryrun.log" 2>&1
echo "=== dryrun rc=$? $(date -u) ==="

echo "=== QUEUE28 DONE $(date -u) ==="
