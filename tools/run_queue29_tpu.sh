#!/bin/bash
# Round-3 queue 29 (TPU lane): the stage-1 rebuild + FT gamma0.01 cell,
# with every tunnel mitigation on:
#   FGN_CKPT_EVERY=50       checkpoint-only saves bound lost work
#   FGN_NO_FEED_THREAD=1    single-threaded tunnel use
#   FGN_STACK_DUMP_S=180    periodic all-thread stacks → SIDECAR file
#     (FGN_STACK_DUMP_FILE; dumps into the main log would refresh its
#     mtime and blind the watchdog/nudger liveness checks — observed)
# plus the phase-aware stall nudger running alongside. Starts after a
# tunnel cool-down (the remote end was wedging step executions; killed
# sessions seem to degrade it further, so give it idle time to reap).
set -u
cd /root/repo
LOG_DIR=/tmp/queue_logs
mkdir -p "$LOG_DIR"
export FGN_CKPT_EVERY=50
export FGN_NO_FEED_THREAD=1
export FGN_STACK_DUMP_S=180

sleep "${FGN_COOLDOWN_S:-300}"

# Stage-1 runs unconditionally: resume from the last checkpoint is
# cheap (completed epochs never replay), and a run whose final
# fresh-support eval was interrupted still needs that pass + tables.
FGN_STACK_DUMP_FILE="$LOG_DIR/coco2voc_synth_rebuild.stacks" \
python tools/watchdog.py "$LOG_DIR/coco2voc_synth_rebuild.log" 2700 -- \
  python -m fgn_tpu.main fgn_tpu/configs/fgn_train_coco2voc_synth.py
echo "=== stage-1 rebuild rc=$? $(date -u) ==="
sleep 15

FGN_STACK_DUMP_FILE="$LOG_DIR/coco2voc_ft_g001.stacks" \
python tools/watchdog.py "$LOG_DIR/coco2voc_ft_g001.log" 2700 -- \
  python -m fgn_tpu.main_ft fgn_tpu/configs/fgn_ft_coco2voc_synth.py \
    --gammas 0.01 --nks 3x3
echo "=== FT gamma0.01 rc=$? $(date -u) ==="

echo "=== QUEUE29-TPU DONE $(date -u) ==="
