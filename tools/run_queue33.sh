#!/bin/bash
# Round-3 queue 33: fourth-wipe recovery rerun of queue 32's two
# reference-best-recipe (cosine) cells — the wipe killed queue 32
# before either started. Gated on the post-wipe bench.py cache rewarm
# releasing the chip (its log ends with the one-line JSON):
#   1. MNISTISEG N3K1 cosine 10ep — step-decay 0.947 vs reference best
#      0.955; cosine was +0.020 on N3K3, so this aims to BEAT the cell
#   2. OMNIISEG N3K3 cosine 10ep — step-decay 0.935, curve still rising
# Same tunnel mitigations as queues 28-32.
set -u
cd /root/repo
LOG_DIR=/tmp/queue_logs
mkdir -p "$LOG_DIR"
export FGN_CKPT_EVERY=50
export FGN_NO_FEED_THREAD=1
export FGN_STACK_DUMP_S=180

echo "waiting for the bench rewarm to release the chip…"
while ! grep -q '"metric"' /tmp/queue_logs/bench_warm.log 2>/dev/null; do
  sleep 60
done
echo "chip free $(date -u)"
sleep 60

setsid python tools/stall_nudge.py "$LOG_DIR/n3k1_cosine.log" \
  > "$LOG_DIR/nudge_n3k1c.log" 2>&1 &
N1=$!
FGN_STACK_DUMP_FILE="$LOG_DIR/n3k1_cosine.stacks" \
python tools/watchdog.py "$LOG_DIR/n3k1_cosine.log" 2700 -- \
  python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n3k1_cosine.py
echo "=== n3k1 cosine rc=$? $(date -u) ==="
kill "$N1" 2>/dev/null
sleep 30

setsid python tools/stall_nudge.py "$LOG_DIR/omni_cosine.log" \
  > "$LOG_DIR/nudge_omnic.log" 2>&1 &
N2=$!
FGN_STACK_DUMP_FILE="$LOG_DIR/omni_cosine.stacks" \
python tools/watchdog.py "$LOG_DIR/omni_cosine.log" 2700 -- \
  python -m fgn_tpu.main fgn_tpu/configs/fgn_train_omniiseg_cosine.py
echo "=== omni cosine rc=$? $(date -u) ==="
kill "$N2" 2>/dev/null

echo "=== QUEUE33 DONE $(date -u) ==="
