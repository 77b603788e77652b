#!/bin/bash
# Round-3 queue 24: inference-path MFU composition + bench batch sweep.
# Waits for queue 23 (FT gamma0.01 cell) to free the chip, then:
#   1. profile_train.py ablations of the TEST path at the production
#      batch: where do the 0.083 s/step (b12) go? (eval minus
#      eval_nms_off = NMS cost, minus eval_mask_off = mask head, and
#      extract = the conv-roofline floor)
#   2. bench.py batch sweep (inference b8/12/16, train b16) — the
#      chip-throughput batch is a free deployment parameter; find the
#      knee so the headline bench runs at the right one.
set -u
cd /root/repo
LOG_DIR=/tmp/queue_logs
mkdir -p "$LOG_DIR"

echo "waiting for queue 23…"
while ! grep -q "QUEUE23 DONE" "$LOG_DIR/queue23.log" 2>/dev/null; do
  sleep 120
done
echo "chip free $(date -u)"

rm -f /tmp/profile_train.jsonl
for v in extract eval eval_nms_off eval_mask_off fwd full; do
  echo "=== profile $v $(date -u) ==="
  PROF_BATCH=12 timeout 1800 python tools/profile_train.py "$v" \
    >> "$LOG_DIR/profile24.log" 2>&1
  echo "profile $v rc=$?"
  sleep 10
done
cp /tmp/profile_train.jsonl "$LOG_DIR/profile24.jsonl" 2>/dev/null

for b in 8 12 16; do
  echo "=== bench B=$b $(date -u) ==="
  BENCH_BATCH=$b BENCH_TRAIN_BATCH=16 timeout 2400 python bench.py \
    > "/tmp/bench_b$b.json" 2>>"$LOG_DIR/bench_sweep.err"
  echo "bench B=$b rc=$?"
  sleep 10
done

echo "=== QUEUE24 DONE $(date -u) ==="
