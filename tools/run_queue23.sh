#!/bin/bash
# Round-3 queue 23: mid-round disk-wipe recovery (runs/ + data/ +
# .jax_cache vanished; session restarted). Order:
#   0. wait for the dataset regeneration (started separately) to finish
#   1. bench.py snapshot — re-warms the persistent compile cache so the
#      driver's end-of-round bench doesn't pay the ~26-min cold compile
#   2. rebuild the COCO2VOC synth stage-1 checkpoint (FT init)
#   3. the last missing gamma-row cell: FT gamma=0.01 (children, N3K3)
set -u
cd /root/repo
LOG_DIR=/tmp/queue_logs
mkdir -p "$LOG_DIR"

echo "waiting for dataset regeneration…"
while ! grep -q "DATAGEN DONE" "$LOG_DIR/datagen.log" 2>/dev/null; do
  sleep 60
done
echo "datasets ready $(date -u)"

python bench.py > /tmp/bench_r3_snapshot.json 2>/tmp/bench_r3_snapshot.err
echo "=== bench snapshot rc=$? $(date -u) ==="
sleep 15

if [ ! -d runs/coco2voc_synth/checkpoints ]; then
  python tools/watchdog.py "$LOG_DIR/coco2voc_synth_rebuild.log" 2700 -- \
    python -m fgn_tpu.main fgn_tpu/configs/fgn_train_coco2voc_synth.py
  echo "=== stage-1 rebuild rc=$? $(date -u) ==="
  sleep 15
fi

python tools/watchdog.py "$LOG_DIR/coco2voc_ft_g001.log" 2700 -- \
  python -m fgn_tpu.main_ft fgn_tpu/configs/fgn_ft_coco2voc_synth.py \
    --gammas 0.01 --nks 3x3
echo "=== FT gamma0.01 rc=$? $(date -u) ==="

echo "=== QUEUE23 DONE $(date -u) ==="
