#!/bin/bash
# Round-3 queue 22: tunnel-outage recovery. Poll the axon tunnel until
# a trivial device op succeeds, then (1) finish the COCO2VOC FT
# gamma=0.01 cell, (2) snapshot bench.py on the idle chip.
set -u
cd /root/repo
LOG_DIR=/tmp/queue_logs
mkdir -p "$LOG_DIR"

echo "polling tunnel…"
while true; do
  if timeout 90 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
jax.devices()
assert float(jnp.ones((128, 128)).sum()) == 16384.0
EOF
  then
    echo "tunnel up $(date -u)"
    break
  fi
  sleep 120
done

python tools/watchdog.py "$LOG_DIR/coco2voc_ft_synth_grid.log" 2700 -- \
  python -m fgn_tpu.main_ft fgn_tpu/configs/fgn_ft_coco2voc_synth.py \
    --gammas 0.01 --nks 3x3
sleep 15

python bench.py > /tmp/bench_r3_snapshot.json 2>/tmp/bench_r3_snapshot.err

echo "=== QUEUE22 DONE $(date -u) ==="
