#!/bin/bash
# Phase-4: bench (fixed, chained) then OMNIISEG flagship, FT-omni, N3K1.
set -u
cd /root/repo
LOG_DIR=/tmp/queue_logs
mkdir -p "$LOG_DIR"
run() {
  local name="$1"; shift
  echo "=== $(date -u +%H:%M:%S) START $name ==="
  python tools/watchdog.py "$LOG_DIR/$name.log" 1500 -- "$@"
  local rc=$?
  echo "=== $(date -u +%H:%M:%S) END $name rc=$rc ==="
}
run bench2      python bench.py
run omni_adam   python -m fgn_tpu.main fgn_tpu/configs/fgn_train_omniiseg_adam.py
run ft_omni     python -m fgn_tpu.main_ft fgn_tpu/configs/fgn_ft_omniiseg.py --gammas 0.1 --nks 3x3
run n3k1_adam   python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n3k1_adam.py
run n3k1_lrlow  python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n3k1_lr_low.py
run n3k1_lrhigh python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n3k1_lr_high.py
echo "=== QUEUE4 DONE $(date -u) ==="
