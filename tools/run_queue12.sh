#!/bin/bash
# Round-3 queue 12: finish the FT grid — the N1K1 row (stage-1 init:
# runs/mnistiseg_n1k1_adam2 via the _N1K1 symlink) and the missing
# gamma cells (MNIST gamma0.01 children; OMNI gamma0.05/0.01), closing
# the PARITY "known gaps" FT list.
#
#   KILL_BY=<epoch> bash tools/run_queue12.sh
set -u
cd /root/repo
LOG_DIR=/tmp/queue_logs
mkdir -p "$LOG_DIR"
KILL_BY=${KILL_BY:?set KILL_BY to the epoch second the chip must be idle}
RC=0

run() {
  local name="$1"; shift
  local budget=$(( KILL_BY - $(date +%s) ))
  if [ "$budget" -lt 300 ]; then
    echo "=== $(date -u +%H:%M:%S) SKIP $name (under 300s to KILL_BY) ==="
    RC=125
    return
  fi
  echo "=== $(date -u +%H:%M:%S) START $name (budget ${budget}s) ==="
  timeout -k 60 "$budget" python tools/watchdog.py "$LOG_DIR/$name.log" 1500 -- "$@"
  RC=$?
  echo "=== $(date -u +%H:%M:%S) END $name rc=$RC ==="
  sleep 30
}

run ft_n1k1      python -m fgn_tpu.main_ft fgn_tpu/configs/fgn_ft_mnistiseg.py --gammas 0.1 --nks 1x1
run ft_mnist_g001 python -m fgn_tpu.main_ft fgn_tpu/configs/fgn_ft_mnistiseg.py --gammas 0.01 --nks 3x3
run ft_omni_g005 python -m fgn_tpu.main_ft fgn_tpu/configs/fgn_ft_omniiseg.py --gammas 0.05 --nks 3x3
run ft_omni_g001 python -m fgn_tpu.main_ft fgn_tpu/configs/fgn_ft_omniiseg.py --gammas 0.01 --nks 3x3
# Stretch: the reference Worst/Best table's WD variants
run n1k1_adam01_wd5e5 python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n1k1_adam01_wd5e5.py
run n1k1_adagrad01_wd001 python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n1k1_adagrad01_wd001.py

echo "=== QUEUE12 DONE $(date -u) rc=$RC ==="
