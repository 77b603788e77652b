#!/bin/bash
# Round-3 queue 11: the two reference hyperparameter tables not yet
# reproduced — the N1K1 optimizer sweep (Adadelta/SGD/Adagrad/Adam at
# LR 0.01 / WD 1e-05, notebook table 0.476/0.543/0.649/0.863) and the
# N3K3 res5 GN-vs-BN ablation (0.965 vs 0.919) — then the N3K1
# extended-schedule stretch moved out of queue10.
#
#   KILL_BY=<epoch> bash tools/run_queue11.sh
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

run n1k1_adagrad01 python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n1k1_adagrad01.py
run n1k1_adam01    python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n1k1_adam01.py
run n1k1_sgd01     python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n1k1_sgd01.py
run n1k1_adadelta01 python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n1k1_adadelta01.py
run n3k3_bn        python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n3k3_bn.py
run n3k1_8ep       python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n3k1_8ep.py

echo "=== QUEUE11 DONE $(date -u) rc=$RC ==="
