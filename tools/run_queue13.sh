#!/bin/bash
# Round-3 queue 13: post-wipe rebuild + remaining grid/study cells.
# The driver restart wiped runs/ + data/ (datasets regenerated first,
# see CLAUDE.md), so the stage-1 checkpoints every FT cell initializes
# from must be re-trained before the FT cells can run. Order = value:
# stage-1 rebuilds (grid rows themselves), the missing FT cells
# (N1K1 row, MNIST gamma0.01, OMNI gamma0.05), the N1K1 optimizer
# sweep (the unreproduced reference study table), the N3K3 BN norm
# ablation, then stretch cells (OMNI gamma0.01, WD variants).
#
#   KILL_BY=<epoch> bash tools/run_queue13.sh
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
    return 1
  fi
  echo "=== $(date -u +%H:%M:%S) START $name (budget ${budget}s) ==="
  timeout -k 60 "$budget" python tools/watchdog.py "$LOG_DIR/$name.log" 1500 -- "$@"
  RC=$?
  echo "=== $(date -u +%H:%M:%S) END $name rc=$RC ==="
  sleep 30
}

# --- stage-1 rebuilds (FT inits + grid rows) ---
run n1k1_adam  python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n1k1_adam.py
# main_ft resolves the N1K1 cell's init as <init_from>_N1K1
ln -sfn mnistiseg_n1k1_adam2 runs/mnistiseg_n3k3_adam_N1K1
run n3k3_adam  python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n3k3_adam.py
run omni_adam  python -m fgn_tpu.main fgn_tpu/configs/fgn_train_omniiseg_adam.py

# --- missing FT grid cells ---
run ft_n1k1       python -m fgn_tpu.main_ft fgn_tpu/configs/fgn_ft_mnistiseg.py --gammas 0.1 --nks 1x1
run ft_mnist_g001 python -m fgn_tpu.main_ft fgn_tpu/configs/fgn_ft_mnistiseg.py --gammas 0.01 --nks 3x3
run ft_omni_g005  python -m fgn_tpu.main_ft fgn_tpu/configs/fgn_ft_omniiseg.py --gammas 0.05 --nks 3x3

# --- N1K1 optimizer sweep (reference graphs/MNISTISEG_N1_K1 table) ---
run n1k1_adam01    python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n1k1_adam01.py
run n1k1_adagrad01 python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n1k1_adagrad01.py
run n1k1_sgd01     python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n1k1_sgd01.py
run n1k1_adadelta01 python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n1k1_adadelta01.py

# --- N3K3 res5-norm ablation ---
run n3k3_bn python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n3k3_bn.py

# --- stretch ---
run ft_omni_g001 python -m fgn_tpu.main_ft fgn_tpu/configs/fgn_ft_omniiseg.py --gammas 0.01 --nks 3x3
run n1k1_adam01_wd5e5 python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n1k1_adam01_wd5e5.py
run n1k1_adagrad01_wd001 python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n1k1_adagrad01_wd001.py

echo "=== QUEUE13 DONE $(date -u) rc=$RC ==="
