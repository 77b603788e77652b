#!/bin/bash
# Round-3 quality-grid queue (VERDICT round-2 items 2+3): retrain the
# stage-1 cells (all round-2 checkpoints were lost with the VM disk —
# only TB logs were committed), then the FT grid under the children
# protocol, the N3K1 LR sweep, and the plain-detector calibration run.
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
run n3k3_adam   python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n3k3_adam.py
run n3k1_adam   python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n3k1_adam.py
run omni_adam   python -m fgn_tpu.main fgn_tpu/configs/fgn_train_omniiseg_adam.py
# FT cells (children scenario, fgn_ft_mnistiseg.py): gamma 0.1 re-run
# under the protocol-true scenario + the untouched gamma=0.05 cell.
run ft_mnist    python -m fgn_tpu.main_ft fgn_tpu/configs/fgn_ft_mnistiseg.py --gammas 0.1,0.05 --nks 3x3
# non-N3K3 FT cell: init from the N3K1 stage-1 checkpoint
ln -sfn /root/repo/runs/mnistiseg_n3k1_adam /root/repo/runs/mnistiseg_n3k3_adam_N3K1
run ft_n3k1     python -m fgn_tpu.main_ft fgn_tpu/configs/fgn_ft_mnistiseg.py --gammas 0.1 --nks 3x1
run ft_omni     python -m fgn_tpu.main_ft fgn_tpu/configs/fgn_ft_omniiseg.py --gammas 0.1 --nks 3x3
run n3k1_lrlow  python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n3k1_lr_low.py
run n3k1_lrhigh python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n3k1_lr_high.py
run frcnn       python -m fgn_tpu.main fgn_tpu/configs/frcnn_mnistiseg.py
run ft_mnist001 python -m fgn_tpu.main_ft fgn_tpu/configs/fgn_ft_mnistiseg.py --gammas 0.01 --nks 3x3
echo "=== QUEUE5 DONE $(date -u) ==="
