#!/bin/bash
# Round-3 queue 6: N3K1 crash bisect + N1K1 stage-1 + the rest of the
# reference FT grid (gamma x NK), after queue5.
set -u
cd /root/repo
LOG_DIR=/tmp/queue_logs
mkdir -p "$LOG_DIR"
RC=0
run() {
  local name="$1"; shift
  echo "=== $(date -u +%H:%M:%S) START $name ==="
  python tools/watchdog.py "$LOG_DIR/$name.log" 1500 -- "$@"
  RC=$?
  echo "=== $(date -u +%H:%M:%S) END $name rc=$RC ==="
}

# --- N3K1 bisect: retry as-is; on crash, batch-8; then jnp RoIAlign ---
run n3k1_retry python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n3k1_adam.py
if [ "$RC" != 0 ]; then
  run n3k1_b8 python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n3k1_b8.py
  if [ "$RC" != 0 ]; then
    run n3k1_jnp python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n3k1_jnp.py
  fi
fi

# --- N1K1 stage-1 (round-3 code; also the FT-grid N1K1 init) ---
run n1k1_adam python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n1k1_adam.py

# --- complete the reference FT grid (main_ft skips existing cells) ---
ln -sfn /root/repo/runs/mnistiseg_n1k1_adam2 /root/repo/runs/mnistiseg_n3k3_adam_N1K1
# N3K1 FT init: whichever bisect variant produced a stage-1 checkpoint
for d in runs/mnistiseg_n3k1_adam runs/mnistiseg_n3k1_b8 runs/mnistiseg_n3k1_jnp; do
  if [ -n "$(ls $d/checkpoints 2>/dev/null)" ]; then
    ln -sfn "/root/repo/$d" /root/repo/runs/mnistiseg_n3k3_adam_N3K1
    break
  fi
done
run ft_grid python -m fgn_tpu.main_ft fgn_tpu/configs/fgn_ft_mnistiseg.py --gammas 0.1,0.05,0.01 --nks 1x1,3x1,3x3

echo "=== QUEUE6 DONE $(date -u) ==="
