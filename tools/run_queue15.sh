#!/bin/bash
# Round-3 queue 15: complete the reference's full 3x3 FT grid
# (gamma {0.1,0.05,0.01} x NK {N1K1,N3K1,N3K3} — main_ft.py:54-137).
# After queues 13/14 the only missing MNIST cells are N3K1/N1K1 at
# gamma {0.05, 0.01}. The N3K1 stage-1 checkpoint was lost in the
# mid-round wipe (runs/mnistiseg_n3k1_b8 has only archived tb), so the
# 4-epoch b8 recipe is rebuilt first — same init recipe as the executed
# gamma0.1 cell, keeping the row internally comparable.
# Ends with a bench.py pass to warm .jax_cache for the driver's
# end-of-round measurement.
#
#   KILL_BY=<epoch> bash tools/run_queue15.sh
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

# --- N3K1 stage-1 rebuild (FT init; checkpoints lost in the wipe) ---
if [ ! -d runs/mnistiseg_n3k1_b8/checkpoints ]; then
  run n3k1_b8_rebuild python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n3k1_b8.py
fi
ln -sfn mnistiseg_n3k1_b8 runs/mnistiseg_n3k3_adam_N3K1

# --- remaining FT grid cells (gamma x NK) ---
run ft_n3k1_g005 python -m fgn_tpu.main_ft fgn_tpu/configs/fgn_ft_mnistiseg.py --gammas 0.05 --nks 3x1
run ft_n3k1_g001 python -m fgn_tpu.main_ft fgn_tpu/configs/fgn_ft_mnistiseg.py --gammas 0.01 --nks 3x1
run ft_n1k1_g005 python -m fgn_tpu.main_ft fgn_tpu/configs/fgn_ft_mnistiseg.py --gammas 0.05 --nks 1x1
run ft_n1k1_g001 python -m fgn_tpu.main_ft fgn_tpu/configs/fgn_ft_mnistiseg.py --gammas 0.01 --nks 1x1

# --- N1K1 extended schedule (the lever that closed N3K1) ---
run n1k1_8ep python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n1k1_8ep.py

# --- warm .jax_cache for the driver's end-of-round bench ---
run bench python bench.py

echo "=== QUEUE15 DONE $(date -u) rc=$RC ==="
