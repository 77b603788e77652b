#!/bin/bash
# Round-4 queue 38 (VERDICT r3 items 1, 2, 4, 5):
#   0. gate on the running COCO2VOC FT gamma0.01 watchdog (queue37's
#      orphaned child) finishing and releasing the chip
#   1. device profile capture of the bench inference + train graphs
#      (tools/profile_device.py; tolerated failure — axon may not
#      support jax.profiler)
#   2. MNIST stage-1 rebuilds for the FT grid bases (checkpoints were
#      wiped): n3k3_adam, n3k1_b8, n1k1_adam2 — these also validate the
#      round-4 pre-built support banks in production
#   3. FT grid headline cells at the reference batch 4 (B4 protocol):
#      N3K3 g0.05, N3K1 g0.01, N1K1 g0.1
#   4. frozen-pretrained pipeline: dclpre (2ep, densecl arch) →
#      export .pth stand-in → frozen run (3ep)
# ADVICE r3 fixes baked in: every stage captures its rc and gates its
# dependents on BOTH rc==0 AND an on-disk artifact (checkpoint dir);
# waits poll for process liveness via explicit pids, not log greps.
set -u
cd /root/repo
LOG_DIR=/tmp/queue_logs
mkdir -p "$LOG_DIR"
export FGN_CKPT_EVERY=200
export FGN_STACK_DUMP_S=180
export FGN_WD_COOLDOWN_S=300

FT_WD_PID=${FT_WD_PID:-5613}
echo "waiting for the FT gamma0.01 watchdog (pid $FT_WD_PID)…"
while kill -0 "$FT_WD_PID" 2>/dev/null; do sleep 60; done
echo "chip free $(date -u)"
if [ -f runs/coco2voc_ft_synth/N3K3_G0.01/FT_DONE ]; then
  echo "FT gamma0.01 cell COMPLETE"
else
  echo "WARNING: FT gamma0.01 cell did not complete (no FT_DONE marker)"
fi
sleep 60

# -- 0b. host episode-pipeline benchmark on the idle host ---------------
# First invocation builds the MNISTISEG N3K3 support bank (one-time
# datagen cost, disk-cached); the second is the VERDICT item-2
# cold-start measurement (fresh process, banks on disk).
timeout 1800 python tools/host_bench.py 100 --n3k3 \
  > "$LOG_DIR/host_bench_build.log" 2>&1
echo "=== host_bench bank-build pass rc=$? $(date -u) ==="
timeout 900 python tools/host_bench.py 200 --n3k3 \
  > "$LOG_DIR/host_bench_cold.log" 2>&1
echo "=== host_bench cold rc=$? $(date -u) ==="

# -- 1. device profile (best-effort, ~10 min) ---------------------------
timeout 1800 python tools/profile_device.py --out runs/profile_infer \
  > "$LOG_DIR/profile_infer.log" 2>&1
echo "=== profile infer rc=$? $(date -u) ==="
timeout 1800 python tools/profile_device.py --train --out runs/profile_train \
  > "$LOG_DIR/profile_train.log" 2>&1
echo "=== profile train rc=$? $(date -u) ==="
sleep 15

# -- helpers ------------------------------------------------------------
train_run() {  # train_run <name> <workdir-to-verify> <cmd…>
  local name="$1" ckdir="$2"; shift 2
  setsid python tools/stall_nudge.py "$LOG_DIR/$name.log" \
    > "$LOG_DIR/nudge_$name.log" 2>&1 &
  local nudge=$!
  FGN_STACK_DUMP_FILE="$LOG_DIR/$name.stacks" \
  python tools/watchdog.py "$LOG_DIR/$name.log" 2700 -- "$@"
  local rc=$?
  kill "$nudge" 2>/dev/null
  sleep 15
  if [ "$rc" -ne 0 ] || [ ! -d "$ckdir/checkpoints" ]; then
    echo "=== $name FAILED rc=$rc (ckpts: $([ -d "$ckdir/checkpoints" ] && echo yes || echo no)) $(date -u) ==="
    return 1
  fi
  echo "=== $name ok $(date -u) ==="
  return 0
}

# -- 2. stage-1 rebuilds + 3. their B4 FT cells -------------------------
if train_run n3k3_adam runs/mnistiseg_n3k3_adam \
    python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n3k3_adam.py; then
  train_run ft_b4_n3k3 runs/mnistiseg_ft/N3K3_G0.05 \
    python -m fgn_tpu.main_ft fgn_tpu/configs/fgn_ft_mnistiseg.py \
      --gammas 0.05 --nks 3x3
fi

if train_run n3k1_b8 runs/mnistiseg_n3k1_b8 \
    python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n3k1_b8.py; then
  ln -sfn mnistiseg_n3k1_b8 runs/mnistiseg_n3k3_adam_N3K1
  train_run ft_b4_n3k1 runs/mnistiseg_ft/N3K1_G0.01 \
    python -m fgn_tpu.main_ft fgn_tpu/configs/fgn_ft_mnistiseg.py \
      --gammas 0.01 --nks 3x1
fi

if train_run n1k1_adam2 runs/mnistiseg_n1k1_adam2 \
    python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n1k1_adam.py; then
  ln -sfn mnistiseg_n1k1_adam2 runs/mnistiseg_n3k3_adam_N1K1
  train_run ft_b4_n1k1 runs/mnistiseg_ft/N1K1_G0.1 \
    python -m fgn_tpu.main_ft fgn_tpu/configs/fgn_ft_mnistiseg.py \
      --gammas 0.1 --nks 1x1
fi

# -- 4. frozen-pretrained pipeline --------------------------------------
if train_run dclpre runs/mnistiseg_n1k1_dclpre \
    python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n1k1_dclpre.py; then
  mkdir -p data/pretrained
  if python tools/export_pretrained_pth.py runs/mnistiseg_n1k1_dclpre \
      data/pretrained/mnist_dcl_standin.pth \
      > "$LOG_DIR/export_pth.log" 2>&1; then
    echo "=== export_pth ok $(date -u) ==="
    train_run frozen runs/mnistiseg_n1k1_frozen \
      python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n1k1_frozen.py
  else
    echo "=== export_pth FAILED $(date -u) ==="
  fi
fi

echo "=== QUEUE38 DONE $(date -u) ==="
