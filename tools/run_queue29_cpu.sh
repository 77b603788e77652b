#!/bin/bash
# Round-3 queue 29 (CPU lane): pytest + multichip dryrun, decoupled from
# the TPU lane (run_queue29_tpu.sh) because the axon tunnel is wedging
# train-step executions (stack dumps: main thread stuck in float() on
# step 0's result). The CPU lane re-warms the test/CPU compile caches
# for the judge and the driver regardless of tunnel health.
set -u
cd /root/repo
LOG_DIR=/tmp/queue_logs
mkdir -p "$LOG_DIR"

timeout 5400 python -m pytest tests/ -q > "$LOG_DIR/pytest_full.log" 2>&1
echo "=== pytest rc=$? $(date -u) ==="
sleep 10

timeout 3600 python __graft_entry__.py > "$LOG_DIR/dryrun.log" 2>&1
echo "=== dryrun rc=$? $(date -u) ==="

echo "=== QUEUE29-CPU DONE $(date -u) ==="
