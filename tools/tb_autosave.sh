#!/bin/bash
# Wipe insurance for in-flight TensorBoard event files: the VM disk can
# vanish mid-round (three wipes so far in round 3) and only committed
# files survive, so two FT gamma cells' TBs were lost before they could
# be archived (RESULTS.md provenance caveat). This loop rsyncs every
# runs/*/tb into runs_archive/${ROUND:-round4}/ and commits the delta on a fixed
# cadence. TB event logs are append-only data, so auto-committing them
# is safe; checkpoints/eval pkls stay gitignored.
set -u
cd /root/repo
INTERVAL="${1:-1800}"
ROUND="${2:-round4}"
while true; do
  sleep "$INTERVAL"
  [ -d runs ] || continue
  for tb in runs/*/tb runs/*/*/tb; do
    [ -d "$tb" ] || continue
    dst="runs_archive/${ROUND:-round4}/${tb#runs/}"
    mkdir -p "$dst"
    cp -r "$tb/." "$dst/" 2>/dev/null || true
  done
  git add -A runs_archive/${ROUND:-round4} 2>/dev/null
  if ! git diff --cached --quiet 2>/dev/null; then
    git commit -q -m "Archive in-flight TB event files (wipe insurance)" || true
  fi
done
