"""Stall-detecting run supervisor (failure detection / elastic
recovery, SURVEY.md §5.3).

The axon TPU tunnel occasionally hangs an RPC forever (observed round 1
on an eval, round 2 on a train step: process blocked in futex_wait at
~0% CPU). The reference's soft-fail try/except can't catch a hang; this
wrapper supervises a training command by its log liveness and restarts
it on stall — the Runner's checkpoint+cursor resume makes the rerun
continue where it left off, so a hang costs at most ``stall_s`` plus
the work since the last checkpoint.

    python tools/watchdog.py <log_fp> [stall_s] -- <command ...>

Also importable: ``supervise(cmd, log_fp, stall_s, max_restarts)``.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time


def supervise(
    cmd,
    log_fp: str,
    stall_s: int = 1500,
    max_restarts: int = 8,
    poll_s: int = 30,
    timeout_s: int = 14400,
    cooldown_s: int | None = None,
) -> int:
    """Run ``cmd`` appending to ``log_fp``; kill + rerun when the log
    goes silent for ``stall_s`` (first compiles can be silent ~8 min,
    eval compiles ~20 — keep stall_s above those). Returns the final
    exit code (0 on success, -1 if restarts are exhausted).

    ``cooldown_s`` (default env FGN_WD_COOLDOWN_S or 300) is slept
    between a stall kill and the restart: the axon tunnel's sickness
    mode re-wedges immediately-restarted sessions sooner and sooner,
    while ~5 idle minutes lets the tunnel recover (observed 2026-08-19,
    recovery recipe in CLAUDE.md). Planned RSS-relief restarts (exit
    42) skip the cool-down — the tunnel is healthy in that path."""
    if cooldown_s is None:
        cooldown_s = int(os.environ.get("FGN_WD_COOLDOWN_S", "300"))
    env = dict(os.environ, PYTHONUNBUFFERED="1")
    current = []
    planned = 0  # RSS-relief restarts (exit 42), bounded separately

    def _forward(signum, frame):
        # a supervisor (e.g. `timeout` in a run queue) terminating us
        # must also end the supervised run — an orphaned training
        # process would keep the chip busy
        for p in current:
            if p.poll() is None:
                p.send_signal(signal.SIGKILL)
        raise SystemExit(128 + signum)

    signal.signal(signal.SIGTERM, _forward)
    attempt = 0
    while attempt < max_restarts:
        with open(log_fp, "ab", buffering=0) as log:
            log.write(
                f"\n=== watchdog attempt {attempt} {time.ctime()} ===\n"
                .encode()
            )
            proc = subprocess.Popen(cmd, stdout=log, stderr=log, env=env)
        current[:] = [proc]
        t_start = time.time()
        stalled = False
        while True:
            rc = proc.poll()
            if rc is not None:
                break
            now = time.time()
            quiet = now - os.path.getmtime(log_fp)
            if quiet > stall_s or now - t_start > timeout_s:
                stalled = True
                with open(log_fp, "ab", buffering=0) as log:
                    log.write(
                        f"=== watchdog: stall ({quiet:.0f}s quiet) — "
                        f"killing pid {proc.pid} ===\n".encode()
                    )
                proc.send_signal(signal.SIGKILL)
                proc.wait()
                break
            time.sleep(poll_s)
        if not stalled and proc.returncode == 0:
            return 0
        if not stalled and proc.returncode == 42:
            # planned RSS-relief restart (Runner._rss_relief: the axon
            # client leaks per-transfer host buffers) — always resume,
            # without consuming the failure budget
            planned += 1
            if planned > 200:
                return proc.returncode
            continue
        if not stalled and proc.returncode not in (None, 0):
            # real failure (traceback in the log): one retry is still
            # useful (transient tunnel errors), but don't loop on a bug
            if attempt >= 1:
                return proc.returncode
        if stalled and cooldown_s > 0:
            with open(log_fp, "ab", buffering=0) as log:
                log.write(
                    f"=== watchdog: tunnel cool-down {cooldown_s}s "
                    f"before restart ===\n".encode()
                )
            time.sleep(cooldown_s)
            # the cool-down itself keeps the log quiet — refresh the
            # mtime so the next attempt gets the full stall budget
            os.utime(log_fp)
        attempt += 1
    return -1


def main():
    args = sys.argv[1:]
    sep = args.index("--")
    pre, cmd = args[:sep], args[sep + 1:]
    log_fp = pre[0]
    stall_s = int(pre[1]) if len(pre) > 1 else 1500
    rc = supervise(cmd, log_fp, stall_s=stall_s)
    print(f"watchdog: final rc={rc}")
    sys.exit(0 if rc == 0 else 1)


if __name__ == "__main__":
    main()
