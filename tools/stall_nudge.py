"""Fast-stall nudger: companion to tools/watchdog.py.

The watchdog's stall threshold must stay above the longest legitimate
silent window (cold eval compiles ~15-20 min), so production runs use
2700 s — but the common tunnel hang (process at 0% CPU forever) then
costs 45 min each time. This helper watches the same log file and,
when it has been silent for longer than the current phase allows,
backdates the log's mtime past the watchdog's threshold so the
watchdog takes its *stall* path immediately (kill + checkpoint resume,
not charged to the failure budget). Backdating rather than killing the
child keeps the watchdog's accounting correct: a direct kill shows up
as a real failure and aborts the run after one retry.

Phase-aware thresholds (the log's last line tells the phase):

- step loop (last line matches ``it<N> loss=`` or a ckpt line): steps
  log every ~50-60 s, so ``fast_s`` (default 480 — above a mid-run
  second-AR-shape train compile) of silence means the tunnel hung;
- anything else (startup, eval passes — the Runner prints an
  ``eval pass starting`` marker, watchdog attempt headers): ``slow_s``
  (default 1500), above the ~15 min cold eval compile, which is also
  log-silent at 0% host CPU and must NOT be killed.

    python tools/stall_nudge.py <log_fp> [fast_s] [slow_s] [watchdog_stall_s]

Run it detached next to a queue; reads only the log file, so it works
across watchdog restarts and queue stages.
"""

from __future__ import annotations

import os
import re
import sys
import time

_STEP_LINE = re.compile(r"(it\d+ loss=|ckpt scheduled at step)")


def _last_line(log_fp: str) -> str:
    try:
        with open(log_fp, "rb") as f:
            f.seek(0, os.SEEK_END)
            size = f.tell()
            f.seek(max(0, size - 4096))
            lines = f.read().decode("utf-8", "replace").strip().splitlines()
        return lines[-1] if lines else ""
    except OSError:
        return ""


def nudge_loop(log_fp: str, fast_s: int = 480, slow_s: int = 1500,
               stall_s: int = 2700, poll_s: int = 30) -> None:
    last_nudge = 0.0
    while True:
        time.sleep(poll_s)
        try:
            mtime = os.path.getmtime(log_fp)
        except OSError:
            continue  # log not created yet (or removed)
        now = time.time()
        quiet = now - mtime
        limit = fast_s if _STEP_LINE.search(_last_line(log_fp)) else slow_s
        # after a nudge the watchdog restarts the child, whose first
        # compile can be silent ~5 min; don't re-nudge inside that
        if quiet > limit and now - last_nudge > limit + 600:
            os.utime(log_fp, (now, now - stall_s - poll_s))
            last_nudge = now
            sys.stderr.write(
                f"[stall_nudge] {time.ctime()}: {quiet:.0f}s quiet "
                f"(limit {limit}s) on {log_fp} — backdated mtime for "
                f"the watchdog\n")
            sys.stderr.flush()


if __name__ == "__main__":
    args = sys.argv[1:]
    nudge_loop(args[0],
               int(args[1]) if len(args) > 1 else 480,
               int(args[2]) if len(args) > 2 else 1500,
               int(args[3]) if len(args) > 3 else 2700)
