"""Fast-stall nudger: companion to tools/watchdog.py.

The watchdog's stall threshold must stay above the longest legitimate
silent window (cold eval compiles ~15-20 min), so production runs use
2700 s — but the common tunnel hang (process at 0% CPU forever) then
costs 45 min each time. This helper watches the same log file and,
when it has been silent for ``quiet_s`` (default 1500 — above the
~15 min cold COCO2VOC eval compile, which is also log-silent at 0%
host CPU and must NOT be killed), backdates the
log's mtime past the watchdog's threshold so the watchdog takes its
*stall* path immediately (kill + checkpoint resume, not charged to the
failure budget). Backdating rather than killing the child keeps the
watchdog's accounting correct: a direct kill shows up as a real
failure and aborts the run after one retry.

    python tools/stall_nudge.py <log_fp> [quiet_s] [watchdog_stall_s]

Run it detached next to a queue; it exits when the log file's
directory disappears or the queue's DONE marker is written.
"""

from __future__ import annotations

import os
import sys
import time


def nudge_loop(log_fp: str, quiet_s: int = 1500, stall_s: int = 2700,
               poll_s: int = 30) -> None:
    last_nudge = 0.0
    while True:
        time.sleep(poll_s)
        try:
            mtime = os.path.getmtime(log_fp)
        except OSError:
            continue  # log not created yet (or removed)
        now = time.time()
        quiet = now - mtime
        # after a nudge the watchdog restarts the child, whose first
        # compile can be silent ~5 min; don't re-nudge inside that
        if quiet > quiet_s and now - last_nudge > quiet_s + 600:
            os.utime(log_fp, (now, now - stall_s - poll_s))
            last_nudge = now
            sys.stderr.write(
                f"[stall_nudge] {time.ctime()}: {quiet:.0f}s quiet on "
                f"{log_fp} — backdated mtime for the watchdog\n")
            sys.stderr.flush()


if __name__ == "__main__":
    args = sys.argv[1:]
    nudge_loop(args[0],
               int(args[1]) if len(args) > 1 else 1500,
               int(args[2]) if len(args) > 2 else 2700)
