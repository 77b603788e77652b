"""RSS-relief restart contract: Runner exit code + watchdog resume.

The axon tunnel client leaks every host->device upload (RESULTS.md
"Host-memory"); the Runner converts the eventual OOM kill into a
planned exit-42 at a checkpoint boundary and the watchdog must restart
that code without consuming its real-failure budget."""

import os
import sys

import pytest

from fgn_tpu.train import loop as loop_mod
from tools.watchdog import supervise


class _Runner(loop_mod.Runner):
    def __init__(self):  # bypass full construction
        self.tb = None

        class _Ckpt:
            waited = False

            def wait(self):
                self.waited = True

        self.ckpt = _Ckpt()
        self.step = 123


def test_rss_relief_exits_42_over_limit(monkeypatch):
    r = _Runner()
    codes = []
    monkeypatch.setattr(loop_mod.os, "_exit", lambda c: codes.append(c))
    monkeypatch.setenv("FGN_MAX_RSS_GB", "0.001")
    r._rss_relief()
    assert codes == [loop_mod.Runner.RSS_RELIEF_EXIT_CODE] == [42]
    assert r.ckpt.waited, "must flush the async checkpoint before exiting"


@pytest.mark.parametrize("limit", ["0", "-1", "100000"])
def test_rss_relief_noop(monkeypatch, limit):
    r = _Runner()
    monkeypatch.setattr(
        loop_mod.os, "_exit",
        lambda c: (_ for _ in ()).throw(AssertionError("must not exit")),
    )
    monkeypatch.setenv("FGN_MAX_RSS_GB", limit)
    r._rss_relief()  # disabled (<=0) or far above current RSS


def test_watchdog_resumes_planned_exit_42(tmp_path):
    """Exit 42 twice then succeed: the watchdog must ride through both
    planned restarts (a real failure would stop after one retry)."""
    counter = tmp_path / "count"
    script = tmp_path / "job.sh"
    script.write_text(
        "#!/bin/bash\n"
        f"n=$(cat {counter} 2>/dev/null || echo 0)\n"
        f"echo $((n+1)) > {counter}\n"
        "echo attempt $n\n"
        "[ $n -ge 2 ] && exit 0\n"
        "exit 42\n"
    )
    script.chmod(0o755)
    rc = supervise([str(script)], str(tmp_path / "log"), stall_s=60, poll_s=0)
    assert rc == 0
    assert counter.read_text().strip() == "3"


def test_watchdog_still_bounds_real_failures(tmp_path):
    script = tmp_path / "bad.sh"
    script.write_text("#!/bin/bash\nexit 7\n")
    script.chmod(0o755)
    rc = supervise([str(script)], str(tmp_path / "log"), stall_s=60, poll_s=0)
    assert rc == 7
