"""Checkpoint save/restore via orbax.

Reference behaviour kept (SURVEY.md §5.4): per-epoch checkpoints with
optimizer state and bounded retention (max_keep), additional mid-epoch
checkpoints, resume restores (params, opt_state, step, epoch), plus the
dataset iterator state (which the reference stubbed)."""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, work_dir: str, max_keep: int = 3):
        self.dir = os.path.abspath(os.path.join(work_dir, "checkpoints"))
        os.makedirs(self.dir, exist_ok=True)
        self.mngr = ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_keep, create=True, enable_async_checkpointing=True
            ),
        )

    def save(self, step: int, params, opt_state, extra: Optional[Dict[str, Any]] = None):
        state = {
            "params": params,
            "opt_state": opt_state,
            "extra": extra or {},
        }
        self.mngr.save(step, args=ocp.args.StandardSave(state))

    def restore(self, step: Optional[int] = None, template=None):
        step = step if step is not None else self.mngr.latest_step()
        if step is None:
            return None
        if template is not None:
            restored = self.mngr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        else:
            restored = self.mngr.restore(step)
        return step, restored

    def latest_step(self) -> Optional[int]:
        return self.mngr.latest_step()

    def wait(self):
        self.mngr.wait_until_finished()

    def close(self):
        self.mngr.wait_until_finished()
        self.mngr.close()
