"""Checkpoint save/restore via orbax.

Reference behaviour kept (SURVEY.md §5.4): per-epoch checkpoints with
optimizer state and bounded retention (max_keep), additional mid-epoch
checkpoints, resume restores (params, opt_state, step, epoch), plus the
dataset iterator state (which the reference stubbed).

The dataset iterator state (``ds_state``: the epoch order + per-position
AR-group target shapes) is NOT part of the orbax pytree: its structure
varies per epoch (AR-group padding changes the order length, and
square-image datasets have no groups at all), while orbax
StandardRestore requires the restore template's tree structure to match
the checkpoint exactly — a mixed-AR run (COCO2VOC merged FT) could
write a checkpoint that its own resume could not read. It is stored as
a JSON sidecar next to the step directory instead; legacy checkpoints
that carry ds_state inside the pytree are restored through a
structure-grafting fallback (see ``restore``).
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _ds_state_to_jsonable(ds_state: Dict) -> Dict:
    """order (int array) + group_hw ({pos: (h, w)}) -> pure JSON types."""
    out: Dict[str, Any] = {}
    if "order" in ds_state:
        out["order"] = [int(v) for v in np.asarray(ds_state["order"]).ravel()]
    if "group_hw" in ds_state:
        out["group_hw"] = {
            str(int(k)): [int(v[0]), int(v[1])]
            for k, v in dict(ds_state["group_hw"]).items()
        }
    return out


def _ds_state_from_jsonable(blob: Dict) -> Dict:
    out: Dict[str, Any] = {}
    if "order" in blob:
        out["order"] = np.asarray(blob["order"], np.int64)
    if "group_hw" in blob:
        out["group_hw"] = {
            int(k): (int(v[0]), int(v[1])) for k, v in blob["group_hw"].items()
        }
    return out


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

    # -- ds_state sidecar ---------------------------------------------------

    def _sidecar_path(self, step: int) -> str:
        return os.path.join(self.dir, f"ds_state_{int(step)}.json")

    def save_ds_state(self, step: int, ds_state: Dict):
        path = self._sidecar_path(step)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(_ds_state_to_jsonable(ds_state), f)
        os.replace(tmp, path)
        self._prune_sidecars()

    def load_ds_state(self, step: int) -> Optional[Dict]:
        path = self._sidecar_path(step)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return _ds_state_from_jsonable(json.load(f))

    def _prune_sidecars(self):
        """Keep sidecars only for steps the manager still retains."""
        keep = {int(s) for s in self.mngr.all_steps()}
        for path in glob.glob(os.path.join(self.dir, "ds_state_*.json")):
            try:
                step = int(os.path.basename(path)[len("ds_state_"):-len(".json")])
            except ValueError:
                continue
            if keep and step not in keep:
                try:
                    os.remove(path)
                except OSError:
                    pass

    def _legacy_ds_state_template(self, step: int):
        """Placeholder matching the on-disk ``extra.ds_state`` structure
        of a legacy checkpoint (read from orbax's _METADATA file) so a
        StandardRestore template can be grafted to match; None if the
        checkpoint has no in-pytree ds_state."""
        path = os.path.join(self.dir, str(int(step)), "default", "_METADATA")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            meta = json.load(f).get("tree_metadata", {})
        root: Dict = {}
        found = False
        for info in meta.values():
            keys = [
                (k["key"], k.get("key_type", 2)) for k in info["key_metadata"]
            ]
            if len(keys) < 3 or keys[0][0] != "extra" or keys[1][0] != "ds_state":
                continue
            found = True
            vtype = info.get("value_metadata", {}).get("value_type")
            node = root
            for i, (k, kt) in enumerate(keys[2:]):
                kk = int(k) if kt == 1 else k  # key_type 1 = sequence index
                if i == len(keys) - 3:
                    node[kk] = 0 if vtype == "scalar" else np.zeros((1,), np.int64)
                else:
                    node = node.setdefault(kk, {})
        if not found:
            return None

        def _seq(node):
            if isinstance(node, dict):
                if node and all(isinstance(k, int) for k in node):
                    return [_seq(node[i]) for i in range(len(node))]
                return {k: _seq(v) for k, v in node.items()}
            return node

        return _seq(root)

    # -- pytree state ---------------------------------------------------------

    def save(self, step: int, params, opt_state, extra: Optional[Dict[str, Any]] = None):
        extra = dict(extra or {})
        ds_state = extra.pop("ds_state", None)
        state = {
            "params": params,
            "opt_state": opt_state,
            "extra": extra,
        }
        self.mngr.save(step, args=ocp.args.StandardSave(state))
        if ds_state is not None:
            self.save_ds_state(step, ds_state)

    def restore(self, step: Optional[int] = None, template=None):
        step = step if step is not None else self.mngr.latest_step()
        if step is None:
            return None
        if template is not None:
            template = dict(template)
            template_extra = dict(template.get("extra", {}))
            template_extra.pop("ds_state", None)  # sidecar, never in the tree
            template["extra"] = template_extra
            try:
                restored = self.mngr.restore(
                    step, args=ocp.args.StandardRestore(template)
                )
            except ValueError:
                # Legacy checkpoint with ds_state inside the pytree: its
                # per-epoch structure can't be predicted by the caller, so
                # read it from orbax's _METADATA, graft a placeholder into
                # the template, and restore with strict=False (the saved
                # shapes win over the placeholder's).
                ds_tmpl = self._legacy_ds_state_template(step)
                if ds_tmpl is None:
                    raise
                template_extra["ds_state"] = ds_tmpl
                template["extra"] = template_extra
                restored = self.mngr.restore(
                    step,
                    args=ocp.args.StandardRestore(template, strict=False),
                )
        else:
            restored = self.mngr.restore(step)
        sidecar = self.load_ds_state(step)
        if sidecar is not None and isinstance(restored, dict):
            restored.setdefault("extra", {})["ds_state"] = sidecar
        return step, restored

    def latest_step(self) -> Optional[int]:
        return self.mngr.latest_step()

    def wait(self):
        self.mngr.wait_until_finished()

    def close(self):
        self.mngr.wait_until_finished()
        self.mngr.close()
