"""CheckpointManager: ds_state sidecar + legacy in-pytree fallback.

Regression for the COCO2VOC merged-FT resume failure: a mixed-AR run
writes per-epoch ``ds_state.group_hw`` entries whose count/structure a
fresh process cannot predict, so orbax StandardRestore's
template-structure matching rejected the run's own checkpoints
(observed live: 1000 `extra.ds_state.group_hw.*` mismatches after a
host-OOM kill+resume). ds_state now lives in a JSON sidecar; legacy
checkpoints restore through the raw-restore graft fallback.
"""

import numpy as np
import optax
import orbax.checkpoint as ocp
import pytest

from fgn_tpu.train.checkpoints import CheckpointManager


def _params():
    return {"dense": {"w": np.ones((4, 3), np.float32), "b": np.zeros((3,), np.float32)}}


def _opt_state(params):
    return optax.adam(1e-3).init(params)


def _ds_state(n=7, groups=5):
    return {
        "order": np.arange(n, dtype=np.int64),
        "group_hw": {i: (480 + 16 * i, 640) for i in range(groups)},
    }


def test_ds_state_sidecar_roundtrip(tmp_path):
    work = str(tmp_path / "run")
    params = _params()
    opt = _opt_state(params)
    mgr = CheckpointManager(work, max_keep=2)
    mgr.save(3, params, opt, extra={"epoch": 1, "cursor": 9, "ds_state": _ds_state()})
    mgr.wait()

    # A FRESH manager + template with a DIFFERENT (empty) ds_state shape
    # must restore cleanly — this is exactly what broke the legacy format.
    mgr2 = CheckpointManager(work, max_keep=2)
    step, state = mgr2.restore(
        template={"params": params, "opt_state": opt,
                  "extra": {"epoch": 0, "cursor": 0, "ds_state": {"order": np.zeros(1), "group_hw": {}}}}
    )
    assert step == 3
    assert int(state["extra"]["epoch"]) == 1 and int(state["extra"]["cursor"]) == 9
    ds = state["extra"]["ds_state"]
    np.testing.assert_array_equal(ds["order"], np.arange(7))
    assert ds["group_hw"][4] == (544, 640)
    # opt_state containers survive (NamedTuples, not raw dicts)
    assert type(state["opt_state"]) is type(opt)
    mgr.close(); mgr2.close()


def test_legacy_in_pytree_ds_state_fallback(tmp_path):
    """Checkpoints written by the old format (ds_state inside the orbax
    pytree) must still restore even when the template can't predict the
    group_hw structure."""
    work = str(tmp_path / "legacy")
    params = _params()
    opt = _opt_state(params)
    mgr = CheckpointManager(work, max_keep=2)
    # Write the legacy layout directly through orbax.
    legacy = {
        "params": params,
        "opt_state": opt,
        "extra": {
            "epoch": 2, "cursor": 0,
            "ds_state": {
                "order": np.arange(11, dtype=np.int64),
                "group_hw": {str(i): (np.int64(800), np.int64(1088)) for i in range(4)},
            },
        },
    }
    mgr.mngr.save(5, args=ocp.args.StandardSave(legacy))
    mgr.wait()

    mgr2 = CheckpointManager(work, max_keep=2)
    step, state = mgr2.restore(
        template={"params": params, "opt_state": opt, "extra": {"epoch": 0, "cursor": 0}}
    )
    assert step == 5
    assert int(state["extra"]["epoch"]) == 2
    ds = state["extra"]["ds_state"]
    np.testing.assert_array_equal(np.asarray(ds["order"]).ravel(), np.arange(11))
    assert type(state["opt_state"]) is type(opt)
    mgr.close(); mgr2.close()


def test_sidecar_pruned_with_retention(tmp_path):
    work = str(tmp_path / "prune")
    params = _params()
    opt = _opt_state(params)
    mgr = CheckpointManager(work, max_keep=2)
    for s in (1, 2, 3):
        mgr.save(s, params, opt, extra={"epoch": 0, "cursor": 0, "ds_state": _ds_state()})
        mgr.wait()
    assert mgr.load_ds_state(3) is not None
    assert mgr.load_ds_state(1) is None, "sidecar for evicted step must be pruned"
    mgr.close()


def test_load_state_dict_accepts_string_keys():
    """group_hw keys may arrive as str (JSON / legacy orbax dicts)."""
    from fgn_tpu.data.episodic import FewShotISEG

    class _Stub(FewShotISEG):
        def __init__(self):  # bypass full construction
            self.order = np.arange(3)
            self._group_hw = {}

    ds = _Stub()
    ds.load_state_dict({"order": np.arange(3), "group_hw": {"2": [480, 640]}})
    assert ds._group_hw == {2: (480, 640)}
