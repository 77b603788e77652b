"""Run-seed plumbing (round 5): the flagship variance study rests on
the config key `seed` actually producing independent trajectories —
distinct param inits and sampling streams — while staying
deterministic per seed (RESULTS.md "Variance study")."""

import jax
import numpy as np

from __graft_entry__ import _toy_batch
from fgn_tpu.models.fgn import FGN, FGNConfig

_SMALL = dict(
    n_ways=3, k_shots=1, backbone_norm="gn",
    rpn_train_nms_pre=64, rpn_train_max_per_img=16,
    rpn_test_nms_pre=64, rpn_test_max_per_img=16,
    rpn_num_samples=8, rcnn_num_samples=8, rcnn_max_per_img=4,
)


def _init(seed: int):
    model = FGN(cfg=FGNConfig(**_SMALL))
    batch = _toy_batch(B=1, H=64, W=64, N=3, K=1, S=32)
    init = jax.jit(
        lambda k, b, r: model.init(k, b, r, method=FGN.train_forward)
    )
    return init(
        jax.random.PRNGKey(seed), batch, jax.random.PRNGKey(seed + 1)
    )


def test_seed_changes_init_deterministically():
    p0a = _init(0)
    p0b = _init(0)
    p1 = _init(1)
    l0a = jax.tree_util.tree_leaves(p0a)
    l0b = jax.tree_util.tree_leaves(p0b)
    l1 = jax.tree_util.tree_leaves(p1)
    # same seed → bit-identical init
    for a, b in zip(l0a, l0b):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    # different seed → different values, same structure
    assert len(l0a) == len(l1)
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(l0a, l1)
        if np.asarray(a).size > 1
    )


def test_runner_seed_and_resume_fold():
    """Runner.rng derives from the seed; resume folds the restored step
    in (loop.py) so a restart does not replay the step-0 keys."""
    from fgn_tpu.train.loop import Runner

    rng0 = jax.random.PRNGKey(0)
    rng5 = jax.random.PRNGKey(5)
    assert not np.array_equal(np.asarray(rng0), np.asarray(rng5))
    folded = jax.random.fold_in(rng0, 123)
    assert not np.array_equal(np.asarray(folded), np.asarray(rng0))
    # the same fold is what resume() applies
    again = jax.random.fold_in(jax.random.PRNGKey(0), 123)
    assert np.array_equal(np.asarray(folded), np.asarray(again))
    assert Runner.__init__.__defaults__ is not None  # seed kwarg exists
