"""Optimizer factory: every reference sweep optimizer builds and steps.

Reference sweep (graphs/MNISTISEG_N1_K1 notebook, LR 0.01 WD 1e-05):
Adadelta / SGD / Adagrad / Adam — fgn_train_schedule.py analogs in
fgn_tpu/train/optim.py.
"""
import jax
import jax.numpy as jnp
import pytest

from fgn_tpu.train.optim import build_optimizer, make_lr_schedule


@pytest.mark.parametrize("opt", ["adagrad", "adam", "sgd", "adadelta"])
def test_build_and_step(opt):
    params = {
        "params": {
            "backbone": {"w": jnp.ones((4, 4))},
            "fc_cls": {"w": jnp.ones((4,))},  # roi-head module: 0.1x lr
        }
    }
    tx = build_optimizer(
        params, base_lr=1e-2, optimizer=opt,
        schedule=make_lr_schedule(1e-2, steps_per_epoch=10),
    )
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, state = tx.update(grads, state, params)
    new = jax.tree.map(lambda p, u: p + u, params, updates)
    # a unit gradient must move every leaf, and in the descent direction
    for leaf, old in zip(jax.tree.leaves(new), jax.tree.leaves(params)):
        assert jnp.all(jnp.isfinite(leaf))
        assert jnp.all(leaf < old)


def test_unknown_optimizer_raises():
    params = {"params": {"backbone": {"w": jnp.ones((2,))}}}
    with pytest.raises(ValueError):
        tx = build_optimizer(params, optimizer="rmsprop")
        tx.init(params)


def test_cumulative_iters_accumulates():
    """Gradient accumulation (reference fgn_train_schedule.py:19-25,
    GradientCumulativeOptimizerHook cumulative_iters=4): k-1 micro-steps
    produce zero updates, the k-th applies one step equal to a single
    step on the averaged gradient."""
    params = {"params": {"backbone": {"w": jnp.ones((4, 4))}}}
    grads = jax.tree.map(jnp.ones_like, params)

    plain = build_optimizer(params, base_lr=1e-2, optimizer="sgd")
    accum = build_optimizer(
        params, base_lr=1e-2, optimizer="sgd", cumulative_iters=2
    )
    ps, as_ = plain.init(params), accum.init(params)

    pu, ps = plain.update(grads, ps, params)

    au1, as_ = accum.update(grads, as_, params)
    for leaf in jax.tree.leaves(au1):  # first micro-step: no update
        assert jnp.all(leaf == 0)
    au2, as_ = accum.update(grads, as_, params)
    # identical grads -> averaged grad == grad -> same step as plain
    for a, p in zip(jax.tree.leaves(au2), jax.tree.leaves(pu)):
        assert jnp.allclose(a, p)


def test_cosine_schedule_matches_mmcv_shape():
    """Cosine annealing (reference best-N3K3 cell: mmcv
    CosineAnnealingLrUpdaterHook, min_lr_ratio 0.01): base LR after
    warmup, base*(0.5 + 0.5*ratio + ...) at mid-run, base*ratio at the
    end; monotone decreasing after warmup."""
    import numpy as np

    base, ratio, spe, epochs = 0.01, 0.01, 100, 10
    sched = make_lr_schedule(
        base, steps_per_epoch=spe, type="cosine",
        min_lr_ratio=ratio, total_epochs=epochs, warmup_iters=100,
    )
    total = spe * epochs
    # right after warmup: ~base (cos term still ~1 at t=0.1 -> 0.976)
    assert float(sched(jnp.asarray(100))) == pytest.approx(
        base * (ratio + (1 - ratio) * 0.5 * (1 + np.cos(np.pi * 0.1))),
        rel=1e-5,
    )
    # midpoint: exactly base*(ratio + (1-ratio)/2)
    assert float(sched(jnp.asarray(total // 2))) == pytest.approx(
        base * (ratio + (1 - ratio) * 0.5), rel=1e-5
    )
    # end: min ratio
    assert float(sched(jnp.asarray(total))) == pytest.approx(
        base * ratio, rel=1e-4
    )
    vals = [float(sched(jnp.asarray(s))) for s in range(100, total + 1, 50)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))
