"""Jitted train / eval steps with data-parallel sharding.

One compiled ``train_step`` covers everything after episode construction
(the reference splits this across FGN.forward_train, mmcv OptimizerHook
and the runner; see SURVEY.md §3.1). Parameters live replicated, the
batch is sharded over the ``data`` mesh axis, and XLA inserts the
gradient all-reduce.
"""

from __future__ import annotations

import jax
import optax

from fgn_tpu.models.fgn import FGN
from fgn_tpu.parallel.mesh import (
    episode_batch_shardings,
    make_mesh,
    replicate,
)


def make_train_step(model: FGN, tx: optax.GradientTransformation, mesh=None):
    """Returns (train_step, placement) where
    train_step(params, opt_state, batch, rng, step) →
    (params, opt_state, metrics)."""
    mesh = mesh or make_mesh()
    rep = replicate(mesh)

    def loss_fn(params, batch, rng):
        losses = model.apply(params, batch, rng, method=FGN.train_forward)
        total = sum(v for k, v in losses.items() if k.startswith("loss_"))
        return total, losses

    def step_fn(params, opt_state, batch, rng):
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(losses)
        metrics["loss_total"] = total
        return params, opt_state, metrics

    batch_shardings = episode_batch_shardings(mesh)

    train_step = jax.jit(
        step_fn,
        in_shardings=(rep, rep, batch_shardings, rep),
        out_shardings=(rep, rep, rep),
        donate_argnums=(0, 1),
    )
    return train_step, mesh


def make_eval_step(model: FGN, mesh=None):
    mesh = mesh or make_mesh()
    rep = replicate(mesh)
    batch_shardings = episode_batch_shardings(mesh)

    def step_fn(params, batch):
        return model.apply(params, batch, method=FGN.test_forward)

    return jax.jit(
        step_fn, in_shardings=(rep, batch_shardings), out_shardings=rep
    ), mesh
