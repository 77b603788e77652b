"""Jitted train / eval steps with data-parallel sharding.

One compiled ``train_step`` covers everything after episode construction
(the reference splits this across FGN.forward_train, mmcv OptimizerHook
and the runner; see SURVEY.md §3.1). Parameters live replicated, the
batch is sharded over the ``data`` mesh axis, and XLA inserts the
gradient all-reduce.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
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


def make_eval_step(model: FGN, mesh=None, packed: bool = True):
    """``packed=True`` (default) returns two output leaves instead of
    eight: the per-detection tensors concatenated into one (B, M, 7)
    f32 array (boxes | score | cat | valid) plus the mask logits, and
    the proposal tensors (unused by the evaluator) dropped. Each output
    leaf costs one tunnel RTT per batch on the remote-chip path — the
    round-4 eval profile was fetch-bound at ~113 ms/batch with ~30 KB
    of actual detection payload. Unpack with ``unpack_eval_out`` (bit
    -exact: f32 carries the int cats and bool valid losslessly)."""
    mesh = mesh or make_mesh()
    rep = replicate(mesh)
    batch_shardings = episode_batch_shardings(mesh)

    def step_fn(params, batch):
        out = model.apply(params, batch, method=FGN.test_forward)
        if not packed:
            return out
        pack = jnp.concatenate(
            [
                out["dt_boxes"].astype(jnp.float32),
                out["dt_scores"].astype(jnp.float32)[..., None],
                out["dt_cats"].astype(jnp.float32)[..., None],
                out["dt_valid"].astype(jnp.float32)[..., None],
            ],
            axis=-1,
        )
        return {"dt_pack": pack, "dt_mask_logits": out["dt_mask_logits"]}

    return jax.jit(
        step_fn, in_shardings=(rep, batch_shardings), out_shardings=rep
    ), mesh


def unpack_eval_out(out):
    """host-side inverse of the packed eval-step output."""
    if "dt_pack" not in out:
        return out
    import numpy as np

    pack = np.asarray(out["dt_pack"])
    return {
        "dt_boxes": pack[..., :4],
        "dt_scores": pack[..., 4],
        "dt_cats": pack[..., 5].astype(np.int32),
        "dt_valid": pack[..., 6] > 0.5,
        "dt_mask_logits": np.asarray(out["dt_mask_logits"]),
    }
