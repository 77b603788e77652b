"""Optimizer construction: optax equivalents of the reference schedule
(subprojects/sp02_omniiseg_fgn_mmdet/fgn_train_schedule.py):

  * Adagrad (or Adam/SGD) lr 5e-3, weight decay 1e-5;
  * per-module lr multiplier: roi_head params at 0.1×
    (paramwise_cfg custom_keys, fgn_train_schedule.py:10-17);
  * linear warmup 100 iters at ratio 0.01 → step decay γ 0.1 at epoch
    boundaries (lr_config, fgn_train_schedule.py:28-37).

Weight decay (documented deviation): decoupled — ``add_decayed_weights``
applies AFTER the adaptive scaler, i.e. AdamW-style, whereas the
reference's torch optimizers use coupled L2 (wd added to the gradient
BEFORE adaptive scaling). At wd ≤ 5e-5 the difference is negligible and
decoupled is the better-behaved variant; likewise ``scale_by_rss`` uses
initial_accumulator_value 0.1 vs torch Adagrad's 0 (avoids the 1/√0
first-step blow-up).
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import optax

# Param-tree top-level names that belong to the RoI head (0.1× lr).
ROI_HEAD_MODULES = (
    "shared5", "rel_conv_roi", "rel_conv_spp", "rel_gn",
    "fc_cls", "fc_reg",
    "mask_convs_0", "mask_convs_1", "mask_convs_2", "mask_convs_3",
    "mask_deconv", "mask_logits",
)


def make_lr_schedule(
    base_lr: float,
    steps_per_epoch: int,
    decay_epochs: Sequence[int] = (3,),
    gamma: float = 0.1,
    warmup_iters: int = 100,
    warmup_ratio: float = 0.01,
    min_lr: float = 1e-6,
    type: str = "step",  # noqa: A002 — config key name (mmcv lr_config)
    min_lr_ratio: float = 0.01,
    total_epochs: int = 0,
):
    """Step decay (reference default) or cosine annealing (the
    reference's best MNISTISEG N3K3 cell: mmcv
    CosineAnnealingLrUpdaterHook with min_lr_ratio 0.01 — work_dir
    'Adam … NoLRRescale CosineLRDecayMinLRRatio 0.01 BEST')."""

    def warm(step):
        import jax.numpy as jnp

        return warmup_ratio + (1.0 - warmup_ratio) * jnp.minimum(
            step / max(warmup_iters, 1), 1.0
        )

    if type == "cosine":
        total = max(int(total_epochs) * int(steps_per_epoch), 1)

        def schedule(step):
            import jax.numpy as jnp

            t = jnp.clip(step / total, 0.0, 1.0)
            cos = 0.5 * (1.0 + jnp.cos(jnp.pi * t))
            lr = base_lr * (min_lr_ratio + (1.0 - min_lr_ratio) * cos)
            return jnp.maximum(lr * warm(step), min_lr)

        return schedule

    boundaries = {int(e * steps_per_epoch): gamma for e in decay_epochs}

    def schedule(step):
        import jax.numpy as jnp

        factor = jnp.ones_like(step, dtype=jnp.float32)
        for b in sorted(boundaries):
            factor = jnp.where(step >= b, factor * boundaries[b], factor)
        return jnp.maximum(base_lr * factor * warm(step), min_lr)

    return schedule


def _roi_mask(params, frozen_modules: Sequence[str] = ()) -> Dict:
    def label(path, _):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        # flax puts everything under 'params'
        if top == "params" and len(path) > 1:
            top = path[1].key if hasattr(path[1], "key") else str(path[1])
        if top in frozen_modules:
            return "frozen"
        return "roi" if top in ROI_HEAD_MODULES else "main"

    return jax.tree_util.tree_map_with_path(label, params)


def build_optimizer(
    params,
    base_lr: float = 5e-3,
    weight_decay: float = 1e-5,
    optimizer: str = "adagrad",
    roi_head_lr_mult: float = 0.1,
    schedule=None,
    cumulative_iters: int = 1,
    frozen_modules: Sequence[str] = (),
) -> optax.GradientTransformation:
    """``frozen_modules``: top-level param-tree names whose updates are
    hard-zeroed (frozen-pretrained backbone, reference fgn.py:52-53 +
    requires_grad=False exclusion from the torch optimizer). The
    stop_gradient in the model already zeroes their GRADIENTS; this
    additionally keeps decoupled weight decay from eroding them."""
    schedule = schedule or (lambda step: base_lr)

    def core(lr_scale: float):
        if optimizer == "adagrad":
            scaler = optax.scale_by_rss(initial_accumulator_value=0.1)
        elif optimizer == "adam":
            scaler = optax.scale_by_adam()
        elif optimizer == "sgd":
            scaler = optax.trace(decay=0.9, nesterov=True)
        elif optimizer == "adadelta":
            # reference optimizer-sweep point (torch Adadelta defaults:
            # rho 0.9, eps 1e-6 — MNISTISEG_N1_K1 notebook table)
            scaler = optax.scale_by_adadelta(rho=0.9, eps=1e-6)
        else:
            raise ValueError(optimizer)
        return optax.chain(
            scaler,
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_schedule(lambda s: -lr_scale * schedule(s)),
        )

    labels = _roi_mask(params, frozen_modules)
    transforms = {"main": core(1.0), "roi": core(roi_head_lr_mult)}
    if frozen_modules:
        # only added when requested: keeps the opt_state pytree (and so
        # the compiled train-step cache keys) of standard runs unchanged
        transforms["frozen"] = optax.set_to_zero()
    tx = optax.multi_transform(transforms, labels)
    if cumulative_iters > 1:
        # Gradient accumulation (reference fgn_train_schedule.py:19-25,
        # GradientCumulativeOptimizerHook with cumulative_iters=4 —
        # experimented upstream, shipped disabled). MultiSteps averages
        # grads over k micro-batches and applies one optimizer step; the
        # inner schedule then advances once per k iterations (mmcv's
        # hook keeps per-iter LR stepping — negligible at γ-step
        # schedules, documented here).
        tx = optax.MultiSteps(tx, every_k_schedule=int(cumulative_iters))
    return tx
