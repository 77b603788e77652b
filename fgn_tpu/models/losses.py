"""Loss primitives with masked static-shape semantics.

Matches the reference's mmdet loss stack (all sums are weighted and
divided by an explicit ``avg_factor``, like mmdet ``weight_reduce_loss``):

  * ``sigmoid_bce`` — CrossEntropyLoss(use_sigmoid=True), the RPN cls loss
    (reference: subprojects/sp02_omniiseg_fgn_mmdet/fgn_r50_c4_densecl.py:60);
  * ``softmax_ce`` — CrossEntropyLoss, the RCNN cls loss (:103);
  * ``smooth_l1`` — SmoothL1Loss, RPN + RCNN bbox losses (:61,104);
  * ``accuracy_balanced`` — on-device equivalent of the reference's
    sklearn balanced accuracy metric (fgn_roi_head.py:43-56).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_bce(logits, targets, weights, avg_factor):
    """Weighted binary cross entropy from logits, summed / avg_factor."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    # Numerically stable: max(x,0) - x*t + log1p(exp(-|x|))
    per = (
        jnp.maximum(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    return jnp.sum(per * weights) / jnp.maximum(avg_factor, 1.0)


def softmax_ce(logits, labels, weights, avg_factor):
    """Weighted softmax cross entropy, summed / avg_factor.

    logits (..., C), labels (...) int."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return jnp.sum(-picked * weights) / jnp.maximum(avg_factor, 1.0)


def smooth_l1(pred, target, weights, avg_factor, beta: float = 1.0):
    """Weighted smooth-L1 (Huber), summed / avg_factor."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    diff = jnp.abs(pred - target)
    per = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    return jnp.sum(per * weights) / jnp.maximum(avg_factor, 1.0)


def accuracy_balanced(logits, labels, weights, n_classes: int):
    """(plain accuracy, balanced accuracy) over weighted samples.

    Balanced accuracy = mean per-class recall over classes that appear
    among the valid labels — identical to sklearn's
    ``balanced_accuracy_score`` (the reference computes it on host,
    fgn_roi_head.py:43-56; here it stays on device)."""
    valid = (weights > 0).astype(jnp.float32)
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == labels).astype(jnp.float32) * valid
    acc = jnp.sum(correct) / jnp.maximum(jnp.sum(valid), 1.0)

    onehot = jax.nn.one_hot(labels, n_classes, dtype=jnp.float32) * valid[..., None]
    per_class_total = jnp.sum(onehot, axis=tuple(range(onehot.ndim - 1)))
    per_class_correct = jnp.sum(
        onehot * correct[..., None], axis=tuple(range(onehot.ndim - 1))
    )
    present = per_class_total > 0
    recall = per_class_correct / jnp.maximum(per_class_total, 1.0)
    bal = jnp.sum(jnp.where(present, recall, 0.0)) / jnp.maximum(
        jnp.sum(present.astype(jnp.float32)), 1.0
    )
    return acc, bal
