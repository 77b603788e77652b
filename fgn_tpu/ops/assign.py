"""MaxIoU assignment as a fully-vectorized static-shape op.

Semantics follow mmdet's MaxIoUAssigner exactly (the reference vendors it at
subprojects/sp02_omniiseg_fgn_mmdet/my_max_iou_assigner.py and configures it
at fgn_r50_c4_densecl.py:133-140,157-163):

  1. every box starts ignored (-1);
  2. boxes whose best IoU < neg_iou_thr become negative (0);
  3. boxes whose best IoU >= pos_iou_thr are assigned to their argmax gt;
  4. with ``match_low_quality``, each gt additionally claims all boxes that
     tie its own best IoU (>= min_pos_iou); gts are processed in index
     order, so for a shared box the *last* gt wins (gt_max_assign_all).

Everything is masked: invalid gt rows (padding) never match, invalid boxes
are forced to ignore. With zero valid gt all valid boxes are negative —
the same as mmdet's num_gt == 0 branch.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from fgn_tpu.ops.boxes import box_iou


class AssignResult(NamedTuple):
    # For each box: -1 ignore, 0 negative, g+1 assigned to gt g.
    assigned_gt_inds: jnp.ndarray  # (A,) int32
    max_overlaps: jnp.ndarray  # (A,) float
    # Convenience masks
    pos_mask: jnp.ndarray  # (A,) bool
    neg_mask: jnp.ndarray  # (A,) bool


def max_iou_assign(
    boxes: jnp.ndarray,  # (A, 4) XYXY
    gt_boxes: jnp.ndarray,  # (G, 4) XYXY (padded)
    gt_valid: jnp.ndarray,  # (G,) bool
    pos_iou_thr: float,
    neg_iou_thr: float,
    min_pos_iou: float,
    match_low_quality: bool = True,
    box_valid: Optional[jnp.ndarray] = None,  # (A,) bool
) -> AssignResult:
    gt_valid = gt_valid.astype(bool)
    ious = box_iou(gt_boxes, boxes)  # (G, A)
    # Padding gts contribute IoU 0: with no valid gt everything is negative,
    # matching mmdet's num_gt == 0 branch.
    ious = jnp.where(gt_valid[:, None], ious, 0.0)

    max_overlaps = jnp.max(ious, axis=0, initial=0.0)  # (A,)
    argmax_overlaps = jnp.argmax(ious, axis=0)  # (A,)

    assigned = jnp.full(boxes.shape[:1], -1, dtype=jnp.int32)
    assigned = jnp.where(max_overlaps < neg_iou_thr, 0, assigned)
    assigned = jnp.where(
        max_overlaps >= pos_iou_thr, argmax_overlaps.astype(jnp.int32) + 1, assigned
    )

    if match_low_quality:
        # (G,) best IoU each gt achieves over all boxes
        gt_max = jnp.max(ious, axis=1)
        eligible = (
            (ious == gt_max[:, None])
            & (gt_max[:, None] >= min_pos_iou)
            & gt_valid[:, None]
            & (ious > 0)
        )  # (G, A)
        # For each box take the LAST eligible gt (mmdet iterates gts in
        # order and overwrites).
        g_ids = jnp.arange(gt_boxes.shape[0], dtype=jnp.int32)
        last_g = jnp.max(
            jnp.where(eligible, g_ids[:, None] + 1, 0), axis=0
        )  # (A,) 0 = none
        assigned = jnp.where(last_g > 0, last_g, assigned)

    if box_valid is not None:
        assigned = jnp.where(box_valid.astype(bool), assigned, -1)
        max_overlaps = jnp.where(box_valid.astype(bool), max_overlaps, -1.0)

    return AssignResult(
        assigned_gt_inds=assigned,
        max_overlaps=max_overlaps,
        pos_mask=assigned > 0,
        neg_mask=assigned == 0,
    )
