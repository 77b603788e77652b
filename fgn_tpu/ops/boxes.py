"""Box primitives: IoU, coordinate order, delta box coder.

Replaces the reference's native dependencies (torchvision ``box_iou``,
mmdet ``DeltaXYWHBBoxCoder``) with jnp ops; see SURVEY.md §2.9.

Conventions (kept from the reference, README.md:54-80):
  * datasets produce YXYX boxes; the model boundary converts to XYXY
    (reference: subprojects/sp02_omniiseg_fgn_mmdet/fgn.py:101-106);
  * widths/heights are ``x2 - x1`` with no +1 (mmdet 2.x convention).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def yxyx_to_xyxy(boxes):
    """(…, 4) YXYX → XYXY. Works for jnp and np arrays."""
    return boxes[..., (1, 0, 3, 2)]


def xyxy_to_yxyx(boxes):
    return boxes[..., (1, 0, 3, 2)]


def box_area(boxes):
    """Area of (…, 4) XYXY boxes."""
    return jnp.maximum(boxes[..., 2] - boxes[..., 0], 0) * jnp.maximum(
        boxes[..., 3] - boxes[..., 1], 0
    )


def box_iou(boxes1, boxes2, eps: float = 0.0):
    """Pairwise IoU of XYXY boxes: (..., M, 4) × (..., N, 4) → (..., M, N)."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[..., :, None] + area2[..., None, :] - inter
    return inter / jnp.maximum(union, jnp.maximum(eps, 1e-9))


def box_iou_np(boxes1: np.ndarray, boxes2: np.ndarray) -> np.ndarray:
    """Host NumPy pairwise IoU (for data tooling: synthetic generator paste
    check, VOC parsing; reference cp_utils/create_img_from_chars.py:87)."""
    boxes1 = np.asarray(boxes1, dtype=np.float64).reshape(-1, 4)
    boxes2 = np.asarray(boxes2, dtype=np.float64).reshape(-1, 4)
    area1 = np.maximum(boxes1[:, 2] - boxes1[:, 0], 0) * np.maximum(
        boxes1[:, 3] - boxes1[:, 1], 0
    )
    area2 = np.maximum(boxes2[:, 2] - boxes2[:, 0], 0) * np.maximum(
        boxes2[:, 3] - boxes2[:, 1], 0
    )
    lt = np.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = np.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = np.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    return inter / np.maximum(union, 1e-9)


# --------------------------------------------------------------------------
# DeltaXYWH box coder (mmdet-compatible semantics)
# --------------------------------------------------------------------------
# RPN uses means 0, stds 1; RCNN uses stds (.1, .1, .2, .2)
# (reference: subprojects/sp02_omniiseg_fgn_mmdet/fgn_r50_c4_densecl.py:55-58,94-97).

_DEFAULT_MEANS = (0.0, 0.0, 0.0, 0.0)
_DEFAULT_STDS = (1.0, 1.0, 1.0, 1.0)
# mmdet wh_ratio_clip = 16 / 1000
_MAX_RATIO = float(np.abs(np.log(16.0 / 1000.0)))


def delta_encode(proposals, gt, means=_DEFAULT_MEANS, stds=_DEFAULT_STDS):
    """XYXY proposals + XYXY gt → normalized (dx, dy, dw, dh) targets."""
    pw = proposals[..., 2] - proposals[..., 0]
    ph = proposals[..., 3] - proposals[..., 1]
    px = proposals[..., 0] + 0.5 * pw
    py = proposals[..., 1] + 0.5 * ph

    gw = gt[..., 2] - gt[..., 0]
    gh = gt[..., 3] - gt[..., 1]
    gx = gt[..., 0] + 0.5 * gw
    gy = gt[..., 1] + 0.5 * gh

    eps = 1e-6
    pw = jnp.maximum(pw, eps)
    ph = jnp.maximum(ph, eps)
    dx = (gx - px) / pw
    dy = (gy - py) / ph
    dw = jnp.log(jnp.maximum(gw, eps) / pw)
    dh = jnp.log(jnp.maximum(gh, eps) / ph)
    deltas = jnp.stack([dx, dy, dw, dh], axis=-1)

    means = jnp.asarray(means, dtype=deltas.dtype)
    stds = jnp.asarray(stds, dtype=deltas.dtype)
    return (deltas - means) / stds


def delta_decode(
    proposals,
    deltas,
    means=_DEFAULT_MEANS,
    stds=_DEFAULT_STDS,
    max_shape=None,
    wh_ratio_clip: float = 16.0 / 1000.0,
):
    """Normalized deltas → XYXY boxes, optionally clipped to (H, W)."""
    means = jnp.asarray(means, dtype=deltas.dtype)
    stds = jnp.asarray(stds, dtype=deltas.dtype)
    d = deltas * stds + means

    max_ratio = jnp.abs(jnp.log(wh_ratio_clip))
    dx, dy = d[..., 0], d[..., 1]
    dw = jnp.clip(d[..., 2], -max_ratio, max_ratio)
    dh = jnp.clip(d[..., 3], -max_ratio, max_ratio)

    pw = proposals[..., 2] - proposals[..., 0]
    ph = proposals[..., 3] - proposals[..., 1]
    px = proposals[..., 0] + 0.5 * pw
    py = proposals[..., 1] + 0.5 * ph

    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    gx = px + pw * dx
    gy = py + ph * dy

    x1 = gx - 0.5 * gw
    y1 = gy - 0.5 * gh
    x2 = gx + 0.5 * gw
    y2 = gy + 0.5 * gh
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1)
    if max_shape is not None:
        h, w = max_shape
        boxes = jnp.stack(
            [
                jnp.clip(boxes[..., 0], 0, w),
                jnp.clip(boxes[..., 1], 0, h),
                jnp.clip(boxes[..., 2], 0, w),
                jnp.clip(boxes[..., 3], 0, h),
            ],
            axis=-1,
        )
    return boxes
