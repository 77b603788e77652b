"""Paste per-detection mask logits into full-image masks.

TPU-native replacement for mmdet ``FCNMaskHead.get_seg_masks`` /
``_do_paste_mask`` (reference consumption:
subprojects/sp02_omniiseg_fgn_mmdet/fgn_roi_head.py:668-671).

Bilinear paste is separable, so the whole op is two small matmuls per
detection: out[n, y, x] = sum_ij Ry[n, y, i] * m[n, i, j] * Rx[n, x, j],
with hat-function weight matrices built from the detection box. Matches
grid_sample(align_corners=False): mask pixel centers sit at
(i + 0.5) / msize of the box extent; outside the box all weights are 0.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _paste_weights(lo: jnp.ndarray, hi: jnp.ndarray, size: int, msize: int):
    """Weight matrix (N, size, msize): image axis → mask axis.

    lo/hi: (N,) box extent along this axis (in image pixels)."""
    span = jnp.maximum(hi - lo, 1e-6)  # (N,)
    img_c = jnp.arange(size, dtype=lo.dtype) + 0.5  # pixel centers
    # Continuous mask coordinate of each image pixel center.
    m = (img_c[None, :] - lo[:, None]) / span[:, None] * msize - 0.5  # (N, size)
    inside = (img_c[None, :] >= lo[:, None]) & (img_c[None, :] <= hi[:, None])
    mi = jnp.arange(msize, dtype=lo.dtype)
    # Hat weights with edge clamp (replicate border like grid_sample border
    # clamping of out-of-range sample points within the box).
    mc = jnp.clip(m, 0.0, msize - 1.0)
    w = jnp.maximum(1.0 - jnp.abs(mc[:, :, None] - mi[None, None, :]), 0.0)
    return w * inside[:, :, None]


def paste_masks(
    mask_logits: jnp.ndarray,  # (N, msize, msize) — already sigmoid'ed or raw
    boxes: jnp.ndarray,  # (N, 4) XYXY in image coords
    img_h: int,
    img_w: int,
    threshold: float | None = 0.5,
):
    """→ (N, img_h, img_w); bool when threshold is set, else float."""
    boxes = boxes.astype(jnp.float32)
    ry = _paste_weights(boxes[:, 1], boxes[:, 3], img_h, mask_logits.shape[1])
    rx = _paste_weights(boxes[:, 0], boxes[:, 2], img_w, mask_logits.shape[2])
    tmp = jnp.einsum("nyi,nij->nyj", ry, mask_logits.astype(jnp.float32))
    out = jnp.einsum("nyj,nxj->nyx", tmp, rx)
    if threshold is not None:
        return out > threshold
    return out


# -- numpy twin (host-side paste) -------------------------------------------
#
# The evaluator pastes on the HOST: fetching full-image masks from the
# device costs ~0.84 s/batch over the tunnel (11.5 MB packed at ~15 MB/s
# effective), while the mask logits are ~0.3 MB and only the handful of
# valid detections need pasting (~2 small matmuls each). Numerics are
# identical to paste_masks — cross-checked in tests/test_mask_paste.py.


def _paste_weights_np(lo: np.ndarray, hi: np.ndarray, size: int, msize: int):
    span = np.maximum(hi - lo, 1e-6)
    img_c = np.arange(size, dtype=np.float32) + 0.5
    m = (img_c[None, :] - lo[:, None]) / span[:, None] * msize - 0.5
    inside = (img_c[None, :] >= lo[:, None]) & (img_c[None, :] <= hi[:, None])
    mi = np.arange(msize, dtype=np.float32)
    mc = np.clip(m, 0.0, msize - 1.0)
    w = np.maximum(1.0 - np.abs(mc[:, :, None] - mi[None, None, :]), 0.0)
    return (w * inside[:, :, None]).astype(np.float32)


def paste_masks_np(
    mask_probs: np.ndarray,  # (N, msize, msize) float
    boxes: np.ndarray,  # (N, 4) XYXY in image coords
    img_h: int,
    img_w: int,
    threshold: float | None = 0.5,
):
    """Host twin of paste_masks → (N, img_h, img_w)."""
    if len(mask_probs) == 0:
        out = np.zeros((0, img_h, img_w), np.float32)
        return out > threshold if threshold is not None else out
    boxes = np.asarray(boxes, np.float32)
    probs = np.asarray(mask_probs, np.float32)
    ry = _paste_weights_np(boxes[:, 1], boxes[:, 3], img_h, probs.shape[1])
    rx = _paste_weights_np(boxes[:, 0], boxes[:, 2], img_w, probs.shape[2])
    tmp = np.einsum("nyi,nij->nyj", ry, probs)
    out = np.einsum("nyj,nxj->nyx", tmp, rx)
    if threshold is not None:
        return out > threshold
    return out
