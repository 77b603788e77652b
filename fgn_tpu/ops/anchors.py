"""Anchor generation (mmdet AnchorGenerator semantics).

Config for FGN: scales [2, 4, 8, 16, 32] × ratios [0.5, 1.0, 2.0] on a
single stride-16 level (reference:
subprojects/sp02_omniiseg_fgn_mmdet/fgn_r50_c4_densecl.py:48-54). Anchors
are centered on grid points (center_offset 0), flattened location-major
then anchor-index, with anchor index = ratio_idx * len(scales) + scale_idx
— matching the conv-channel layout of the RPN heads.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def _base_anchors(
    base_size: int, scales: Tuple[float, ...], ratios: Tuple[float, ...]
) -> np.ndarray:
    scales_np = np.asarray(scales, dtype=np.float32)
    ratios_np = np.asarray(ratios, dtype=np.float32)
    h_ratios = np.sqrt(ratios_np)
    w_ratios = 1.0 / h_ratios
    ws = (base_size * w_ratios[:, None] * scales_np[None, :]).reshape(-1)
    hs = (base_size * h_ratios[:, None] * scales_np[None, :]).reshape(-1)
    # center_offset = 0: centered at the grid origin
    return np.stack([-0.5 * ws, -0.5 * hs, 0.5 * ws, 0.5 * hs], axis=-1)


@lru_cache(maxsize=64)
def _grid_anchors_np(
    feat_h: int,
    feat_w: int,
    stride: int,
    base_size: int,
    scales: Tuple[float, ...],
    ratios: Tuple[float, ...],
) -> np.ndarray:
    base = _base_anchors(base_size, scales, ratios)  # (A, 4)
    shift_x = np.arange(feat_w, dtype=np.float32) * stride
    shift_y = np.arange(feat_h, dtype=np.float32) * stride
    sx, sy = np.meshgrid(shift_x, shift_y)  # (H, W)
    shifts = np.stack([sx, sy, sx, sy], axis=-1)  # (H, W, 4)
    # (H, W, A, 4) → (H*W*A, 4); location-major, anchor-minor
    anchors = shifts[:, :, None, :] + base[None, None, :, :]
    return anchors.reshape(-1, 4).astype(np.float32)


def generate_anchors(
    feat_h: int,
    feat_w: int,
    stride: int = 16,
    scales: Sequence[float] = (2, 4, 8, 16, 32),
    ratios: Sequence[float] = (0.5, 1.0, 2.0),
    base_size: int | None = None,
) -> jnp.ndarray:
    """All XYXY anchors for a (feat_h, feat_w) single-level feature map.

    Returns (feat_h * feat_w * A, 4) with A = len(scales) * len(ratios).
    Shapes are static so results are host-cached per feature size.
    """
    if base_size is None:
        base_size = stride
    return jnp.asarray(
        _grid_anchors_np(
            int(feat_h), int(feat_w), int(stride), int(base_size),
            tuple(float(s) for s in scales), tuple(float(r) for r in ratios),
        )
    )


def anchor_inside_flags(
    anchors, img_h, img_w, allowed_border: int = 0
) -> jnp.ndarray:
    """Valid-anchor mask (mmdet ``anchor_inside_flags``): anchors whose
    corners lie inside the image expanded by ``allowed_border``.
    FGN uses allowed_border=0 (reference: fgn_r50_c4_densecl.py:148).
    Anchors outside are excluded from assignment and sampling."""
    if allowed_border < 0:
        return jnp.ones(anchors.shape[:-1], dtype=bool)
    return (
        (anchors[..., 0] >= -allowed_border)
        & (anchors[..., 1] >= -allowed_border)
        & (anchors[..., 2] < img_w + allowed_border)
        & (anchors[..., 3] < img_h + allowed_border)
    )
