"""RoIAlign with static shapes.

TPU-native replacement for torchvision/mmcv RoIAlign (reference usage:
subprojects/sp02_omniiseg_fgn_mmdet/fgn_roi_head.py:429-432 for support
pooling, fgn_r50_c4_densecl.py:69-73 for the stride-16 RoI extractor).

Design notes:
  * ROIs are laid out per-image — (B, R, 4) against a (B, H, W, C) feature
    map — because the sampler emits a fixed ROI count per image; this
    removes the reference's ``bbox2roi`` batch-index bookkeeping.
  * ``sampling_ratio`` is a static sample count per bin dim. The reference
    runs sampling_ratio=0 (adaptive = ceil(roi_size / out_size), a
    data-dependent shape that cannot compile); sampling_ratio=2 is the
    standard static choice and changes AP negligibly.
  * ``aligned=True`` uses the half-pixel convention (mmcv default);
    ``aligned=False`` matches legacy torchvision (adds no offset and
    clamps roi sides to >= 1).

The inner loop is 4 corner-gathers per sample point over a (B, R, O, O, C)
accumulator — memory-light; a Pallas kernel can swap in behind the same
interface.
"""

from __future__ import annotations

import jax.numpy as jnp


def _bilinear_sample(fmap: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray):
    """Sample fmap (B, H, W, C) at per-image grids ys (B, R, O), xs (B, R, O)
    → (B, R, O, O, C). Points outside [-1, H] contribute zero."""
    B, H, W, C = fmap.shape

    def corner(y_idx, x_idx, wy, wx):
        # y_idx (B, R, O) int, x_idx (B, R, O) int
        b = jnp.arange(B)[:, None, None, None]
        v = fmap[b, y_idx[:, :, :, None], x_idx[:, :, None, :], :]
        w = (wy[:, :, :, None] * wx[:, :, None, :])[..., None]
        return v * w

    oob_y = (ys <= -1.0) | (ys >= H)
    oob_x = (xs <= -1.0) | (xs >= W)
    y = jnp.clip(ys, 0.0, H - 1)
    x = jnp.clip(xs, 0.0, W - 1)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    wy1 = y - y0
    wx1 = x - x0
    wy0 = jnp.where(oob_y, 0.0, 1.0 - wy1)
    wx0 = jnp.where(oob_x, 0.0, 1.0 - wx1)
    wy1 = jnp.where(oob_y, 0.0, wy1)
    wx1 = jnp.where(oob_x, 0.0, wx1)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, H - 1)
    x1i = jnp.minimum(x0i + 1, W - 1)

    out = corner(y0i, x0i, wy0, wx0)
    out += corner(y0i, x1i, wy0, wx1)
    out += corner(y1i, x0i, wy1, wx0)
    out += corner(y1i, x1i, wy1, wx1)
    return out


def roi_align(
    fmap: jnp.ndarray,  # (B, H, W, C)
    rois: jnp.ndarray,  # (B, R, 4) XYXY in input coords
    out_size: int,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
    aligned: bool = True,
) -> jnp.ndarray:
    """→ (B, R, out_size, out_size, C)."""
    O = out_size
    S = max(int(sampling_ratio), 1)
    offset = 0.5 if aligned else 0.0

    x1 = rois[..., 0] * spatial_scale - offset  # (B, R)
    y1 = rois[..., 1] * spatial_scale - offset
    x2 = rois[..., 2] * spatial_scale - offset
    y2 = rois[..., 3] * spatial_scale - offset
    rw = x2 - x1
    rh = y2 - y1
    if not aligned:
        rw = jnp.maximum(rw, 1.0)
        rh = jnp.maximum(rh, 1.0)
    bw = rw / O
    bh = rh / O

    # Sample offsets within the roi: (O, S) → bin i, sample s.
    grid = (
        jnp.arange(O, dtype=fmap.dtype)[:, None]
        + (jnp.arange(S, dtype=fmap.dtype)[None, :] + 0.5) / S
    )
    ys = y1[..., None, None] + bh[..., None, None] * grid  # (B, R, O, S)
    xs = x1[..., None, None] + bw[..., None, None] * grid

    acc = None
    for sy in range(S):
        for sx in range(S):
            v = _bilinear_sample(fmap, ys[..., sy], xs[..., sx])
            acc = v if acc is None else acc + v
    return acc / float(S * S)
