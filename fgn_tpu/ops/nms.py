"""Padded NMS with static shapes, exact greedy semantics.

Replaces mmcv's CUDA NMS (reference config:
subprojects/sp02_omniiseg_fgn_mmdet/fgn_r50_c4_densecl.py:151-155,174-186)
with an XLA-friendly blocked algorithm:

  * candidates are sorted by score (descending, stable — ties keep the
    lower index, like torch/mmcv);
  * boxes are processed in blocks of ``block`` entries. Within a block the
    greedy keep-vector is the fixpoint of
    ``keep_j = valid_j & !any_{k<j}(keep_k & IoU(k, j) > thr)``,
    reached by iterating that map (each sweep finalizes at least the first
    undecided box; real suppression chains are short so it converges in a
    handful of sweeps);
  * a finished block then suppresses all later boxes in one vectorized op.

This gives results identical to sequential greedy NMS while keeping the
sequential depth at O(M / block * chain_depth) instead of O(M).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from fgn_tpu.ops.boxes import box_iou


def _self_suppress_block(iou_bb: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Exact greedy keep-vector for one block.

    iou_bb: (B, B) IoU > threshold adjacency (bool), valid: (B,) bool.
    """
    B = valid.shape[0]
    # adj[k, j] = "k can suppress j": requires k strictly earlier (k < j),
    # i.e. the strict upper triangle along the row (suppressor) axis.
    tri = jnp.triu(jnp.ones((B, B), dtype=bool), k=1)
    adj = iou_bb & tri

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(jnp.any(keep != prev), it < B)

    def body(state):
        keep, _, it = state
        suppressed = jnp.any(adj & keep[:, None], axis=0)
        new_keep = valid & ~suppressed
        return new_keep, keep, it + 1

    init = (valid, jnp.zeros_like(valid), jnp.int32(0))
    keep, _, _ = jax.lax.while_loop(cond, body, init)
    return keep


def _greedy_alive(boxes_s, alive, iou_threshold: float, block: int):
    """Blocked greedy sweep over score-sorted padded boxes.

    boxes_s (Mp, 4) XYXY with Mp a multiple of ``block``; alive (Mp,)
    bool. Returns the final greedy keep mask (Mp,) bool.
    """
    Mp = boxes_s.shape[0]
    nb = Mp // block
    pos = jnp.arange(Mp)

    def step(alive, i):
        blk_boxes = jax.lax.dynamic_slice(boxes_s, (i * block, 0), (block, 4))
        blk_alive = jax.lax.dynamic_slice(alive, (i * block,), (block,))
        iou_bb = box_iou(blk_boxes, blk_boxes) > iou_threshold
        blk_keep = _self_suppress_block(iou_bb, blk_alive)
        alive = jax.lax.dynamic_update_slice(alive, blk_keep, (i * block,))
        # Block suppresses all strictly-later boxes.
        iou_cross = box_iou(blk_boxes, boxes_s) > iou_threshold  # (B, Mp)
        supp = jnp.any(iou_cross & blk_keep[:, None], axis=0)
        later = pos >= (i + 1) * block
        alive = alive & ~(supp & later)
        return alive, None

    alive, _ = jax.lax.scan(step, alive, jnp.arange(nb))
    return alive


def nms_padded(
    boxes: jnp.ndarray,  # (M, 4) XYXY
    scores: jnp.ndarray,  # (M,)
    valid: jnp.ndarray,  # (M,) bool
    iou_threshold: float,
    max_out: int,
    block: int = 128,
    alive_fn=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Greedy NMS over valid boxes.

    Returns (boxes (max_out, 4), scores (max_out,), idx (max_out,) indices
    into the input, out_valid (max_out,) bool). Output is score-sorted.

    ``alive_fn(boxes_s, alive, iou_threshold, block)`` computes the keep
    mask over the score-sorted padded candidates; defaults to the blocked
    XLA sweep (``ops/nms_pallas.py`` plugs in the fused TPU kernel).
    """
    M = boxes.shape[0]
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    s = jnp.where(valid, scores, neg_inf)
    s_sorted, order = jax.lax.top_k(s, M)  # stable: ties keep lower index
    boxes_s = boxes[order]
    alive = jnp.isfinite(s_sorted)

    nb = -(-M // block)
    pad = nb * block - M
    if pad:
        boxes_s = jnp.concatenate(
            [boxes_s, jnp.zeros((pad, 4), boxes_s.dtype)], axis=0
        )
        alive = jnp.concatenate([alive, jnp.zeros((pad,), bool)], axis=0)

    alive = (alive_fn or _greedy_alive)(
        boxes_s, alive, iou_threshold, block
    )
    alive = alive[:M]

    keep_scores = jnp.where(alive, s_sorted, neg_inf)
    k_out = min(max_out, M)
    out_scores, keep_pos = jax.lax.top_k(keep_scores, k_out)
    if k_out < max_out:  # fewer candidates than requested slots
        out_scores = jnp.concatenate(
            [out_scores, jnp.full(max_out - k_out, neg_inf, out_scores.dtype)]
        )
        keep_pos = jnp.concatenate(
            [keep_pos, jnp.zeros(max_out - k_out, keep_pos.dtype)]
        )
    out_valid = jnp.isfinite(out_scores)
    out_idx = order[keep_pos]
    out_boxes = boxes_s[keep_pos]
    out_scores = jnp.where(out_valid, out_scores, 0.0)
    out_boxes = jnp.where(out_valid[:, None], out_boxes, 0.0)
    return out_boxes, out_scores, out_idx.astype(jnp.int32), out_valid


def batched_nms(
    boxes: jnp.ndarray,  # (M, 4)
    scores: jnp.ndarray,  # (M,)
    class_ids: jnp.ndarray,  # (M,) int
    valid: jnp.ndarray,  # (M,) bool
    iou_threshold: float,
    max_out: int,
    coord_bound: float = 1e4,
    block: int = 128,
    alive_fn=None,
):
    """Per-class NMS via the coordinate-offset trick (classes never overlap)."""
    offset = class_ids.astype(boxes.dtype)[:, None] * coord_bound
    shifted = boxes + offset
    _, out_scores, out_idx, out_valid = nms_padded(
        shifted, scores, valid, iou_threshold, max_out, block=block,
        alive_fn=alive_fn,
    )
    out_boxes = jnp.where(out_valid[:, None], boxes[out_idx], 0.0)
    out_cls = jnp.where(out_valid, class_ids[out_idx], 0)
    return out_boxes, out_scores, out_cls, out_idx, out_valid
