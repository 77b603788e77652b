"""Fused Pallas TPU kernel for the greedy-NMS keep mask.

Drop-in ``alive_fn`` for ``ops/nms.py::nms_padded`` (reference runs mmcv
CUDA NMS, subprojects/sp02_omniiseg_fgn_mmdet/fgn_r50_c4_densecl.py:151-155):
identical greedy semantics to the blocked XLA sweep — block-local
suppression fixpoint, then the finished block suppresses all later
candidates — but the whole sweep runs inside ONE kernel with the boxes
and the alive mask resident in VMEM:

  * no per-block kernel launches / HBM round-trips of the alive vector
    (the XLA scan re-reads and re-writes the full (Mp,) mask nb times);
  * the cross-block suppression only visits the strict upper triangle
    (the XLA sweep computes block × FULL-width IoU every step);
  * data-dependent early exit: a block with no survivors skips its
    entire suppression pass, and already-dead later blocks are skipped
    per tile — greedy NMS kills most of the tail, which static XLA
    control flow cannot exploit.

Layout: candidates are score-sorted and padded to ``nb`` blocks of 128
(the VPU lane width), fed row-major (nb, 128) per coordinate. The
"suppressor k" (128, 1) columns are derived in-kernel from the (1, 128)
rows via a masked-identity reduce (``_row_to_col``) — Mosaic cannot
load a dynamic (128, 1) column slice from VMEM (lane-dim alignment),
and a relayouting transpose would be slower. The alive mask lives in
the f32 output ref and is updated in place as blocks finalize.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK = 128  # VPU lane width; fixed kernel block size


def _row_to_col(row):
    """(1, B) → (B, 1) without a Mosaic relayout: mask the (B, B)
    broadcast with the identity and reduce along lanes."""
    b = row.shape[1]
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    )
    return jnp.sum(jnp.where(eye, row, 0.0), axis=1, keepdims=True)


def _iou_over(thr, ax1, ay1, ax2, ay2, aarea, bx1, by1, bx2, by2, barea):
    """Pairwise IoU > thr between suppressors a (B,1) and targets b (1,B).

    Same formula as ops/boxes.py::box_iou (w = x2-x1, no +1; union
    clamped at 1e-9), so keep decisions match the XLA path bit-for-bit.
    """
    iw = jnp.maximum(jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1), 0.0)
    ih = jnp.maximum(jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1), 0.0)
    inter = iw * ih
    union = jnp.maximum(aarea + barea - inter, 1e-9)
    return inter / union > thr


def _nms_kernel(x1, y1, x2, y2, area, alive0,
                out, *, nb: int, thr: float):
    """out (nb, B) f32 ∈ {0,1}: greedy keep mask over sorted candidates."""
    B = _BLOCK
    out[:] = alive0[:]
    row_lt_col = (
        jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
        < jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    )

    def outer(i, _):
        valid_row = out[pl.ds(i, 1), :] > 0.5  # (1, B)

        @pl.when(jnp.any(valid_row))
        def _process():
            # Block i coordinates: (1, B) candidate rows; (B, 1)
            # suppressor columns via the masked-identity reduce.
            bx1 = x1[pl.ds(i, 1), :]
            by1 = y1[pl.ds(i, 1), :]
            bx2 = x2[pl.ds(i, 1), :]
            by2 = y2[pl.ds(i, 1), :]
            bar = area[pl.ds(i, 1), :]  # (1, B)
            cx1 = _row_to_col(bx1)
            cy1 = _row_to_col(by1)
            cx2 = _row_to_col(bx2)
            cy2 = _row_to_col(by2)
            car = _row_to_col(bar)  # (B, 1)

            # In-block greedy fixpoint (ops/nms.py::_self_suppress_block):
            # adj[k, j] = "k can suppress j" needs k strictly earlier.
            adj = _iou_over(
                thr, cx1, cy1, cx2, cy2, car, bx1, by1, bx2, by2, bar
            ) & row_lt_col

            # f32 carries: Mosaic cannot legalize i1 vector while-carries.
            valid_f = valid_row.astype(jnp.float32)

            def cond(state):
                keep_f, prev_f, it = state
                return jnp.logical_and(jnp.any(keep_f != prev_f), it < B)

            def body(state):
                keep_f, _, it = state  # keep_f (1, B) f32
                keep_col = _row_to_col(keep_f) > 0.5
                suppressed = jnp.any(adj & keep_col, axis=0, keepdims=True)
                return jnp.where(suppressed, 0.0, valid_f), keep_f, it + 1

            keep_f, _, _ = jax.lax.while_loop(
                cond, body, (valid_f, jnp.zeros_like(valid_f),
                             jnp.int32(0))
            )
            out[pl.ds(i, 1), :] = keep_f
            keep_col = _row_to_col(keep_f) > 0.5  # (B, 1)

            @pl.when(jnp.any(keep_f > 0.5))
            def _suppress_later():
                def inner(j, _):
                    talive = out[pl.ds(j, 1), :]  # (1, B) f32

                    @pl.when(jnp.any(talive > 0.5))
                    def _():
                        hit = _iou_over(
                            thr, cx1, cy1, cx2, cy2, car,
                            x1[pl.ds(j, 1), :], y1[pl.ds(j, 1), :],
                            x2[pl.ds(j, 1), :], y2[pl.ds(j, 1), :],
                            area[pl.ds(j, 1), :],
                        ) & keep_col
                        sup = jnp.any(hit, axis=0, keepdims=True)
                        out[pl.ds(j, 1), :] = jnp.where(sup, 0.0, talive)

                    return None

                jax.lax.fori_loop(i + 1, nb, inner, None)

    jax.lax.fori_loop(0, nb, outer, None)


def greedy_alive_pallas(boxes_s, alive, iou_threshold: float,
                        block: int = _BLOCK, interpret: bool = False):
    """``alive_fn`` for nms_padded: boxes_s (Mp, 4) score-sorted XYXY,
    alive (Mp,) bool, Mp a multiple of 128. Returns (Mp,) bool."""
    assert block == _BLOCK, "pallas NMS is fixed at the 128-lane block"
    Mp = boxes_s.shape[0]
    nb = Mp // _BLOCK
    assert nb * _BLOCK == Mp
    b = boxes_s.astype(jnp.float32)
    coords = [b[:, k].reshape(nb, _BLOCK) for k in range(4)]
    area = (
        jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(b[:, 3] - b[:, 1], 0)
    ).reshape(nb, _BLOCK)
    rows = coords + [area]
    alive0 = alive.reshape(nb, _BLOCK).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_nms_kernel, nb=nb, thr=float(iou_threshold)),
        out_shape=jax.ShapeDtypeStruct((nb, _BLOCK), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*rows, alive0)
    return out.reshape(Mp) > 0.5


def nms_padded_pallas(boxes, scores, valid, iou_threshold: float,
                      max_out: int, block: int = _BLOCK,
                      interpret: bool = False):
    """nms_padded with the fused TPU keep-mask kernel."""
    from fgn_tpu.ops.nms import nms_padded

    return nms_padded(
        boxes, scores, valid, iou_threshold, max_out, block=_BLOCK,
        alive_fn=functools.partial(greedy_alive_pallas, interpret=interpret),
    )
