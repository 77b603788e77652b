import jax.numpy as jnp
import numpy as np

from fgn_tpu.ops.boxes import box_iou_np
from fgn_tpu.ops.nms import batched_nms, nms_padded


def greedy_nms_np(boxes, scores, thr):
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        ious = box_iou_np(boxes[i : i + 1], boxes)[0]
        suppressed |= ious > thr
        suppressed[i] = True
    return keep


def _random_boxes(rng, n, span=100.0):
    b = rng.rand(n, 4).astype(np.float32) * span
    b[:, 2:] = b[:, :2] + 5 + b[:, 2:] * 0.3
    return b


def test_nms_matches_numpy_greedy(rng):
    for trial in range(5):
        n = 257  # force multiple blocks incl. a ragged one
        boxes = _random_boxes(rng, n)
        scores = rng.rand(n).astype(np.float32)
        ref = greedy_nms_np(boxes, scores, 0.5)
        out_boxes, out_scores, idx, valid = nms_padded(
            jnp.asarray(boxes), jnp.asarray(scores),
            jnp.ones(n, bool), 0.5, max_out=n, block=64,
        )
        got = np.asarray(idx)[np.asarray(valid)]
        assert got.tolist() == ref


def test_nms_respects_validity_and_maxout(rng):
    boxes = _random_boxes(rng, 50)
    scores = rng.rand(50).astype(np.float32)
    valid = np.ones(50, bool)
    valid[::2] = False
    ref = greedy_nms_np(boxes[valid], scores[valid], 0.7)
    ref_idx = np.where(valid)[0][ref]
    _, out_scores, idx, ovalid = nms_padded(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
        0.7, max_out=8, block=16,
    )
    got = np.asarray(idx)[np.asarray(ovalid)]
    assert got.tolist() == ref_idx[:8].tolist()
    # score-sorted output
    s = np.asarray(out_scores)[np.asarray(ovalid)]
    assert np.all(np.diff(s) <= 0)


def test_nms_identical_boxes_keep_one():
    boxes = np.tile(np.array([[0, 0, 10, 10]], np.float32), (5, 1))
    scores = np.array([0.1, 0.9, 0.5, 0.3, 0.8], np.float32)
    _, _, idx, valid = nms_padded(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(5, bool),
        0.5, max_out=5,
    )
    assert np.asarray(valid).sum() == 1
    assert int(np.asarray(idx)[0]) == 1


def test_batched_nms_classes_independent():
    boxes = np.tile(np.array([[0, 0, 10, 10]], np.float32), (4, 1))
    scores = np.array([0.9, 0.8, 0.7, 0.6], np.float32)
    cls = np.array([0, 0, 1, 1], np.int32)
    ob, os_, oc, idx, valid = batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(cls),
        jnp.ones(4, bool), 0.5, max_out=4,
    )
    v = np.asarray(valid)
    assert v.sum() == 2  # one survivor per class
    assert sorted(np.asarray(oc)[v].tolist()) == [0, 1]
    # boxes are restored un-shifted
    assert np.allclose(np.asarray(ob)[v], [[0, 0, 10, 10]] * 2)
