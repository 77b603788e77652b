import jax
import jax.numpy as jnp
import numpy as np

from fgn_tpu.ops.assign import max_iou_assign
from fgn_tpu.ops.sample import random_sample_pos_neg


def _assign(boxes, gts, valid=None, **kw):
    gts = jnp.asarray(gts, jnp.float32).reshape(-1, 4)
    if valid is None:
        valid = jnp.ones(gts.shape[0], bool)
    kw.setdefault("pos_iou_thr", 0.5)
    kw.setdefault("neg_iou_thr", 0.3)
    kw.setdefault("min_pos_iou", 0.3)
    return max_iou_assign(jnp.asarray(boxes, jnp.float32), gts, valid, **kw)


def test_assign_pos_neg_ignore():
    gt = [[0, 0, 10, 10]]
    boxes = [
        [0, 0, 10, 10],  # IoU 1 → pos (gt 1)
        [0, 0, 10, 5],  # IoU .5 → pos
        [0, 4, 10, 14],  # IoU 6/14≈.43 → between thresholds → ignore
        [20, 20, 30, 30],  # IoU 0 → neg
    ]
    r = _assign(boxes, gt, match_low_quality=False)
    assert np.asarray(r.assigned_gt_inds).tolist() == [1, 1, -1, 0]


def test_assign_low_quality_match():
    # No box reaches pos_iou_thr for gt; the best one is claimed anyway.
    gt = [[0, 0, 10, 10]]
    boxes = [[0, 0, 10, 30], [50, 50, 60, 60]]  # IoU 1/3, 0
    r = _assign(boxes, gt, match_low_quality=True)
    assert np.asarray(r.assigned_gt_inds).tolist() == [1, 0]
    r2 = _assign(boxes, gt, match_low_quality=False)
    assert np.asarray(r2.assigned_gt_inds).tolist() == [-1, 0]


def test_assign_last_gt_wins_on_tie():
    # Two identical gts: low-quality claim goes to the later one.
    gt = [[0, 0, 10, 30], [0, 0, 10, 30]]
    boxes = [[0, 0, 10, 10], [40, 40, 50, 50]]
    r = _assign(boxes, gt)
    assert np.asarray(r.assigned_gt_inds)[0] == 2


def test_assign_invalid_gt_ignored():
    gt = [[0, 0, 10, 10], [0, 0, 10, 10]]
    valid = jnp.array([False, True])
    boxes = [[0, 0, 10, 10]]
    r = _assign(boxes, gt, valid=valid)
    assert np.asarray(r.assigned_gt_inds).tolist() == [2]


def test_assign_no_valid_gt_all_negative():
    gt = [[0, 0, 10, 10]]
    boxes = [[0, 0, 10, 10], [5, 5, 9, 9]]
    r = _assign(boxes, gt, valid=jnp.array([False]))
    assert np.asarray(r.assigned_gt_inds).tolist() == [0, 0]


def test_assign_box_valid_mask():
    gt = [[0, 0, 10, 10]]
    boxes = [[0, 0, 10, 10], [0, 0, 10, 10]]
    r = _assign(boxes, gt, box_valid=jnp.array([True, False]))
    assert np.asarray(r.assigned_gt_inds).tolist() == [1, -1]


def test_sampler_counts_and_layout():
    key = jax.random.PRNGKey(0)
    A = 100
    pos = jnp.zeros(A, bool).at[:10].set(True)
    neg = jnp.zeros(A, bool).at[10:90].set(True)
    res = random_sample_pos_neg(key, pos, neg, num=64, pos_fraction=0.5)
    inds = np.asarray(res.inds)
    is_pos = np.asarray(res.is_pos)
    valid = np.asarray(res.valid)
    assert valid.all()
    assert int(res.n_pos) == 10  # only 10 pos available (< 32 expected)
    assert is_pos.sum() == 10
    # positives first
    assert is_pos[:10].all() and not is_pos[10:].any()
    assert np.all(inds[:10] < 10)
    assert np.all((inds[10:] >= 10) & (inds[10:] < 90))
    # negatives are distinct
    assert len(set(inds[10:].tolist())) == 54


def test_sampler_pos_cap():
    key = jax.random.PRNGKey(1)
    A = 200
    pos = jnp.zeros(A, bool).at[:100].set(True)
    neg = jnp.zeros(A, bool).at[100:].set(True)
    res = random_sample_pos_neg(key, pos, neg, num=64, pos_fraction=0.25)
    assert int(res.n_pos) == 16
    assert np.asarray(res.valid).all()


def test_sampler_not_enough_candidates():
    key = jax.random.PRNGKey(2)
    A = 10
    pos = jnp.zeros(A, bool).at[:2].set(True)
    neg = jnp.zeros(A, bool).at[2:5].set(True)
    res = random_sample_pos_neg(key, pos, neg, num=64, pos_fraction=0.5)
    assert int(res.n_pos) == 2
    assert np.asarray(res.valid).sum() == 5
