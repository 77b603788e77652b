"""Host (numpy) mask paste must match the device (jnp) paste exactly —
the evaluator pastes on host (evaluator.py), the device kernel remains
for on-device consumers; both implement mmdet _do_paste_mask semantics
(reference fgn_roi_head.py:668-671)."""

import numpy as np

from fgn_tpu.ops.mask_paste import paste_masks, paste_masks_np


def _rand_case(seed, n=6, m=14, H=96, W=128):
    rnd = np.random.RandomState(seed)
    probs = rnd.rand(n, m, m).astype(np.float32)
    x1 = rnd.uniform(-10, W - 20, n)
    y1 = rnd.uniform(-10, H - 20, n)
    boxes = np.stack(
        [x1, y1, x1 + rnd.uniform(4, 60, n), y1 + rnd.uniform(4, 60, n)], -1
    ).astype(np.float32)
    return probs, boxes


def test_np_matches_jnp_bool():
    probs, boxes = _rand_case(0)
    ref = np.asarray(paste_masks(probs, boxes, 96, 128, threshold=0.5))
    got = paste_masks_np(probs, boxes, 96, 128, threshold=0.5)
    np.testing.assert_array_equal(got, ref)


def test_np_matches_jnp_float():
    probs, boxes = _rand_case(1)
    ref = np.asarray(paste_masks(probs, boxes, 96, 128, threshold=None))
    got = paste_masks_np(probs, boxes, 96, 128, threshold=None)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_np_empty():
    out = paste_masks_np(
        np.zeros((0, 14, 14), np.float32), np.zeros((0, 4), np.float32),
        64, 64, threshold=0.5,
    )
    assert out.shape == (0, 64, 64) and out.dtype == bool


def test_np_outside_box_is_zero():
    probs = np.ones((1, 14, 14), np.float32)
    boxes = np.array([[20.0, 20.0, 40.0, 40.0]], np.float32)
    out = paste_masks_np(probs, boxes, 64, 64, threshold=0.5)
    assert out[0, :19, :].sum() == 0 and out[0, :, :19].sum() == 0
    assert out[0, 22:38, 22:38].all()


def test_windowed_paste_equals_full_canvas():
    """paste_masks_np pastes per-box windows; must equal the full-canvas
    formulation exactly, including boxes partially/entirely outside."""
    from fgn_tpu.ops.mask_paste import _paste_weights_np, paste_masks_np

    rng = np.random.RandomState(3)
    N, m, H, W = 12, 14, 96, 128
    probs = rng.rand(N, m, m).astype(np.float32)
    boxes = np.stack(
        [
            rng.uniform(-40, W - 10, N),
            rng.uniform(-40, H - 10, N),
        ],
        1,
    )
    wh = rng.uniform(5, 90, (N, 2)).astype(np.float32)
    boxes = np.concatenate([boxes, boxes + wh], 1).astype(np.float32)
    boxes[0] = (-30, -30, -5, -5)  # entirely outside
    boxes[1] = (W - 4, H - 4, W + 30, H + 30)  # hangs off the far corner

    out = paste_masks_np(probs, boxes, H, W, threshold=0.5)

    ry = _paste_weights_np(boxes[:, 1], boxes[:, 3], H, m)
    rx = _paste_weights_np(boxes[:, 0], boxes[:, 2], W, m)
    full = np.einsum(
        "nyj,nxj->nyx", np.einsum("nyi,nij->nyj", ry, probs), rx
    ) > 0.5
    assert (out == full).all()
