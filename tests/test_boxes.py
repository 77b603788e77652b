import jax.numpy as jnp
import numpy as np

from fgn_tpu.ops.boxes import (
    box_area,
    box_iou,
    box_iou_np,
    delta_decode,
    delta_encode,
    xyxy_to_yxyx,
    yxyx_to_xyxy,
)


def test_order_conversion_roundtrip():
    b = np.array([[1.0, 2.0, 3.0, 4.0], [5, 6, 7, 8]], np.float32)
    assert np.allclose(xyxy_to_yxyx(yxyx_to_xyxy(b)), b)
    assert np.allclose(yxyx_to_xyxy(b), [[2, 1, 4, 3], [6, 5, 8, 7]])


def test_iou_hand_values():
    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.array(
        [
            [0.0, 0.0, 10.0, 10.0],  # identical → 1
            [5.0, 5.0, 15.0, 15.0],  # inter 25, union 175 → 1/7
            [20.0, 20.0, 30.0, 30.0],  # disjoint → 0
            [0.0, 0.0, 5.0, 10.0],  # contained half → 0.5
        ]
    )
    iou = np.asarray(box_iou(a, b))[0]
    assert np.allclose(iou, [1.0, 25.0 / 175.0, 0.0, 0.5], atol=1e-6)


def test_iou_np_matches_jnp(rng):
    a = rng.rand(13, 4).astype(np.float32) * 50
    b = rng.rand(7, 4).astype(np.float32) * 50
    a[:, 2:] += a[:, :2]
    b[:, 2:] += b[:, :2]
    assert np.allclose(box_iou_np(a, b), np.asarray(box_iou(a, b)), atol=1e-5)


def test_area():
    b = jnp.array([[0.0, 0.0, 3.0, 4.0], [5.0, 5.0, 4.0, 9.0]])
    assert np.allclose(np.asarray(box_area(b)), [12.0, 0.0])


def test_encode_decode_roundtrip(rng):
    props = rng.rand(20, 4).astype(np.float32) * 100
    props[:, 2:] += props[:, :2] + 5
    gt = props + rng.randn(20, 4).astype(np.float32) * 3
    gt[:, 2:] = np.maximum(gt[:, 2:], gt[:, :2] + 1)
    stds = (0.1, 0.1, 0.2, 0.2)
    deltas = delta_encode(jnp.asarray(props), jnp.asarray(gt), stds=stds)
    rec = delta_decode(jnp.asarray(props), deltas, stds=stds)
    assert np.allclose(np.asarray(rec), gt, atol=1e-3)


def test_encode_hand_value():
    # proposal 10x10 at origin, gt shifted +1 and twice as wide
    p = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    g = jnp.array([[1.0, 0.0, 21.0, 10.0]])
    d = np.asarray(delta_encode(p, g))[0]
    # centers: p (5,5), g (11,5); dx = 6/10
    assert np.allclose(d, [0.6, 0.0, np.log(2.0), 0.0], atol=1e-6)


def test_decode_clip_and_ratio_clamp():
    p = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    d = jnp.array([[0.0, 0.0, 100.0, 0.0]])  # huge dw must be clamped
    out = np.asarray(delta_decode(p, d, max_shape=(20, 30)))[0]
    max_w = 10.0 * (1000.0 / 16.0)
    assert out[2] - out[0] <= min(max_w, 30.0) + 1e-3
    assert out[0] >= 0 and out[3] <= 20
