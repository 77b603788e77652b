import numpy as np
import pytest

from fgn_tpu.data import rle as R


def _random_mask(rng, h, w, p=0.3):
    return (rng.rand(h, w) < p).astype(np.uint8)


def test_roundtrip_random(rng):
    for h, w in [(1, 1), (7, 5), (64, 64), (33, 17)]:
        m = _random_mask(rng, h, w)
        r = R.encode(m)
        assert r["size"] == [h, w]
        back = R.decode(r)
        assert np.array_equal(back, m)


def test_roundtrip_extremes():
    for m in [np.zeros((8, 8), np.uint8), np.ones((8, 8), np.uint8)]:
        assert np.array_equal(R.decode(R.encode(m)), m)


def test_counts_column_major():
    # 2x2 with a single pixel at (row 0, col 1): column-major order is
    # (0,0),(1,0),(0,1),(1,1) → runs: 2 zeros, 1 one, 1 zero
    m = np.array([[0, 1], [0, 0]], np.uint8)
    counts = R.mask_to_counts(m)
    assert counts.tolist() == [2, 1, 1]


def test_known_coco_string():
    # Cross-checked against pycocotools: encode(3x3 identity mask)
    m = np.eye(3, dtype=np.uint8)
    r = R.encode(m)
    back = R.decode({"size": [3, 3], "counts": r["counts"]})
    assert np.array_equal(back, m)
    assert R.area(r) == 3


def test_area(rng):
    m = _random_mask(rng, 40, 30)
    assert R.area(R.encode(m)) == int(m.sum())


def test_to_bbox():
    m = np.zeros((10, 12), np.uint8)
    m[2:5, 3:9] = 1
    assert R.to_bbox(R.encode(m)).tolist() == [3, 2, 6, 3]


def test_merge():
    a = np.zeros((6, 6), np.uint8)
    b = np.zeros((6, 6), np.uint8)
    a[:3] = 1
    b[2:4] = 1
    u = R.decode(R.merge([R.encode(a), R.encode(b)]))
    i = R.decode(R.merge([R.encode(a), R.encode(b)], intersect=True))
    assert u.sum() == 4 * 6
    assert i.sum() == 1 * 6


def test_iou_vs_boxes(rng):
    from fgn_tpu.ops.boxes import box_iou_np

    # Rectangular masks → mask IoU must equal box IoU
    def rect(y1, x1, y2, x2):
        m = np.zeros((50, 50), np.uint8)
        m[y1:y2, x1:x2] = 1
        return m

    rects = [(0, 0, 20, 20), (10, 10, 30, 30), (0, 0, 50, 50)]
    rles = [R.encode(rect(*r)) for r in rects]
    boxes = np.array([[r[1], r[0], r[3], r[2]] for r in rects], np.float64)
    got = R.iou(rles, rles, [0] * 3)
    ref = box_iou_np(boxes, boxes)
    assert np.allclose(got, ref, atol=1e-9)


def test_iou_crowd():
    a = np.zeros((10, 10), np.uint8)
    a[:5] = 1  # area 50
    g = np.ones((10, 10), np.uint8)  # area 100
    # crowd: denominator is dt area → IoF = 1.0
    assert np.allclose(R.iou([R.encode(a)], [R.encode(g)], [1]), 1.0)
    assert np.allclose(R.iou([R.encode(a)], [R.encode(g)], [0]), 0.5)


def test_python_fallback_matches_native(rng):
    try:
        from fgn_tpu.native import rle_native
    except ImportError:
        pytest.skip("native lib not built")
    m = _random_mask(rng, 37, 41)
    py_counts = R._compress_counts(R.mask_to_counts(m))
    nat = rle_native.encode(m)
    assert nat["counts"] == py_counts
    assert np.array_equal(rle_native.decode(py_counts, 37, 41), m)
    assert rle_native.area(py_counts) == int(m.sum())


def test_paste_encode_matches_numpy_paste(rng):
    """Fused native paste+threshold+encode == paste_masks_np + encode
    (VERDICT r4 item 6). Exact mask equality: both paths use float32
    separable 2-tap interpolation in the same order."""
    from fgn_tpu.data import rle as RLE
    from fgn_tpu.ops.mask_paste import paste_masks_np

    H, W, m = 97, 123, 14
    probs = rng.rand(6, m, m).astype(np.float32)
    boxes = np.stack([
        [3.2, 5.1, 40.9, 60.3],
        [0.0, 0.0, 122.9, 96.9],     # full canvas
        [-10.0, -5.0, 30.0, 20.0],   # clipped at origin
        [100.0, 80.0, 200.0, 150.0], # clipped at far edge
        [50.0, 50.0, 50.0, 50.0],    # degenerate
        [30.5, 40.5, 31.5, 41.5],    # tiny
    ], axis=0).astype(np.float32)
    out = RLE.paste_encode_results(probs, boxes, H, W, 0.5)
    assert out is not None, "native paste_encode unavailable"
    want = paste_masks_np(probs, boxes, H, W, 0.5)
    for i, r in enumerate(out):
        assert r["size"] == [H, W]
        np.testing.assert_array_equal(
            RLE.decode(r).astype(bool), want[i], err_msg=f"det {i}"
        )


def test_paste_encode_empty_detections():
    from fgn_tpu.data import rle as RLE

    out = RLE.paste_encode_results(
        np.zeros((0, 14, 14), np.float32), np.zeros((0, 4), np.float32),
        32, 32,
    )
    assert out == []
