import jax.numpy as jnp
import numpy as np

from fgn_tpu.ops.mask_paste import paste_masks
from fgn_tpu.ops.roi_align import roi_align


def roi_align_np(fmap, rois, out, scale, ratio, aligned):
    """Slow direct reference (same math, scalar loops)."""
    B, H, W, C = fmap.shape
    R = rois.shape[1]
    res = np.zeros((B, R, out, out, C), np.float64)
    off = 0.5 if aligned else 0.0
    for b in range(B):
        for r in range(R):
            x1, y1, x2, y2 = rois[b, r] * scale - off
            rw, rh = x2 - x1, y2 - y1
            if not aligned:
                rw, rh = max(rw, 1.0), max(rh, 1.0)
            bw, bh = rw / out, rh / out
            for i in range(out):
                for j in range(out):
                    acc = np.zeros(C)
                    for sy in range(ratio):
                        for sx in range(ratio):
                            y = y1 + bh * (i + (sy + 0.5) / ratio)
                            x = x1 + bw * (j + (sx + 0.5) / ratio)
                            if y <= -1 or y >= H or x <= -1 or x >= W:
                                wy = wx = None
                            y_c = min(max(y, 0), H - 1)
                            x_c = min(max(x, 0), W - 1)
                            y0, x0 = int(np.floor(y_c)), int(np.floor(x_c))
                            y1i, x1i = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
                            ly, lx = y_c - y0, x_c - x0
                            oob_y = y <= -1 or y >= H
                            oob_x = x <= -1 or x >= W
                            w00 = (0 if oob_y else 1 - ly) * (0 if oob_x else 1 - lx)
                            w01 = (0 if oob_y else 1 - ly) * (0 if oob_x else lx)
                            w10 = (0 if oob_y else ly) * (0 if oob_x else 1 - lx)
                            w11 = (0 if oob_y else ly) * (0 if oob_x else lx)
                            acc += (
                                w00 * fmap[b, y0, x0]
                                + w01 * fmap[b, y0, x1i]
                                + w10 * fmap[b, y1i, x0]
                                + w11 * fmap[b, y1i, x1i]
                            )
                    res[b, r, i, j] = acc / (ratio * ratio)
    return res


def test_roi_align_matches_reference(rng):
    fmap = rng.rand(2, 12, 14, 3).astype(np.float32)
    rois = np.array(
        [
            [[1.0, 1.0, 9.0, 9.0], [0.0, 0.0, 14.0, 12.0], [3.2, 2.1, 7.9, 10.4]],
            [[2.0, 3.0, 6.0, 6.0], [0.5, 0.5, 2.0, 2.0], [5.0, 5.0, 13.0, 11.0]],
        ],
        np.float32,
    )
    for aligned in (True, False):
        got = np.asarray(
            roi_align(jnp.asarray(fmap), jnp.asarray(rois), 4,
                      spatial_scale=1.0, sampling_ratio=2, aligned=aligned)
        )
        ref = roi_align_np(fmap, rois, 4, 1.0, 2, aligned)
        assert np.allclose(got, ref, atol=1e-4), f"aligned={aligned}"


def test_roi_align_constant_map():
    fmap = np.full((1, 8, 8, 2), 3.5, np.float32)
    rois = np.array([[[1.0, 1.0, 7.0, 7.0]]], np.float32)
    got = np.asarray(roi_align(jnp.asarray(fmap), jnp.asarray(rois), 7))
    assert np.allclose(got, 3.5, atol=1e-5)


def test_roi_align_spatial_scale():
    fmap = rng_map = np.arange(64, dtype=np.float32).reshape(1, 8, 8, 1)
    rois16 = np.array([[[16.0, 16.0, 96.0, 96.0]]], np.float32)
    rois1 = rois16 / 16.0
    a = np.asarray(roi_align(jnp.asarray(fmap), jnp.asarray(rois16), 2,
                             spatial_scale=1 / 16))
    b = np.asarray(roi_align(jnp.asarray(fmap), jnp.asarray(rois1), 2))
    assert np.allclose(a, b, atol=1e-5)


def test_paste_masks_full_box():
    # constant positive logits → mask fills (nearly) the box interior
    masks = jnp.full((1, 14, 14), 10.0)
    boxes = jnp.array([[4.0, 6.0, 20.0, 18.0]])
    out = np.asarray(paste_masks(masks, boxes, 32, 32, threshold=0.5))
    ys, xs = np.where(out[0])
    assert xs.min() >= 4 and xs.max() <= 19
    assert ys.min() >= 6 and ys.max() <= 17
    # interior fully covered
    assert out[0, 8:16, 6:18].all()
    # nothing outside the box
    assert not out[0, :6, :].any() and not out[0, :, :4].any()


def test_paste_masks_halves():
    m = np.full((1, 14, 14), -10.0, np.float32)
    m[0, :, 7:] = 10.0  # right half positive
    out = np.asarray(
        paste_masks(jnp.asarray(m), jnp.array([[0.0, 0.0, 28.0, 28.0]]), 28, 28)
    )
    assert out[0, 14, 20] and not out[0, 14, 6]
