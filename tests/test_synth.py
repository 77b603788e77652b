import os

import numpy as np
import pytest

from fgn_tpu.data import synth
from fgn_tpu.utils.io import read_pkl


def test_palette_unique_26():
    p = synth.get_palette_np()
    assert p.shape == (26, 3)
    assert len({tuple(c) for c in p.tolist()}) == 26
    assert (255, 255, 255) not in {tuple(c) for c in p.tolist()}


def test_render_and_cut():
    g = synth.render_glyph("A", 0)
    assert g.dtype == np.uint8 and (g == 255).any() and (g < 128).any()
    cut = synth.cut_char_img(g)
    assert cut.shape[0] < g.shape[0] and cut.shape[1] < g.shape[1]
    # tight: first/last rows+cols contain ink (within the 1px shift margin)
    assert cut.min() < 255


def test_paste_and_mask_recovery():
    np.random.seed(0)
    img = np.full((256, 256, 3), 255, np.uint8)
    glyph = synth.cut_char_img(synth.render_glyph("B", 1))
    res = synth.paste_colored_char_img(img, glyph, [], [], hw_max=256)
    assert res is not False
    img, bboxes, colors = res
    assert bboxes.shape == (1, 4) and colors.shape == (1, 3)
    mask = synth.get_char_mask_by_color(img, bboxes[0], colors[0])
    assert mask.shape == (256, 256)
    y1, x1, y2, x2 = bboxes[0]
    assert mask[y1:y2, x1:x2].sum() > 0
    # mask confined to the box
    outside = mask.copy()
    outside[y1:y2, x1:x2] = 0
    assert outside.sum() == 0


def test_paste_iou_constraint():
    from fgn_tpu.ops.boxes import box_iou_np

    np.random.seed(1)
    img = np.full((256, 256, 3), 255, np.uint8)
    glyph = synth.cut_char_img(synth.render_glyph("C", 0))
    bboxes, colors = [], []
    for _ in range(6):
        res = synth.paste_colored_char_img(img, glyph, bboxes, colors, iou_max=0.2)
        if res is False:
            break
        img, bboxes, colors = res
    if len(bboxes) > 1:
        ious = box_iou_np(np.asarray(bboxes), np.asarray(bboxes))
        np.fill_diagonal(ious, 0)
        assert ious.max() < 0.2


def test_create_ds(tmp_path):
    bank = synth.GlyphBank(["0", "1", "2"], {"train": 3, "val": 2})
    root = str(tmp_path / "toyds")
    synth.create_ds(
        bank,
        {"train": 5, "val": 3},
        {"small": 2, "large": 2},
        {"small": [1.5, 2.5], "large": [3.0, 4.0]},
        root,
        img_new_size=256,
        seed=3,
    )
    for subset, n in [("train", 5), ("val", 3)]:
        imgs = sorted(os.listdir(os.path.join(root, subset)))
        assert len(imgs) == n
        bboxes = read_pkl(os.path.join(root, f"{subset}_bboxes.pkl"))
        cat_ids = read_pkl(os.path.join(root, f"{subset}_cat_ids.pkl"))
        colors = read_pkl(os.path.join(root, f"{subset}_colors.pkl"))
        assert len(bboxes) == len(cat_ids) == len(colors) == n
        for b, c, col in zip(bboxes, cat_ids, colors):
            assert len(b) == len(c) == len(col)
            assert len(b) >= 2  # generator keeps images with >= 2 instances
            assert all(0 <= ci < 3 for ci in c)


def test_get_new_shape():
    # shorter side → target, longer scales by AR
    h, w = synth.get_new_shape(100, 200, target_size=480, max_size=1333)
    assert (h, w) == (480, 960)
    # cap at max_size
    h, w = synth.get_new_shape(100, 500, target_size=800, max_size=1333)
    assert w == 1333 and h == int(1333 / 5)
    # square stays square
    h, w = synth.get_new_shape(512, 512, target_size=480, max_size=480)
    assert (h, w) == (480, 480)
