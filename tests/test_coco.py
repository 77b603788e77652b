import json
import os

import cv2
import numpy as np
import pytest

from fgn_tpu.data import rle as R
from fgn_tpu.data.coco import (
    COCODS,
    filter_coco_anns,
    polygons_to_rle,
    segmentation_to_rle,
)


def _make_fake_coco(tmp_path, n_imgs=4):
    """Tiny COCO-format dataset: 64×48 images with rectangles."""
    coco_root = tmp_path / "COCO"
    (coco_root / "annotations").mkdir(parents=True)
    cats = [
        {"id": 1, "name": "person"},
        {"id": 3, "name": "car"},
        {"id": 18, "name": "dog"},
    ]
    for subset in ("train", "val"):
        img_dir = coco_root / f"{subset}2017"
        img_dir.mkdir()
        images, annotations = [], []
        aid = 1
        for i in range(n_imgs):
            fname = f"{i:012}.jpg"
            img = np.full((48, 64, 3), 220, np.uint8)
            cv2.rectangle(img, (8, 8), (28, 28), (255, 0, 0), -1)
            cv2.rectangle(img, (36, 16), (58, 40), (0, 255, 0), -1)
            cv2.imwrite(str(img_dir / fname), img)
            images.append(
                {"id": 100 + i, "file_name": fname, "height": 48, "width": 64}
            )
            # polygon ann
            annotations.append(
                {
                    "id": aid, "image_id": 100 + i, "category_id": 1,
                    "bbox": [8, 8, 20, 20], "area": 400, "iscrowd": 0,
                    "segmentation": [[8, 8, 28, 8, 28, 28, 8, 28]],
                }
            )
            aid += 1
            # uncompressed-RLE ann
            m = np.zeros((48, 64), np.uint8)
            m[16:40, 36:58] = 1
            counts = R.mask_to_counts(m).tolist()
            annotations.append(
                {
                    "id": aid, "image_id": 100 + i, "category_id": 3,
                    "bbox": [36, 16, 22, 24], "area": 528, "iscrowd": 0,
                    "segmentation": {"size": [48, 64], "counts": counts},
                }
            )
            aid += 1
            # degenerate ann (must be dropped)
            annotations.append(
                {
                    "id": aid, "image_id": 100 + i, "category_id": 18,
                    "bbox": [0, 0, 0.5, 10], "area": 0, "iscrowd": 0,
                    "segmentation": [[0, 0, 1, 0, 1, 1]],
                }
            )
            aid += 1
        with open(coco_root / "annotations" / f"instances_{subset}2017.json", "w") as f:
            json.dump(
                {"images": images, "annotations": annotations, "categories": cats},
                f,
            )
    return str(coco_root)


@pytest.fixture(scope="module")
def fake_coco(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("coco")
    coco_root = _make_fake_coco(tmp)
    root = str(tmp / "cache")
    return coco_root, root


def test_polygon_rasterization():
    r = polygons_to_rle([[2, 2, 10, 2, 10, 8, 2, 8]], 16, 16)
    m = R.decode(r)
    assert m[5, 5] == 1 and m[0, 0] == 0
    # interior fully filled
    assert m[3:8, 3:10].all()


def test_segmentation_to_rle_variants():
    m = np.zeros((8, 8), np.uint8)
    m[2:6, 2:6] = 1
    counts_list = R.mask_to_counts(m).tolist()
    r1 = segmentation_to_rle({"size": [8, 8], "counts": counts_list}, 8, 8)
    assert np.array_equal(R.decode(r1), m)
    compressed = R.encode(m)
    r2 = segmentation_to_rle(compressed, 8, 8)
    assert np.array_equal(R.decode(r2), m)


def test_filter_rules():
    imgs = {1: {"height": 100, "width": 100}, 2: {"height": 100, "width": 100}}
    anns = {
        1: [
            {"bbox": [0, 0, 50, 50], "area": 2500, "iscrowd": 0, "category_id": 1},
            {"bbox": [0, 0, 0.2, 5], "area": 0, "iscrowd": 0, "category_id": 1},
            {"bbox": [10, 10, 30, 30], "area": 900, "iscrowd": 1, "category_id": 1},
            {"bbox": [5, 5, 20, 20], "area": 400, "ignore": True, "category_id": 1},
        ],
        2: [{"bbox": [0, 0, 0.5, 0.5], "area": 0, "iscrowd": 0, "category_id": 1}],
    }
    out = filter_coco_anns(imgs, anns, verbose=False)
    assert len(out) == 1  # image 2 has no valid anns
    kept = out[0]["anns"]
    assert len(kept) == 2  # valid + crowd kept; bad + ignored dropped
    assert any(a.get("iscrowd") for a in kept)


def test_cocods_end_to_end(fake_coco):
    coco_root, root = fake_coco
    ds = COCODS(imgs_set="val", root=root, coco_root=coco_root)
    assert len(ds) == 4
    # category remap is contiguous over sorted original ids
    assert ds.cats_names_to_new_cats_ids == {"person": 0, "car": 1, "dog": 2}
    item = ds[0]
    assert item["img"].shape == (48, 64, 3)
    assert len(item["bboxes"]) == 2  # degenerate ann dropped
    assert item["cat_ids"].tolist() == [0, 1]
    # boxes YXYX
    assert item["bboxes"][0].tolist() == [8, 8, 28, 28]
    # masks decode inside boxes
    m = item["isegmaps"][1]
    assert m[20, 40] and not m[5, 5]
    # cache files written with the reference naming
    assert os.path.exists(os.path.join(root, "val2017_rles_counts.pkl"))
    # reload from cache gives identical annotations
    ds2 = COCODS(imgs_set="val", root=root, coco_root=coco_root)
    assert np.array_equal(ds2[0]["bboxes"], item["bboxes"])
