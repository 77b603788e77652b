import json
import os
import xml.etree.ElementTree as ET

import cv2
import numpy as np
import pytest

from fgn_tpu.data import rle as R
from fgn_tpu.data.voc import (
    VOC_BACKGROUND_COLOR,
    VOC_IGNORE_COLOR,
    VOC_LABEL_COLORS,
    VOC_LABEL_TO_COCO_ORIGINAL_ID,
    VOCDS,
    VOCDSParse,
    voc_colormap,
)


def _write_xml(fp, size_hw, objects):
    root = ET.Element("annotation")
    size = ET.SubElement(root, "size")
    ET.SubElement(size, "height").text = str(size_hw[0])
    ET.SubElement(size, "width").text = str(size_hw[1])
    ET.SubElement(size, "depth").text = "3"
    for name, (y1, x1, y2, x2) in objects:
        obj = ET.SubElement(root, "object")
        ET.SubElement(obj, "name").text = name
        ET.SubElement(obj, "difficult").text = "0"
        bb = ET.SubElement(obj, "bndbox")
        ET.SubElement(bb, "ymin").text = str(y1)
        ET.SubElement(bb, "xmin").text = str(x1)
        ET.SubElement(bb, "ymax").text = str(y2)
        ET.SubElement(bb, "xmax").text = str(x2)
    ET.ElementTree(root).write(fp)


def _make_fake_voc(tmp_path):
    """3 images: img0 clean (dog + car), img1 bbox-count mismatch,
    img2 low-IoU (xml box far from the mask)."""
    voc_root = tmp_path / "VOC2012"
    for d in (
        "Annotations", "JPEGImages", "SegmentationObject",
        "SegmentationClass", "ImageSets/Segmentation",
    ):
        (voc_root / d).mkdir(parents=True)
    cmap = voc_colormap()
    inst_colors = [tuple(cmap[1]), tuple(cmap[2])]
    H, W = 60, 80

    def write_img(img_id, instances, xml_objects):
        img = np.full((H, W, 3), 128, np.uint8)
        obj = np.zeros((H, W, 3), np.uint8)
        cls = np.zeros((H, W, 3), np.uint8)
        for (name, (y1, x1, y2, x2)), icolor in zip(instances, inst_colors):
            obj[y1:y2, x1:x2] = icolor
            cls[y1:y2, x1:x2] = VOC_LABEL_COLORS[name]
        # add an ignore border strip (must be skipped by the parser)
        obj[:2, :] = VOC_IGNORE_COLOR
        cls[:2, :] = VOC_IGNORE_COLOR
        cv2.imwrite(str(voc_root / "JPEGImages" / f"{img_id}.jpg"), img)
        cv2.imwrite(
            str(voc_root / "SegmentationObject" / f"{img_id}.png"), obj[..., ::-1]
        )
        cv2.imwrite(
            str(voc_root / "SegmentationClass" / f"{img_id}.png"), cls[..., ::-1]
        )
        _write_xml(
            voc_root / "Annotations" / f"{img_id}.xml", (H, W), xml_objects
        )

    dog_box = (10, 10, 30, 30)
    car_box = (35, 40, 55, 70)
    write_img("img0", [("dog", dog_box), ("car", car_box)],
              [("dog", dog_box), ("car", car_box)])
    # img1: two masks but only one xml object → bbox-count mismatch
    write_img("img1", [("dog", dog_box), ("car", car_box)],
              [("dog", dog_box)])
    # img2: xml box far away from the mask → low IoU
    write_img("img2", [("dog", dog_box)], [("dog", (35, 45, 55, 75))])

    with open(voc_root / "ImageSets" / "Segmentation" / "trainval.txt", "w") as f:
        f.write("img0\nimg1\nimg2\n")
    return str(voc_root)


@pytest.fixture(scope="module")
def fake_voc(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("voc")
    voc_root = _make_fake_voc(tmp)
    cache_root = str(tmp / "cache")
    os.makedirs(cache_root)
    # COCOCats.json so VOCDS can build the original→contiguous remap.
    cats = {
        str(v): {"id": v, "name": k if k not in
                 {"aeroplane": 1, "sofa": 1, "tvmonitor": 1, "motorbike": 1}
                 else k}
        for k, v in VOC_LABEL_TO_COCO_ORIGINAL_ID.items()
    }
    # use the COCO-side names for aliased cats
    alias = {"aeroplane": "airplane", "sofa": "couch",
             "tvmonitor": "tv", "motorbike": "motorcycle"}
    cats = {
        str(v): {"id": v, "name": alias.get(k, k)}
        for k, v in VOC_LABEL_TO_COCO_ORIGINAL_ID.items()
    }
    with open(os.path.join(cache_root, "COCOCats.json"), "w") as f:
        json.dump(cats, f)
    return voc_root, cache_root


def test_colormap_known_values():
    cmap = voc_colormap()
    assert tuple(cmap[0]) == (0, 0, 0)
    assert tuple(cmap[1]) == (128, 0, 0)  # aeroplane
    assert tuple(cmap[15]) == (192, 128, 128)  # person
    assert tuple(cmap[255]) == VOC_IGNORE_COLOR


def test_parser_entries(fake_voc):
    voc_root, cache_root = fake_voc
    p = VOCDSParse("trainval", voc_root=voc_root, root=cache_root)
    b, codes, names, diff, size = p.get_ann_data_entry(0)
    assert size.tolist() == [60, 80]
    assert names.tolist() == ["dog", "car"]
    assert b.tolist() == [[10, 10, 30, 30], [35, 40, 55, 70]]
    bi, ci, ni, colors = p.get_img_data_entry(0, size=size)
    assert sorted(ni.tolist()) == ["car", "dog"]
    assert len(colors) == 2  # ignore strip not an instance


def test_exclusions(fake_voc):
    voc_root, cache_root = fake_voc
    p = VOCDSParse("trainval", voc_root=voc_root, root=cache_root)
    exc = p.get_excluded()
    assert exc == ["img1", "img2"]
    # cached
    p2 = VOCDSParse("trainval", voc_root=voc_root, root=cache_root)
    assert p2.get_excluded() == exc


def test_results_and_vocds(fake_voc):
    voc_root, cache_root = fake_voc
    ds = VOCDS(
        imgs_set="trainval", root=cache_root, voc_root=voc_root,
        coco_root="/nonexistent",
    )
    assert len(ds) == 1  # only img0 survives
    item = ds[0]
    assert item["img"].shape == (60, 80, 3)
    assert len(item["bboxes"]) == 2
    # cat ids are contiguous after remap; dog original 18, car 3
    names = {ds.new_cats_ids_to_cats_names[int(c)] for c in item["cat_ids"]}
    assert names == {"dog", "car"}
    # masks align with boxes
    for bb, m in zip(item["bboxes"].astype(int), item["isegmaps"]):
        inside = m[bb[0] : bb[2], bb[1] : bb[3]].sum()
        assert inside == m.sum() and inside > 0


def test_stats_and_evidence(fake_voc, tmp_path):
    voc_root, cache_root = fake_voc
    p = VOCDSParse("trainval", voc_root=voc_root, root=cache_root)
    stats = p.count_stats()
    assert stats["n_images"] == 3
    assert stats["total_anns"] == 4  # 2 + 1 + 1 xml objects
    assert stats["difficult_anns"] == 0
    assert stats["oob_boxes"] == 0
    n = p.dump_evidence(str(tmp_path / "evidence"))
    assert n == 2  # img1 (count mismatch) + img2 (low IoU)
    import os as _os

    names = _os.listdir(str(tmp_path / "evidence"))
    assert any("img1" in f for f in names)
    assert any("img2" in f for f in names)
