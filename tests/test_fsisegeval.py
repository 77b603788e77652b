import numpy as np

from fgn_tpu.data import rle as R
from fgn_tpu.data.fsisegeval import FSISEGEval, _xywh_iou


def _mask(h, w, y1, x1, y2, x2):
    m = np.zeros((h, w), np.uint8)
    m[y1:y2, x1:x2] = 1
    return m


def _result(gt_boxes, gt_cats, dt_boxes, dt_cats, dt_scores, hw=(64, 64)):
    """Boxes YXYX; masks derived from the boxes (rectangles)."""
    h, w = hw
    return {
        "qry_img_shape": np.array([h, w, 3]),
        "qry_bboxes": np.asarray(gt_boxes, np.float32).reshape(-1, 4),
        "qry_cat_ids": np.asarray(gt_cats, np.int64),
        "qry_isegmaps_rle": [
            R.encode(_mask(h, w, *np.asarray(b, int))) for b in gt_boxes
        ],
        "dt_bboxes": np.asarray(dt_boxes, np.float32).reshape(-1, 4),
        "dt_cat_ids": np.asarray(dt_cats, np.int64),
        "dt_scores": np.asarray(dt_scores, np.float32),
        "dt_isegmaps_rle": [
            R.encode(_mask(h, w, *np.asarray(b, int))) for b in dt_boxes
        ],
    }


def test_perfect_detection_is_1():
    res = [
        _result(
            gt_boxes=[[4, 4, 20, 20], [30, 30, 50, 50]],
            gt_cats=[0, 1],
            dt_boxes=[[4, 4, 20, 20], [30, 30, 50, 50]],
            dt_cats=[0, 1],
            dt_scores=[0.9, 0.8],
        )
    ]
    for iou_type in ("bbox", "segm"):
        ev = FSISEGEval(results=res, n_ways=3, iou_type=iou_type)
        out = ev.run()
        assert out["mAP"] == 1.0, iou_type
        assert out["mAR"] == 1.0, iou_type


def test_no_detections_is_0():
    res = [
        _result([[4, 4, 20, 20]], [0], np.zeros((0, 4)), [], [])
    ]
    out = FSISEGEval(results=res, n_ways=3, iou_type="bbox").run()
    assert out["mAP"] == 0.0 and out["mAR"] == 0.0


def test_wrong_class_is_0():
    res = [
        _result([[4, 4, 20, 20]], [0], [[4, 4, 20, 20]], [1], [0.9])
    ]
    out = FSISEGEval(results=res, n_ways=3, iou_type="bbox").run()
    assert out["mAP"] == 0.0


def test_low_iou_no_match():
    res = [
        _result([[0, 0, 10, 10]], [0], [[0, 8, 10, 18]], [0], [0.9])
    ]
    out = FSISEGEval(results=res, n_ways=3, iou_type="bbox").run()
    assert out["mAP"] == 0.0


def test_duplicate_detection_penalized():
    # one gt, two overlapping dts of same class: 2nd is a FP.
    res = [
        _result(
            [[4, 4, 24, 24]], [0],
            [[4, 4, 24, 24], [5, 5, 25, 25]], [0, 0], [0.9, 0.8],
        )
    ]
    out = FSISEGEval(results=res, n_ways=3, iou_type="bbox").run()
    # AP on the 101-point grid: precision 1 up to recall 1, but FP after.
    # TP at rank 1 (p=1), FP at rank 2 → precision stays 1.0 at all
    # achieved recalls → AP 1.0, AR 1.0 (the FP doesn't reduce max recall)
    assert out["mAR"] == 1.0
    assert out["mAP"] == 1.0


def test_missed_gt_reduces_recall():
    res = [
        _result(
            [[4, 4, 24, 24], [40, 40, 60, 60]], [0, 0],
            [[4, 4, 24, 24]], [0], [0.9],
        )
    ]
    out = FSISEGEval(results=res, n_ways=3, iou_type="bbox").run()
    assert abs(out["mAR"] - 0.5) < 1e-9
    # precision 1.0 up to recall 0.5, 0 beyond → 101-pt mAP = 51/101
    assert abs(out["mAP"] - 51.0 / 101.0) < 1e-9


def test_score_ordering_matters():
    # FP scored above the TP drags interpolated precision to 0.5
    res = [
        _result(
            [[4, 4, 24, 24]], [0],
            [[40, 40, 60, 60], [4, 4, 24, 24]], [0, 0], [0.9, 0.8],
        )
    ]
    out = FSISEGEval(results=res, n_ways=3, iou_type="bbox").run()
    assert abs(out["mAP"] - 0.5) < 1e-9
    assert out["mAR"] == 1.0


def test_multiple_images_accumulate():
    r1 = _result([[4, 4, 24, 24]], [0], [[4, 4, 24, 24]], [0], [0.9])
    r2 = _result([[4, 4, 24, 24]], [0], np.zeros((0, 4)), [], [])
    out = FSISEGEval(results=[r1, r2], n_ways=3, iou_type="bbox").run()
    assert abs(out["mAR"] - 0.5) < 1e-9


def test_xywh_iou_crowd():
    d = [[0, 0, 10, 10]]
    g = [[0, 0, 20, 20]]
    assert abs(_xywh_iou(d, g, [0])[0, 0] - 100.0 / 400.0) < 1e-9
    assert abs(_xywh_iou(d, g, [1])[0, 0] - 1.0) < 1e-9


def test_segm_differs_from_bbox():
    # L-shaped gt mask vs rectangular dt mask: bbox IoU 1, mask IoU < 1
    h = w = 32
    gt_mask = np.zeros((h, w), np.uint8)
    gt_mask[4:20, 4:8] = 1
    gt_mask[16:20, 4:20] = 1
    res = {
        "qry_img_shape": np.array([h, w, 3]),
        "qry_bboxes": np.array([[4, 4, 20, 20]], np.float32),
        "qry_cat_ids": np.array([0]),
        "qry_isegmaps_rle": [R.encode(gt_mask)],
        "dt_bboxes": np.array([[4, 4, 20, 20]], np.float32),
        "dt_cat_ids": np.array([0]),
        "dt_scores": np.array([0.9], np.float32),
        "dt_isegmaps_rle": [R.encode(_mask(h, w, 4, 4, 20, 20))],
    }
    bbox = FSISEGEval(results=[res], n_ways=1, iou_type="bbox").run()
    segm = FSISEGEval(results=[res], n_ways=1, iou_type="segm").run()
    assert bbox["mAP"] == 1.0
    assert segm["mAP"] == 0.0  # mask IoU ≈ 0.44 < 0.5


def test_ap_matches_cocoeval_101pt_hand_computed():
    """Cross-check against a hand-computed pycocotools-semantics PR curve.

    One category, 3 gts, 4 dts with score-ordered match pattern
    [TP, FP, TP, TP]:
      recall    = [1/3, 1/3, 2/3, 1]
      precision = [1, 1/2, 2/3, 3/4] -> right-monotone [1, .75, .75, .75]
    COCOeval 101-point AP = (34*1.0 + 67*0.75) / 101 (recThrs 0.00..0.33
    read precision 1.0; 0.34..1.00 read 0.75). mAR = 1.0.
    """
    res = [
        _result(
            gt_boxes=[[0, 0, 10, 10], [20, 20, 30, 30], [40, 40, 50, 50]],
            gt_cats=[0, 0, 0],
            dt_boxes=[
                [0, 0, 10, 10],    # TP @0.9
                [0, 40, 10, 50],   # FP @0.8 (no gt overlap)
                [20, 20, 30, 30],  # TP @0.7
                [40, 40, 50, 50],  # TP @0.6
            ],
            dt_cats=[0, 0, 0, 0],
            dt_scores=[0.9, 0.8, 0.7, 0.6],
        )
    ]
    out = FSISEGEval(results=res, n_ways=1, iou_type="bbox").run()
    expected_ap = (34 * 1.0 + 67 * 0.75) / 101
    assert abs(out["mAP"] - expected_ap) < 1e-9
    assert out["mAR"] == 1.0
