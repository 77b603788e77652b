"""Committed visual-regression goldens (VERDICT r3 item 8).

The reference commits contact-sheet / audit-evidence fixtures
(datasets/fewshotiseg/resources/omniiseg_fst/visualize_examples/,
datasets/voc/resources/IOU Mismatch/) that double as visual regression
anchors. This repo's data/ directory is wiped between rounds, so the
goldens here are generated from SEEDED tiny datasets built entirely
in-test and compared against small PNGs committed under
``tests/goldens/`` — green from a clean checkout with no data present.

Regenerate after an intentional renderer change with:

    FGN_REGEN_GOLDENS=1 python -m pytest tests/test_visual_goldens.py -q

and commit the updated tests/goldens/*.png.
"""

import os

import cv2
import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
REGEN = os.environ.get("FGN_REGEN_GOLDENS", "") == "1"


def _ssim(a: np.ndarray, b: np.ndarray) -> float:
    """Global-window SSIM on grayscale float images (no skimage dep)."""
    a = cv2.cvtColor(a, cv2.COLOR_RGB2GRAY).astype(np.float64)
    b = cv2.cvtColor(b, cv2.COLOR_RGB2GRAY).astype(np.float64)
    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    mu_a, mu_b = a.mean(), b.mean()
    va, vb = a.var(), b.var()
    cov = ((a - mu_a) * (b - mu_b)).mean()
    return float(
        (2 * mu_a * mu_b + c1) * (2 * cov + c2)
        / ((mu_a**2 + mu_b**2 + c1) * (va + vb + c2))
    )


def _check_or_regen(img_fp: str, golden_name: str):
    """Compare a rendered PNG against its committed golden (or rewrite
    the golden in regen mode)."""
    got = cv2.imread(img_fp, cv2.IMREAD_COLOR)[..., ::-1]
    golden_fp = os.path.join(GOLDEN_DIR, golden_name)
    if REGEN:
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        cv2.imwrite(golden_fp, got[..., ::-1])
        return
    assert os.path.exists(golden_fp), (
        f"missing golden {golden_name}; run with FGN_REGEN_GOLDENS=1"
    )
    want = cv2.imread(golden_fp, cv2.IMREAD_COLOR)[..., ::-1]
    assert got.shape == want.shape, (
        f"{golden_name}: shape {got.shape} != golden {want.shape}"
    )
    mad = float(np.abs(got.astype(np.int16) - want.astype(np.int16)).mean())
    ssim = _ssim(got, want)
    assert mad < 2.0 and ssim > 0.98, (
        f"{golden_name}: mean-abs-diff {mad:.2f}, ssim {ssim:.4f} — "
        "render drifted from the committed golden"
    )


@pytest.fixture(scope="module")
def tiny_fst(tmp_path_factory):
    from tests.test_train_e2e import TinyFewShot, TinyMNISTISEG

    tmp = tmp_path_factory.mktemp("goldens")
    root = str(tmp / "raw")
    TinyMNISTISEG.create(
        root=root, quantities={"train": 8, "val": 2, "test": 2}, seed=11
    )
    cfg = dict(
        n_ways=1, k_shots=1,
        ds_base_="MNISTISEG", ds_base__subset="train",
        ds_novel="MNISTISEG", ds_novel_subset="val",
        sampling_origin_ds="MNISTISEG", sampling_origin_ds_subset="train",
        sampling_cats="base_", sampling_scenario="parents",
        repeats=1, finetune="Ignore", shuffle=False,
        qry_cats_choice_random=True,
        delete_qry_insts_in_spp_insts_on_train=False,
        inner_root=root, root=str(tmp / "fst"),
    )
    return TinyFewShot(cfg), str(tmp)


def test_episode_contact_sheet_goldens(tiny_fst):
    """Reference parity: base_fst.visualize_item_pro contact sheets
    committed as visualize_examples/Image 000*.png."""
    ds, tmp = tiny_fst
    out = os.path.join(tmp, "sheets")
    ds.visualize(out, n=2, seed=8)
    names = sorted(os.listdir(out))
    assert len(names) == 2
    for i, name in enumerate(names):
        _check_or_regen(
            os.path.join(out, name), f"contact_sheet_{i:02d}.png"
        )


def test_voc_audit_evidence_goldens(tmp_path):
    """Reference parity: datasets/voc/resources/'IOU Mismatch'/ evidence
    renders for images the audits excluded."""
    from fgn_tpu.data.voc import VOCDSParse
    from tests.test_voc import _make_fake_voc

    voc_root = _make_fake_voc(tmp_path)
    cache_root = str(tmp_path / "cache")
    os.makedirs(cache_root, exist_ok=True)
    p = VOCDSParse("trainval", voc_root=voc_root, root=cache_root)
    out = str(tmp_path / "evidence")
    n = p.dump_evidence(out)
    assert n == 2
    for name in sorted(os.listdir(out)):
        if not name.endswith(".png"):
            continue
        _check_or_regen(
            os.path.join(out, name), f"voc_evidence_{name}"
        )


def test_detection_result_render_golden(tiny_fst):
    """visualize_result (GT vs detections panel) with a synthetic
    detection dict — covers box/label/mask drawing without a model."""
    from fgn_tpu.data import rle as RLE

    ds, tmp = tiny_fst
    s = ds[0]
    h, w = s["qry_img"].shape[:2]
    m = np.zeros((h, w), np.uint8)
    m[10:40, 20:60] = 1
    res = {
        "qry_img_shape": (h, w, 3),
        "qry_bboxes": s["qry_bboxes"],
        "qry_cat_ids": s["qry_cat_ids"],
        "qry_isegmaps_rle": [RLE.encode(m)],
        "dt_bboxes": np.array([[10.0, 20.0, 40.0, 60.0]]),
        "dt_cat_ids": np.array([0]),
        "dt_scores": np.array([0.87]),
        "dt_isegmaps_rle": [RLE.encode(m)],
    }
    out = os.path.join(tmp, "result_render")
    ds.visualize_result(res, out, "res.png")
    _check_or_regen(os.path.join(out, "res.png"), "result_render.png")
