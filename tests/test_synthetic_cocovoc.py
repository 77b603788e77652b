"""End-to-end COCO2VOC pipeline on the synthetic stand-in datasets.

The real COCO/VOC archives are absent from this image; these tests drive
the REAL loaders (COCODS, VOCDS), the episodic bindings (COCOFewShot,
VOCFewShot) and the FT merge path on generated data in the real on-disk
formats (tools/make_synthetic_cocovoc.py) — the same path the committed
runs/coco2voc_* artifacts use. Reference: fgn_train.py / fgn_ft.py +
coco_fst.py / voc_fst.py."""

import numpy as np
import pytest

from tools.make_synthetic_cocovoc import make_all


@pytest.fixture(scope="module")
def syn_roots(tmp_path_factory):
    root = tmp_path_factory.mktemp("cocovoc")
    make_all(
        coco_root=str(root / "COCO"),
        voc_root=str(root / "VOCdevkit" / "VOC2012"),
        coco_train=200, coco_val=40, voc_train=40, voc_val=10, seed=8,
        cache_roots=(str(root / "coco_cache"), str(root / "voc_cache")),
    )
    return root


def _coco_cfg(root, **over):
    cfg = dict(
        n_ways=3, k_shots=3, ds_base_="COCO", ds_base__subset="train",
        ds_novel="VOC", ds_novel_subset="val", sampling_origin_ds="COCO",
        sampling_origin_ds_subset="train", sampling_cats="base_",
        augment_qry=True, augment_spp=True, qry_mask_scale=4,
        sampling_scenario="parents", repeats=1, shuffle=True,
        qry_cats_choice_random=True, qry_cats_order_shuffle=True,
        spp_random=True, delete_qry_insts_in_spp_insts_on_train=True,
        finetune="Ignore", spp_fill_ratio=0.8, batch=4,
        root=str(root / "fst"), inner_root=str(root / "coco_cache"),
        coco_root=str(root / "COCO"),
        voc_root=str(root / "VOCdevkit" / "VOC2012"),
    )
    cfg.update(over)
    return cfg


def test_coco_stage1_episodes_and_collate(syn_roots):
    from fgn_tpu.data.batching import collate_episodes
    from fgn_tpu.data.fst_bindings import init_ds_class_by_config

    ds = init_ds_class_by_config(_coco_cfg(syn_roots))
    # novel split resolves to the 20 VOC-overlap categories by name
    assert len(ds.cats_novel) == 20 and len(ds.cats_base_) == 60
    assert len(ds) > 100
    samples = [ds[i] for i in range(4)]
    for s in samples:
        # 800/1333 aspect-preserving resize of the 480x640 sources
        assert s["qry_img"].shape == (800, 1066, 3)
        assert s["spp_imgs"].shape == (9, 256, 256, 3)  # NK=9, S=256
        # quarter-res query masks (qry_mask_scale=4)
        g = s["qry_bboxes"].shape[0]
        assert s["qry_isegmaps"].shape == (g, 200, 266)
        # stage-1 samples only base categories
        assert np.isin(s["qry_cat_ids_real"], ds.cats_base_).all()
    batch, meta = collate_episodes(
        samples, ds.mean, ds.std, max_gt=30, pad_hw=(800, 1072)
    )
    # collate rounds the canvas up to /32 (Pad(size_divisor=32) equiv)
    assert batch.qry_img.shape == (4, 800, 1088, 3)
    assert batch.spp_imgs.shape == (4, 9, 256, 256, 3)


def test_coco_ar_group_pad_is_static(syn_roots):
    from fgn_tpu.data.fst_bindings import init_ds_class_by_config

    ds = init_ds_class_by_config(_coco_cfg(syn_roots))
    ds.reshuffle(0)
    # single-AR synthetic COCO: AR grouping is a documented no-op and
    # every episode lands on the same (800, 1066) resize — one static
    # collate shape, one TPU compile variant
    assert ds._group_hw == {}
    sizes = {ds[i]["qry_img"].shape[:2] for i in (0, len(ds) // 2)}
    assert sizes == {(800, 1066)}


def test_voc_audit_catches_corrupt_images(syn_roots):
    from fgn_tpu.data.voc import VOCDS

    ds = VOCDS(
        imgs_set="trainval",
        root=str(syn_roots / "voc_cache"),
        voc_root=str(syn_roots / "VOCdevkit" / "VOC2012"),
        coco_root=str(syn_roots / "COCO"),
    )
    from fgn_tpu.utils.io import read_json

    excluded = read_json(str(syn_roots / "voc_cache" / "EXCLUDED_TRAINVAL.json"))
    reasons = read_json(
        str(syn_roots / "voc_cache" / "EXCLUDED_TRAINVAL_REASONS.json")
    )
    # the generator plants exactly two inconsistent train images
    assert len(excluded) == 2
    assert sorted(reasons.values()) == [
        "bbox-count mismatch", "category-set mismatch"
    ]
    assert len(ds) == 48  # 40 + 10 - 2 excluded
    s = ds[0]
    assert s["img"].ndim == 3 and len(s["bboxes"]) >= 2
    # VOC categories land in the COCO contiguous id space
    assert (s["cat_ids"] >= 0).all() and (s["cat_ids"] < 80).all()


def test_voc_novel_eval_episodes(syn_roots):
    from fgn_tpu.data.fst_bindings import init_ds_class_by_config

    cfg = _coco_cfg(
        syn_roots,
        sampling_origin_ds="VOC", sampling_origin_ds_subset="trainval",
        sampling_cats="novel", finetune="Use", shuffle=False,
        inner_root=str(syn_roots / "voc_cache"),
    )
    ds = init_ds_class_by_config(cfg)
    # FT=Use on VOC disables augmentation (reference voc_fst.py:18-24)
    assert ds.augment_qry is False and ds.augment_spp is False
    s = ds[0]
    assert np.isin(s["qry_cat_ids_real"], ds.cats_novel).all()
    # VOC resizes to the 512/512 target: shorter side 384, longer 512
    assert sorted(s["qry_img"].shape[:2]) == [384, 512]


def test_ft_merge_coco_base_with_voc_novel(syn_roots):
    from fgn_tpu.data.fst_bindings import init_ds_class_by_config

    ds0 = init_ds_class_by_config(
        _coco_cfg(syn_roots, finetune="Select", repeats=1)
    )
    ds1 = init_ds_class_by_config(
        _coco_cfg(
            syn_roots,
            sampling_origin_ds="VOC", sampling_origin_ds_subset="trainval",
            sampling_cats="novel", finetune="Select",
            inner_root=str(syn_roots / "voc_cache"),
        )
    )
    n0, n1 = len(ds0), len(ds1)
    assert n0 > 0 and n1 > 0
    ds0.merge_ds(ds1)
    assert len(ds0) == n0 + n1
    ds0.reshuffle(0)
    # AR groups bucket by (origin ds, AR) and each origin keeps its own
    # resize policy (COCO 800/1333, VOC 512/512) like the reference's
    # concatenated per-dataset pipelines — landscape VOC must NOT be
    # upscaled onto the landscape-COCO 800-canvas
    hws = set(ds0._group_hw.values())
    assert hws == {(800, 1072), (384, 512), (512, 384)}
    # a sample from each side of the merge resizes per its origin ds
    mid_sizes = {tuple(sorted(ds0[i]["qry_img"].shape[:2])) for i in
                 (0, len(ds0) - 1)}
    assert mid_sizes <= {(800, 1066), (384, 512)}
