"""Aspect-ratio-grouped batching on a COCO-like mixed-AR dataset
(VERDICT round-1 item 4; reference reshuffle semantics
base_fst.py:605-732).

The fixture mixes three aspect classes; the test drives the FULL path:
reshuffle (grouping + chunk shuffle) → __getitem__ at group shapes →
collate → jitted train_step + test_forward on a mixed-AR-safe batch.
The model runs at reduced resolution (the grouping/static-shape logic is
resolution-independent); the 800×1333-scale group-shape math is asserted
host-side.
"""

import json
import os

import cv2
import numpy as np
import pytest

from fgn_tpu.data import rle as R
from fgn_tpu.data.batching import EpisodeLoader, collate_episodes
from fgn_tpu.data.fst_bindings import COCOFewShot


def _make_mixed_coco(tmp_path, sizes, n_per_size=4):
    coco_root = tmp_path / "COCO"
    (coco_root / "annotations").mkdir(parents=True)
    cats = [{"id": c, "name": f"cat{c}"} for c in (1, 2, 3, 4, 5)]
    for subset in ("train", "val"):
        img_dir = coco_root / f"{subset}2017"
        img_dir.mkdir()
        images, annotations = [], []
        aid = 1
        iid = 1
        for (h, w) in sizes:
            for _ in range(n_per_size):
                fname = f"{iid:012}.jpg"
                img = np.full((h, w, 3), 200, np.uint8)
                cv2.rectangle(img, (4, 4), (w // 3, h // 3), (255, 0, 0), -1)
                cv2.rectangle(
                    img, (w // 2, h // 2), (w - 4, h - 4), (0, 255, 0), -1
                )
                cv2.imwrite(str(img_dir / fname), img)
                images.append(
                    {"id": iid, "file_name": fname, "height": h, "width": w}
                )
                for bi, (x1, y1, x2, y2) in enumerate(
                    [(4, 4, w // 3, h // 3), (w // 2, h // 2, w - 4, h - 4)]
                ):
                    annotations.append({
                        "id": aid, "image_id": iid,
                        "category_id": (aid % 5) + 1,
                        "bbox": [x1, y1, x2 - x1, y2 - y1],
                        "area": (x2 - x1) * (y2 - y1), "iscrowd": 0,
                        "segmentation": [[x1, y1, x2, y1, x2, y2, x1, y2]],
                    })
                    aid += 1
                iid += 1
        with open(
            coco_root / "annotations" / f"instances_{subset}2017.json", "w"
        ) as f:
            json.dump(
                {"images": images, "annotations": annotations,
                 "categories": cats}, f,
            )
    return str(coco_root)


class SmallCOCOFewShot(COCOFewShot):
    """Reduced-resolution variant: grouping logic is identical."""

    spp_img_size = 32

    def make_inner_ds(self, ds_name, subset):
        ds = super().make_inner_ds(ds_name, subset)
        ds.target_size = 96
        ds.max_size = 160
        return ds


@pytest.fixture(scope="module")
def mixed_ds(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("arg")
    coco_root = _make_mixed_coco(
        tmp, sizes=[(64, 96), (96, 64), (80, 80)]
    )
    cfg = dict(
        n_ways=2, k_shots=1,
        ds_base_="COCO", ds_base__subset="train",
        ds_novel="COCO", ds_novel_subset="val",
        sampling_origin_ds="COCO", sampling_origin_ds_subset="train",
        sampling_cats="base_", sampling_scenario="parents",
        repeats=1, finetune="Ignore", shuffle=True,
        qry_cats_choice_random=True,
        delete_qry_insts_in_spp_insts_on_train=False,
        inner_root=str(tmp / "cache"), coco_root=coco_root,
        root=str(tmp / "fst"), batch=2,
    )
    ds = SmallCOCOFewShot(cfg)
    return ds


def test_groups_are_batch_homogeneous(mixed_ds):
    ds = mixed_ds
    ds.reshuffle(e=1)
    assert len(ds._group_hw) == len(ds.order)  # 3 AR classes → grouped
    bs = ds.batch
    for start in range(0, len(ds) - bs + 1, bs):
        hws = {ds._group_hw[i] for i in range(start, start + bs)}
        assert len(hws) == 1, f"mixed shapes inside batch at {start}: {hws}"
        h, w = hws.pop()
        assert h % 16 == 0 and w % 16 == 0
    # determinism: same epoch → same order and groups
    order1, groups1 = ds.order.copy(), dict(ds._group_hw)
    ds.reshuffle(e=1)
    assert np.array_equal(ds.order, order1) and ds._group_hw == groups1


def test_samples_and_collate_at_group_shapes(mixed_ds):
    ds = mixed_ds
    ds.reshuffle(e=2)
    bs = ds.batch
    import random

    random.seed(0)
    for start in range(0, min(len(ds), 3 * bs), bs):
        samples = [ds[i] for i in range(start, start + bs)]
        shapes = {s["qry_img"].shape for s in samples}
        assert len(shapes) == 1
        batch, meta = collate_episodes(samples, ds.mean, ds.std, max_gt=6)
        # canvas = sample size rounded up to /32 (Pad(size_divisor=32))
        h, w = samples[0]["qry_img"].shape[:2]
        assert batch.qry_img.shape[1:3] == (-(-h // 32) * 32, -(-w // 32) * 32)


def test_train_and_test_forward_on_grouped_batches(mixed_ds):
    import jax

    from fgn_tpu.models.fgn import FGN, FGNConfig

    ds = mixed_ds
    ds.reshuffle(e=1)
    cfg = FGNConfig(
        n_ways=2, k_shots=1, backbone_norm="gn", backbone_frozen=False,
        rpn_train_nms_pre=128, rpn_train_max_per_img=32,
        rpn_test_nms_pre=128, rpn_test_max_per_img=16,
        rpn_num_samples=8, rcnn_num_samples=8, rcnn_max_per_img=4,
    )
    model = FGN(cfg=cfg)
    loader = EpisodeLoader(ds, ds.batch, max_gt=6)
    batches = [b for b, _ in loader]
    shapes = {b.qry_img.shape for b in batches}
    assert len(shapes) > 1, "expected multiple group shapes in the epoch"
    # one jitted fn per static shape — take two different-shape batches
    seen = {}
    for b in batches:
        seen.setdefault(b.qry_img.shape, b)
    two = list(seen.values())[:2]
    params = jax.jit(
        lambda k, b, r: model.init(k, b, r, method=FGN.train_forward)
    )(jax.random.PRNGKey(0), two[0], jax.random.PRNGKey(1))
    for b in two:
        losses = jax.jit(
            lambda p, bb, r: model.apply(p, bb, r, method=FGN.train_forward)
        )(params, b, jax.random.PRNGKey(2))
        assert np.isfinite(float(losses["loss_total"])) if "loss_total" in losses \
            else np.isfinite(float(sum(v for k, v in losses.items()
                                       if k.startswith("loss_"))))
    out = jax.jit(lambda p, bb: model.apply(p, bb, method=FGN.test_forward))(
        params, two[0]
    )
    assert out["dt_boxes"].shape[1] == cfg.rcnn_max_per_img


def test_group_shapes_at_coco_scale():
    """Host-side: the 800×1333 group targets the reference trains at
    (coco_ds.py:34-35) stay stride-16-aligned and AR-consistent."""
    from fgn_tpu.data.synth import get_new_shape

    for (h, w) in [(480, 640), (640, 480), (427, 640), (500, 375)]:
        nh, nw = get_new_shape(h, w, 800, 1333)
        assert min(nh, nw) <= 800 and max(nh, nw) <= 1333
        snapped = tuple(int(-16 * (-v // 16)) for v in (nh, nw))
        assert snapped[0] % 16 == 0 and snapped[1] % 16 == 0
        assert abs(snapped[0] / snapped[1] - h / w) < 0.15
