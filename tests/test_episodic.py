import os

import numpy as np
import pytest

from fgn_tpu.data.batching import EpisodeLoader, collate_episodes
from fgn_tpu.data.mnistiseg import MNISTISEG
from fgn_tpu.data.fst_bindings import MNISTFewShotISEG


@pytest.fixture(scope="session")
def tiny_mnistiseg(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data") / "mnistiseg")
    MNISTISEG.create(
        root=root, quantities={"train": 48, "val": 8, "test": 8}, seed=5
    )
    return root


def _make_cfg(root, fst_root, **overrides):
    cfg = dict(
        n_ways=3,
        k_shots=1,
        ds_base_="MNISTISEG",
        ds_base__subset="train",
        ds_novel="MNISTISEG",
        ds_novel_subset="val",
        sampling_origin_ds="MNISTISEG",
        sampling_origin_ds_subset="train",
        sampling_cats="base_",
        sampling_scenario="parents",
        repeats=1,
        finetune="Ignore",
        inner_root=root,
        root=fst_root,
        qry_cats_choice_random=True,
        shuffle=False,
    )
    cfg.update(overrides)
    return cfg


@pytest.fixture(scope="session")
def fst(tiny_mnistiseg, tmp_path_factory):
    fst_root = str(tmp_path_factory.mktemp("fst"))
    return MNISTFewShotISEG(_make_cfg(tiny_mnistiseg, fst_root))


def test_raw_ds_loads(tiny_mnistiseg):
    ds = MNISTISEG(imgs_set="train", root=tiny_mnistiseg)
    assert len(ds) == 48
    item = ds[0]
    assert item["img"].shape == (512, 512, 3)
    assert len(item["bboxes"]) == len(item["cat_ids"]) == len(item["isegmaps"])
    assert len(item["bboxes"]) >= 2
    # masks land inside their boxes
    for b, m in zip(item["bboxes"].astype(int), item["isegmaps"]):
        assert m[b[0] : b[2], b[1] : b[3]].sum() == m.sum()


def test_category_split(fst):
    assert fst.cats_total_amount == 10
    assert sorted(fst.cats_novel.tolist()) == [1, 3, 5, 7]
    assert sorted(fst.cats_base_.tolist()) == [0, 2, 4, 6, 8, 9]
    assert set(fst.cats_to_save.tolist()) == set(fst.cats_base_.tolist())
    # databag cached
    assert os.path.exists(fst.databag_fp)
    assert "MNISTISEG2MNISTISEG" in os.path.basename(fst.databag_fp)
    assert "FT_Ignore" in os.path.basename(fst.databag_fp)


def test_databag_consistency(fst):
    # every child references a parent and an on-image category
    for parent_idx, cat_id in fst.qrys_children:
        parent = fst.qrys_parents_[parent_idx]
        assert cat_id in parent["cats_dict"]
    # support pools only contain saved categories
    for cat_id, pool in enumerate(fst.cats_insts_list):
        if len(pool):
            assert fst.cats_to_save_bool[cat_id]
            for inst_id in pool:
                assert fst.insts[inst_id]["cat_id"] == cat_id


def test_episode_structure(fst):
    np.random.seed(0)
    import random

    random.seed(0)
    s = fst[0]
    N, K = fst.n_ways, fst.k_shots
    assert s["qry_img"].dtype == np.uint8
    assert s["qry_img"].shape == (480, 480, 3)  # 512 → target 480
    assert s["spp_imgs"].shape == (N * K, 128, 128, 3)
    assert s["spp_bboxes"].shape == (N * K, 4)
    assert s["spp_isegmaps"].shape == (N * K, 128, 128)
    assert len(s["cats_ids_to_sample_real"]) == N
    # remap: episode ids are positions in cats_ids_to_sample_real
    for real, ep in zip(s["qry_cat_ids_real"], s["qry_cat_ids"]):
        assert s["cats_ids_to_sample_real"][ep] == real
    # no novel cats anywhere
    assert all(c in fst.cats_base_ for c in s["cats_ids_to_sample_real"])
    # gt boxes within image
    h, w = s["qry_img"].shape[:2]
    b = s["qry_bboxes"]
    if len(b):
        assert (b[:, [0, 2]] <= h + 1).all() and (b[:, [1, 3]] <= w + 1).all()
    # support boxes inside crops
    sb = s["spp_bboxes"]
    assert (sb >= -1).all() and (sb <= 128 + 1).all()
    # support masks overlap their boxes
    for i in range(N * K):
        y1, x1, y2, x2 = sb[i].astype(int)
        assert s["spp_isegmaps"][i, max(y1, 0) : y2, max(x1, 0) : x2].sum() > 0


def test_episode_replay_deterministic(fst):
    import random

    random.seed(1)
    s = fst[1]
    replay = fst.__getitem__(
        1,
        _qry_child_idx=int(s["qry_child_idx"]),
        _cats_ids_to_sample_real=s["cats_ids_to_sample_real"],
        _spp_insts_ids=s["spp_insts_ids"],
    )
    assert np.array_equal(replay["qry_bboxes"], s["qry_bboxes"])
    assert np.array_equal(replay["spp_insts_ids"], s["spp_insts_ids"])
    assert np.array_equal(replay["spp_imgs"], s["spp_imgs"])


def test_support_excludes_query_instances(fst):
    import random

    for trial in range(5):
        random.seed(trial)
        s = fst[trial % len(fst)]
        # no support instance is one of the query instances
        parent_idx, _ = fst.qrys_children[int(s["qry_child_idx"])]
        qry_inst_ids = set()
        for insts in fst.qrys_parents_[parent_idx]["cats_dict"].values():
            qry_inst_ids.update(insts)
        assert not (set(s["spp_insts_ids"].tolist()) & qry_inst_ids)


def test_databag_cache_reload(tiny_mnistiseg, tmp_path_factory, fst):
    # Second construction must load the pickled databag (raw arrays unread)
    ds2 = MNISTFewShotISEG(_make_cfg(tiny_mnistiseg, fst.root))
    assert len(ds2.qrys_children) == len(fst.qrys_children)
    assert len(ds2.insts) == len(fst.insts)


def test_reshuffle_seeded(fst):
    base = fst.order_initial.copy()
    fst.shuffle = True
    fst.reshuffle(e=1)
    o1 = fst.order.copy()
    fst.reshuffle(e=1)
    o2 = fst.order.copy()
    fst.reshuffle(e=2)
    o3 = fst.order.copy()
    fst.shuffle = False
    fst.reshuffle()
    assert np.array_equal(o1, o2)
    assert not np.array_equal(o1, o3) or len(o1) < 4
    assert sorted(o1.tolist()) == sorted(base.tolist())
    assert np.array_equal(fst.order, base)


def test_first_parents_truncation(tiny_mnistiseg, fst):
    ds = MNISTFewShotISEG(
        _make_cfg(tiny_mnistiseg, fst.root, first_parents__only=3, repeats=2)
    )
    assert len(ds.order_initial) == 6  # 3 parents × 2 repeats


def test_state_dict_roundtrip(fst):
    state = fst.state_dict()
    order_before = fst.order.copy()
    fst.shuffle = True
    fst.reshuffle(e=3)
    fst.shuffle = False
    fst.load_state_dict(state)
    assert np.array_equal(fst.order, order_before)


def test_collate_shapes(fst):
    import random

    random.seed(0)
    samples = [fst[i] for i in range(2)]
    batch, meta = collate_episodes(samples, fst.mean, fst.std, max_gt=8)
    B, H, W = 2, 480, 480
    assert batch.qry_img.shape == (B, H, W, 3)
    assert batch.qry_boxes.shape == (B, 8, 4)
    assert batch.qry_masks.shape == (B, 8, 120, 120)
    assert batch.spp_imgs.shape == (B, 3, 128, 128, 3)
    assert batch.img_hw.tolist() == [[480, 480], [480, 480]]
    # YXYX → XYXY flip happened
    g0 = samples[0]["qry_bboxes"][0]
    assert np.allclose(batch.qry_boxes[0, 0], [g0[1], g0[0], g0[3], g0[2]])
    # padding slots invalid
    n0 = len(samples[0]["qry_bboxes"])
    assert batch.qry_valid[0, :n0].all() and not batch.qry_valid[0, n0:].any()
    # images stay uint8; normalization stats ride in the batch
    assert batch.qry_img.dtype == np.uint8
    assert np.allclose(batch.norm_mean, fst.mean)


def test_episode_loader(fst):
    loader = EpisodeLoader(fst, batch_size=2, max_gt=8)
    batches = list(iter(loader))
    assert len(batches) == len(fst) // 2
    b0, m0 = batches[0]
    assert b0.qry_img.shape[0] == 2
    assert m0.idx.tolist() == [0, 1]


def test_grain_loader_matches_threaded(fst):
    import random

    from fgn_tpu.data.loader_grain import GrainEpisodeLoader

    random.seed(0)
    threaded = [b for b, _ in EpisodeLoader(fst, batch_size=2, max_gt=8)]
    random.seed(0)
    grain_batches = [
        b for b, _ in GrainEpisodeLoader(fst, batch_size=2, max_gt=8,
                                         worker_count=0)
    ]
    assert len(grain_batches) == len(threaded)
    b0, g0 = threaded[0], grain_batches[0]
    assert b0.qry_img.shape == g0.qry_img.shape
    assert np.array_equal(np.asarray(b0.img_hw), np.asarray(g0.img_hw))


def test_children_scenario(tiny_mnistiseg, fst, tmp_path_factory):
    """children sampling: one order entry per (parent image, on-image
    category); the episode's main cat is the child's cat, not a random
    pick (reference fgn_ft.py:38,68,98 runs the whole FT pipeline under
    sampling_scenario='children')."""
    ds = MNISTFewShotISEG(
        _make_cfg(tiny_mnistiseg, fst.root, sampling_scenario="children")
    )
    n_children = len(ds.qrys_children)
    n_parents = len(ds.qrys_parents_)
    assert len(ds) == n_children > n_parents  # multi-cat images expand

    # each child entry must produce an episode whose sampled cats include
    # exactly that child's category as the main cat
    seen_parents = set()
    for idx in range(min(n_children, 12)):
        entry = int(ds.order[idx])
        p_idx, cat = (int(v) for v in ds.qrys_children[entry])
        s = ds[idx]
        assert s["qry_child_idx"] == entry
        assert int(s["cats_ids_to_sample_real"][0]) == cat or cat in [
            int(c) for c in s["cats_ids_to_sample_real"]
        ]
        # the child's own category must appear among the query's gt cats
        assert cat in [int(c) for c in s["qry_cat_ids_real"]]
        seen_parents.add(p_idx)

    # every (parent, cat) pair is enumerated exactly once per repeat
    pairs = {tuple(int(v) for v in c) for c in ds.qrys_children}
    assert len(pairs) == n_children
    for p_idx, p in enumerate(ds.qrys_parents_):
        for cat in p["cats_dict"]:
            assert (p_idx, int(cat)) in pairs


def test_episode_loader_worker_death_no_deadlock(monkeypatch):
    """Regression: a producer exception while the prefetch queue is FULL
    must still deliver the stop sentinel (a put_nowait there drops it
    silently → the consumer blocks in q.get() forever; observed as a
    production deadlock in a fresh-support eval pass)."""
    import threading
    import time as _time

    class _FakeDS:
        def __len__(self):
            return 20

    loader = EpisodeLoader(_FakeDS(), batch_size=2, prefetch=2)
    boom = RuntimeError("constructed episode is broken")

    def fake_build(self, indices):
        if indices[0] >= 8:
            raise boom
        return ("batch", indices)

    monkeypatch.setattr(EpisodeLoader, "_build", fake_build)

    got, raised = [], []

    def consume():
        try:
            for item in loader:
                got.append(item)
                _time.sleep(0.2)  # slow consumer → queue stays full
        except RuntimeError as e:
            raised.append(e)

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    t.join(timeout=30)
    assert not t.is_alive(), "EpisodeLoader deadlocked after worker death"
    assert raised and raised[0] is boom
    assert len(got) == 4  # batches 0,2,4,6 built before the failure
