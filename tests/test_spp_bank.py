"""Pre-built support bank (VERDICT r4 item 2, SURVEY §7 hard part 5).

The bank must be byte-identical to the on-the-fly crop path
(_make_support_crop), persist across dataset reloads, and rebuild when
the eligible instance set changes.
"""

import os

import numpy as np
import pytest

from tests.test_train_e2e import TinyFewShot, TinyMNISTISEG


@pytest.fixture(scope="module")
def roots(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("sppbank")
    root = str(tmp / "raw")
    TinyMNISTISEG.create(
        root=root, quantities={"train": 10, "val": 2, "test": 2}, seed=13
    )
    return root, str(tmp / "fst")


def _cfg(root, fst_root, **kw):
    cfg = dict(
        n_ways=1, k_shots=1,
        ds_base_="MNISTISEG", ds_base__subset="train",
        ds_novel="MNISTISEG", ds_novel_subset="val",
        sampling_origin_ds="MNISTISEG", sampling_origin_ds_subset="train",
        sampling_cats="base_", sampling_scenario="parents",
        repeats=1, finetune="Ignore", shuffle=False,
        qry_cats_choice_random=True,
        delete_qry_insts_in_spp_insts_on_train=False,
        inner_root=root, root=fst_root,
    )
    cfg.update(kw)
    return cfg


def test_bank_pickles_by_path_not_value(roots):
    """ADVICE r4: pickling the dataset (grain worker_count>0 sends it to
    worker processes) must NOT serialize the memmapped bank arrays by
    value — only their paths — and the unpickled dataset must reopen
    them and serve byte-identical crops."""
    import pickle

    root, fst = roots
    ds = TinyFewShot(_cfg(root, fst))
    assert ds._spp_bank is not None
    state = ds.__getstate__()
    assert isinstance(state["_spp_bank"]["imgs"], str)
    assert isinstance(state["_spp_bank"]["masks"], str)
    blob = pickle.dumps(ds)
    # original dataset unharmed (its memmaps stay open)
    assert not isinstance(ds._spp_bank["imgs"], str)

    ds2 = pickle.loads(blob)
    assert isinstance(ds2._spp_bank["imgs"], np.memmap)
    eligible = sorted({i for pool in ds.cats_insts_list for i in pool})
    for inst_id in eligible[:3]:
        a = ds._crop_support(ds.insts[inst_id], inst_id)
        b = ds2._crop_support(ds2.insts[inst_id], inst_id)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)


def test_bank_matches_compute_path(roots):
    root, fst = roots
    ds = TinyFewShot(_cfg(root, fst))
    assert ds._spp_bank is not None
    for k in ("imgs", "masks", "bboxes", "ids"):
        assert os.path.isfile(f"{ds._spp_bank_prefix}_{k}.npy")

    nobank = TinyFewShot(_cfg(root, fst, spp_bank=False))
    assert nobank._spp_bank is None

    eligible = sorted({i for pool in ds.cats_insts_list for i in pool})
    assert eligible
    for inst_id in eligible:
        img_b, bb_b, m_b = ds._crop_support(ds.insts[inst_id], inst_id)
        img_c, bb_c, m_c = nobank._crop_support(
            nobank.insts[inst_id], inst_id
        )
        np.testing.assert_array_equal(img_b, img_c)
        np.testing.assert_array_equal(m_b, m_c)
        np.testing.assert_allclose(bb_b, bb_c)


def test_bank_reload_skips_rebuild_and_episodes_match(roots):
    root, fst = roots
    ds1 = TinyFewShot(_cfg(root, fst))
    ids_fp = f"{ds1._spp_bank_prefix}_ids.npy"
    mtime = os.path.getmtime(ids_fp)
    ds2 = TinyFewShot(_cfg(root, fst))
    assert os.path.getmtime(ids_fp) == mtime, "bank rebuilt needlessly"
    # full episodes identical under the same rng stream
    import random as _r

    _r.seed(3)
    e1 = ds1[0]
    _r.seed(3)
    e2 = ds2[0]
    for key in ("spp_imgs", "spp_bboxes", "spp_isegmaps", "qry_img"):
        np.testing.assert_array_equal(e1[key], e2[key])


def test_bank_rebuilds_on_stale_ids(roots):
    root, fst = roots
    ds = TinyFewShot(_cfg(root, fst))
    ids_fp = f"{ds._spp_bank_prefix}_ids.npy"
    ids = np.load(ids_fp)
    np.save(ids_fp, ids[:-1])  # corrupt: one id missing
    ds2 = TinyFewShot(_cfg(root, fst))
    assert (np.load(ids_fp) == ids).all(), "stale bank not rebuilt"
    assert ds2._spp_bank is not None
    assert len(ds2._spp_bank["row"]) == len(ids)
