"""Finetune-stage data plumbing: greedy FT selection, Select/Use modes,
merge_ds (reference call stack: SURVEY.md §3.4)."""

import os

import numpy as np
import pytest

from fgn_tpu.data.mnistiseg import MNISTISEG
from fgn_tpu.data.fst_bindings import MNISTFewShotISEG


@pytest.fixture(scope="module")
def ft_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ft")
    root = str(tmp / "raw")
    MNISTISEG.create(
        root=root, quantities={"train": 160, "val": 12, "test": 4}, seed=11
    )
    return root, str(tmp / "fst")


def _cfg(root, fst_root, **kw):
    cfg = dict(
        n_ways=3, k_shots=1,
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


def test_select_mode_restricts_images(ft_setup):
    root, fst_root = ft_setup
    full = MNISTFewShotISEG(_cfg(root, fst_root))
    sel = MNISTFewShotISEG(_cfg(root, fst_root, finetune="Select"))
    # Select keeps only the greedy-chosen subset → far fewer parents.
    assert 0 < len(sel.qrys_parents_) < len(full.qrys_parents_)
    # selection file cached with the reference naming
    sel_files = [f for f in os.listdir(fst_root) if "FINETUNE_REAL_INDICES" in f]
    assert sel_files
    # per-category instance budget ≈ 3K (base cats: [3K, 3K+1])
    K = sel.k_shots
    counts = np.zeros(sel.cats_total_amount, np.int64)
    for inst in sel.insts:
        counts[inst["cat_id"]] += 1
    for cat in sel.cats_to_save:
        assert counts[cat] <= 3 * K + 1


def test_use_mode_separates_supports(ft_setup):
    root, fst_root = ft_setup
    use = MNISTFewShotISEG(
        _cfg(root, fst_root, finetune="Use",
             sampling_cats="novel", ds_novel_subset="val")
    )
    # FT=Use: selected images are support-only (carry ft_img_sp, no
    # parent), all other images are queries whose insts are NOT in the
    # support pools.
    support_insts = [i for i in use.insts if "ft_img_sp" in i]
    assert support_insts
    pool_ids = {i for pool in use.cats_insts_list for i in pool}
    for iid in pool_ids:
        assert "ft_img_sp" in use.insts[iid]
    s = use[0]
    assert s["spp_imgs"].shape[0] == use.n_ways * use.k_shots


def test_merge_ds(ft_setup):
    root, fst_root = ft_setup
    ds0 = MNISTFewShotISEG(_cfg(root, fst_root, finetune="Select"))
    ds1 = MNISTFewShotISEG(
        _cfg(root, fst_root, finetune="Select", sampling_cats="novel")
    )
    n0, n1 = len(ds0.qrys_parents_), len(ds1.qrys_parents_)
    ds0.merge_ds(ds1)
    assert ds0.sampling_cats == "all" and ds0.finetune == "Ignore"
    assert "MERGED" in os.path.basename(ds0.databag_fp)
    # merged databag sees base+novel categories
    cats_seen = {i["cat_id"] for i in ds0.insts}
    assert any(c in (1, 3, 5, 7) for c in cats_seen)  # novel digits
    assert any(c in (0, 2, 4, 6, 8, 9) for c in cats_seen)
    # episodes sample from the merged pool
    s = ds0[0]
    assert len(s["cats_ids_to_sample_real"]) == 3


def test_support_pool_fallback_when_query_holds_all_instances(ft_setup):
    # Degenerate K=1 FT case observed in production (N3K1 grid cell):
    # the greedy novel selection reached only ONE instance for a cat, so
    # any episode querying that instance's image empties the support
    # pool after exclusion. The reference raises NotImplementedError
    # (base_fst.py:1067-1075); we fall back to the full pool (support ==
    # query instance) and count the event.
    root, fst_root = ft_setup
    use = MNISTFewShotISEG(
        _cfg(root, fst_root, finetune="Use",
             sampling_cats="novel", ds_novel_subset="val")
    )
    cat = int(use.insts[next(iter(
        i for pool in use.cats_insts_list for i in pool
    ))]["cat_id"])
    all_of_cat = list(use.cats_insts_list[cat])
    # exclude EVERY instance of the cat, as if they were all in-query
    imgs, bboxes, masks, ids = use.get_support([cat] * use.n_ways,
                                               qry_inst_ids=all_of_cat)
    assert set(int(v) for v in ids) <= set(all_of_cat)
    assert use._spp_pool_fallbacks.get(cat, 0) >= 1
