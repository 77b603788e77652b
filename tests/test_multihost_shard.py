"""Multi-host input sharding (VERDICT r3 stretch item 9, SURVEY §2.8
'host data parallelism'): two simulated hosts driving GrainEpisodeLoader
with shard_count=2 must together consume exactly the unsharded epoch —
no episode twice, none dropped (beyond the shared drop_last tail).
"""

import numpy as np
import pytest

from fgn_tpu.data.loader_grain import GrainEpisodeLoader
from tests.test_train_e2e import TinyFewShot, TinyMNISTISEG


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("shard")
    root = str(tmp / "raw")
    TinyMNISTISEG.create(
        root=root, quantities={"train": 12, "val": 2, "test": 2}, seed=5
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
    return TinyFewShot(cfg)


def _consumed(loader):
    out = []
    for batch, meta in loader:
        out.extend(int(v) for v in np.asarray(meta.idx)[: meta.n_real or len(meta.idx)])
    return out


@pytest.mark.parametrize("worker_count", [0, 2])
def test_two_shards_partition_the_epoch(ds, worker_count):
    bs = 2
    full = _consumed(
        GrainEpisodeLoader(ds, bs, max_gt=8, worker_count=0)
    )
    shards = [
        _consumed(
            GrainEpisodeLoader(
                ds, bs, max_gt=8, worker_count=worker_count,
                shard_index=i, shard_count=2,
            )
        )
        for i in range(2)
    ]
    s0, s1 = (set(s) for s in shards)
    assert not (s0 & s1), f"episodes consumed twice: {sorted(s0 & s1)}"
    assert sorted(shards[0] + shards[1]) == sorted(full), (
        "union of shards != unsharded epoch"
    )
    assert s0 and s1, "a shard was empty"
