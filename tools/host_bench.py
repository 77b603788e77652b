"""Host episode-pipeline throughput: episodes/s end-to-end.

VERDICT round-1 item 3: measure the loader→device feed rate, the usual
training bottleneck on this single-core host. Reports:

  * raw ``ds[i]`` episodes/s (episode construction only);
  * collated batches/s through EpisodeLoader (construction + collate +
    prefetch thread), i.e. the rate the device actually sees;
  * the per-phase split (query / support / collate).

    python tools/host_bench.py [n_episodes] [--n3k3]

Run on an otherwise idle host — a concurrent training process's tunnel
traffic burns ~half the core in system time and invalidates numbers.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from fgn_tpu.data.batching import EpisodeLoader
from fgn_tpu.data.fst_bindings import MNISTFewShotISEG


def main(n: int = 60, n3k3: bool = False):
    N, K = (3, 3) if n3k3 else (1, 1)
    cfg = dict(
        n_ways=N, k_shots=K,
        ds_base_="MNISTISEG", ds_base__subset="train",
        ds_novel="MNISTISEG", ds_novel_subset="val",
        sampling_origin_ds="MNISTISEG", sampling_origin_ds_subset="train",
        sampling_cats="base_", sampling_scenario="parents",
        repeats=1, finetune="Ignore", shuffle=True,
        qry_cats_choice_random=True, augment_qry=True, augment_spp=True,
        spp_random=True,
    )
    ds = MNISTFewShotISEG(cfg)
    [ds[i] for i in range(3)]  # warm caches

    t_query = t_support = 0.0
    oq, os_ = ds.get_query, ds.get_support

    def q(*a, **k):
        nonlocal t_query
        t0 = time.perf_counter()
        r = oq(*a, **k)
        t_query += time.perf_counter() - t0
        return r

    def s(*a, **k):
        nonlocal t_support
        t0 = time.perf_counter()
        r = os_(*a, **k)
        t_support += time.perf_counter() - t0
        return r

    ds.get_query, ds.get_support = q, s
    t0 = time.perf_counter()
    for i in range(n):
        ds[i % len(ds)]
    dt = time.perf_counter() - t0
    ds.get_query, ds.get_support = oq, os_

    print(
        f"episode construction: {n / dt:.1f} eps/s "
        f"({dt / n * 1000:.1f} ms/ep; query {t_query / n * 1000:.1f}, "
        f"support {t_support / n * 1000:.1f})"
    )

    bs = 12 if not n3k3 else 8
    loader = EpisodeLoader(ds, bs, max_gt=12)
    t0 = time.perf_counter()
    count = 0
    for batch, _ in loader:
        count += 1
        if count >= max(n // bs, 3):
            break
    dt = time.perf_counter() - t0
    print(
        f"loader (b{bs}, incl. collate+prefetch): "
        f"{count * bs / dt:.1f} eps/s ({dt / count:.2f} s/batch)"
    )


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 60
    main(n, n3k3="--n3k3" in sys.argv)
