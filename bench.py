"""Benchmark: episodic inference throughput (query imgs/sec/chip).

The BASELINE.json metric. Runs the flagship FGN (OMNIISEG N3 K3
geometry: 480×480 queries, 9 support crops of 128×128, full test path
incl. proposals, NMS, relation head, mask head) on whatever accelerator
jax exposes and prints ONE JSON line.

``vs_baseline``: the reference publishes no throughput numbers
(BASELINE.md) — its stack cannot run here (CUDA-only). Until a measured
torch-GPU number exists, vs_baseline reports the ratio against the
previous round's recorded value (BENCH_r*.json) or 1.0 on first run.
"""

from __future__ import annotations

import glob
import json
import os
import time

import jax
import numpy as np


def main():
    from __graft_entry__ import _toy_batch
    from fgn_tpu.models.fgn import FGN, FGNConfig

    B = int(os.environ.get("BENCH_BATCH", 4))
    cfg = FGNConfig(
        n_ways=3, k_shots=3, backbone_norm="gn", backbone_frozen=False,
        compute_dtype="bfloat16",
    )
    model = FGN(cfg=cfg)
    batch = _toy_batch(B=B, H=480, W=480, N=3, K=3, S=128)

    init = jax.jit(
        lambda k, b, r: model.init(k, b, r, method=FGN.train_forward)
    )
    params = init(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1))

    step = jax.jit(lambda p, b: model.apply(p, b, method=FGN.test_forward))
    out = step(params, batch)
    jax.block_until_ready(out)

    # Timed runs: several pipelined rounds, best round wins — the axon
    # tunnel has high latency variance and a single long window can be
    # dominated by one hiccup.
    n_iters = int(os.environ.get("BENCH_ITERS", 8))
    n_rounds = int(os.environ.get("BENCH_ROUNDS", 5))
    best_dt = float("inf")
    for _ in range(n_rounds):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = step(params, batch)
        jax.block_until_ready(out)
        best_dt = min(best_dt, time.perf_counter() - t0)
    qps = B * n_iters / best_dt

    prev = None
    for fp in sorted(glob.glob("BENCH_r*.json")):
        try:
            rec = json.load(open(fp))
            prev = float(rec.get("value", prev))
        except Exception:
            pass
    vs = qps / prev if prev else 1.0

    print(
        json.dumps(
            {
                "metric": "query imgs/sec/chip (episodic inference, N3K3 480px)",
                "value": round(qps, 2),
                "unit": "imgs/sec/chip",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
