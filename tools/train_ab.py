"""Train-step remat A/B at the bench geometry (VERDICT r4 item 4).

Times the production b12 480px N3K3 train step with FGNConfig.remat
off vs full (backbone,res5,relation,mask) on the idle chip, chained
params (same methodology as bench.py's train section — two-call warmup
covers the donated-buffer recompile). The graphs are the same
(make_train_step) HLO bench.py lowers, so this run also pre-warms the
persistent compile cache for the round-end bench.

    python tools/train_ab.py [remat_variant ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass


def run(remat: str, B: int = 12, iters: int = 6, rounds: int = 3):
    from __graft_entry__ import _toy_batch
    from fgn_tpu.models.fgn import FGN, FGNConfig
    from fgn_tpu.parallel.mesh import make_mesh, shard_batch
    from fgn_tpu.train.optim import build_optimizer, make_lr_schedule
    from fgn_tpu.train.train_step import make_train_step

    cfg = FGNConfig(
        n_ways=3, k_shots=3, backbone_norm="gn", backbone_frozen=False,
        compute_dtype="bfloat16", remat=remat,
    )
    model = FGN(cfg=cfg)
    tbatch = _toy_batch(B=B, H=480, W=480, N=3, K=3, S=128)
    init = jax.jit(
        lambda k, b, r: model.init(k, b, r, method=FGN.train_forward)
    )
    params = init(jax.random.PRNGKey(0), tbatch, jax.random.PRNGKey(1))
    tx = build_optimizer(
        params, optimizer="adam",
        schedule=make_lr_schedule(5e-3, steps_per_epoch=1000),
    )
    opt_state = jax.jit(tx.init)(params)
    mesh = make_mesh()
    train_step, mesh = make_train_step(model, tx, mesh)
    tbatch = shard_batch(tbatch, mesh)
    rng = jax.random.PRNGKey(2)
    flops = 0.0
    try:
        cost = train_step.lower(
            params, opt_state, tbatch, rng
        ).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
    except Exception:
        pass
    p, o = params, opt_state
    for _ in range(2):  # covers the donated-buffer second compile
        p, o, m = train_step(p, o, tbatch, rng)
        float(np.asarray(m["loss_total"]))
    rates = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            p, o, m = train_step(p, o, tbatch, rng)
        float(np.asarray(m["loss_total"]))
        rates.append(B * iters / (time.perf_counter() - t0))
    rate = statistics.median(rates)
    peak = 197e12
    print(json.dumps({
        "remat": remat or "(off)",
        "imgs_s": round(rate, 2),
        "ms_per_step": round(1000 * B / rate, 1),
        "flops_per_img_g": round(flops / B / 1e9, 2) if flops else 0.0,
        "mfu_vs_true_flops": round(rate * flops / B / peak, 4) if flops else 0.0,
    }))


if __name__ == "__main__":
    variants = sys.argv[1:] or ["", "backbone,res5,relation,mask"]
    for v in variants:
        run("" if v in ("off", "(off)") else v)
