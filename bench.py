"""Benchmark: episodic inference + train-step throughput with MFU.

The BASELINE.json metric (query imgs/sec/chip, episodic inference) on the
flagship FGN geometry: OMNIISEG N3 K3, 480×480 queries, 9 support crops
of 128×128, the full test path (backbone, AG-RPN, proposals+NMS,
relation head, mask head), bf16 compute, Pallas RoIAlign.

Reported numbers (all in the one JSON line the driver records):
  * ``value``           — median PIPELINED imgs/s/chip over rounds of
                          ``BENCH_ITERS`` dispatched back-to-back with a
                          single final block (steady-state device rate;
                          the tunnel RTT is amortized);
  * ``blocked``         — median imgs/s with a block_until_ready every
                          step (includes one tunnel round-trip per step —
                          a LOWER bound; the training loop overlaps this);
  * ``train``           — train-step imgs/s (pipelined), same geometry;
  * ``flops_per_img``   — XLA cost-analysis FLOPs of the compiled
                          inference step / batch;
  * ``mfu``             — value × flops_per_img / chip bf16 peak.

``vs_baseline``: the reference publishes no throughput numbers
(BASELINE.md — its CUDA stack can't run here); ratio vs the previous
round's recorded value, 1.0 on first run.
"""

from __future__ import annotations

import glob
import json
import os
import statistics
import time

import jax
import numpy as np

# bf16 peak FLOP/s per chip by device kind (dense).
_PEAK_BF16 = {
    "TPU v5e": 197e12,
    "TPU v5 lite": 197e12,
    "TPU v4": 275e12,
    "TPU v6e": 918e12,
    "TPU v6 lite": 918e12,
}


def _peak_flops(device) -> float:
    kind = getattr(device, "device_kind", "")
    for key, val in _PEAK_BF16.items():
        if key.lower() in str(kind).lower():
            return val
    return 197e12  # assume v5e


def _median_rate(fn, args, B: int, n_iters: int, n_rounds: int,
                 blocked: bool) -> float:
    rates = []
    for _ in range(n_rounds):
        t0 = time.perf_counter()
        if blocked:
            for _ in range(n_iters):
                out = fn(*args)
                jax.block_until_ready(out)
        else:
            for _ in range(n_iters):
                out = fn(*args)
            jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        rates.append(B * n_iters / dt)
    return statistics.median(rates)


def main():
    from __graft_entry__ import _toy_batch
    from fgn_tpu.models.fgn import FGN, FGNConfig

    B = int(os.environ.get("BENCH_BATCH", 4))
    n_iters = int(os.environ.get("BENCH_ITERS", 20))
    n_rounds = int(os.environ.get("BENCH_ROUNDS", 5))

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
    lowered = step.lower(params, batch)
    compiled = lowered.compile()
    jax.block_until_ready(compiled(params, batch))  # warm

    flops_per_batch = 0.0
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_per_batch = float(cost.get("flops", 0.0))
    except Exception:
        pass

    pipelined = _median_rate(
        compiled, (params, batch), B, n_iters, n_rounds, blocked=False
    )
    blocked = _median_rate(
        compiled, (params, batch), B, max(n_iters // 4, 4),
        max(n_rounds // 2, 2), blocked=True,
    )

    # train-step throughput (params donated copies avoided: re-feed the
    # same params; optimizer state excluded — measures fwd+bwd+update)
    train_rate = 0.0
    try:
        import optax

        from fgn_tpu.parallel.mesh import make_mesh
        from fgn_tpu.train.optim import build_optimizer, make_lr_schedule
        from fgn_tpu.train.train_step import make_train_step

        tx = build_optimizer(
            params, optimizer="adam",
            schedule=make_lr_schedule(5e-3, steps_per_epoch=1000),
        )
        opt_state = jax.jit(tx.init)(params)
        mesh = make_mesh(jax.devices()[:1])
        train_step, _ = make_train_step(model, tx, mesh)
        rng = jax.random.PRNGKey(2)
        p, o = params, opt_state
        p, o, m = train_step(p, o, batch, rng)  # compile + warm
        jax.block_until_ready(m)
        t_iters = max(n_iters // 2, 5)
        t0 = time.perf_counter()
        for _ in range(t_iters):
            p, o, m = train_step(p, o, batch, rng)
        jax.block_until_ready(m)
        train_rate = B * t_iters / (time.perf_counter() - t0)
    except Exception as e:
        print(f"train-step bench skipped: {e}")

    flops_per_img = flops_per_batch / B if flops_per_batch else 0.0
    peak = _peak_flops(jax.devices()[0])
    mfu = (pipelined * flops_per_img) / peak if flops_per_img else 0.0

    prev = None
    for fp in sorted(glob.glob("BENCH_r*.json")):
        try:
            rec = json.load(open(fp))
            prev = float(rec.get("value", prev))
        except Exception:
            pass
    vs = pipelined / prev if prev else 1.0

    print(
        json.dumps(
            {
                "metric": "query imgs/sec/chip (episodic inference, N3K3 480px)",
                "value": round(pipelined, 2),
                "unit": "imgs/sec/chip",
                "vs_baseline": round(vs, 3),
                "blocked": round(blocked, 2),
                "train": round(train_rate, 2),
                "flops_per_img": round(flops_per_img / 1e9, 2),
                "flops_unit": "GFLOP",
                "mfu": round(mfu, 4),
                "device": str(getattr(jax.devices()[0], "device_kind", "?")),
                "batch": B,
                "iters": n_iters,
                "rounds": n_rounds,
            }
        )
    )


if __name__ == "__main__":
    main()
