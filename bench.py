"""Benchmark: episodic inference + train-step throughput with MFU.

Two workloads, both on the BASELINE.json metric (query imgs/sec/chip,
episodic inference, full test path — backbone, AG-RPN, proposals+NMS,
relation head, mask head — bf16 compute, Pallas RoIAlign):

  * flagship OMNIISEG N3 K3 geometry: 480×480 queries, 9 support crops
    of 128×128 (fields ``value``/``mfu``/``value_b4``/``mfu_b4``);
  * the COCO2VOC geometry the baseline metric literally names
    (reference workload: 800-target/1333-max inputs → the synthetic
    COCO2VOC runs' 800×1088 padded canvas, ~51k anchors, nms_pre 6144,
    256px support crops — fgn_train.py:16-42, fgn_r50_c4_densecl.py:
    43-64,174-186) at N1 K1 (the "1-shot" of the metric string) and
    N3 K3 (fields ``coco2voc_n1k1_*`` / ``coco2voc_n3k3_*``).

Measurement integrity (two axon-tunnel pitfalls, both hit in rounds
1-2): (a) repeated identical executions can be elided, so every timed
iteration's input depends on the previous iteration's OUTPUT (a scalar
bias derived from the detection scores feeds the next query image);
(b) ``jax.block_until_ready`` does NOT reliably force remote execution
— only materializing a value does — so timing always ends with an
``np.asarray`` fetch of the chain's final scalar, which the dependency
chain forces to execute every step. Round 1's 14.4k imgs/s (and the
first round-2 numbers) predate these fixes and are withdrawn.

Reported (one JSON line):
  * ``value``         — chained steady-state imgs/s (median over rounds);
  * ``blocked``       — same but block_until_ready every step;
  * ``train``         — training-step imgs/s at the production batch
                        (chained params, sharded batch, b12);
  * ``flops_per_img`` — XLA cost analysis of the compiled inference step;
  * ``mfu``           — value × flops_per_img / chip bf16 peak;
  * ``coco2voc_*``    — same inference fields at the COCO2VOC geometry.

``vs_baseline``: ratio against the analytic torch-GPU estimate in
BASELINE.json["published"] (tools/baseline_estimate.py — the reference
publishes no throughput numbers and its CUDA stack cannot run here).
"""

from __future__ import annotations

import json
import os
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

try:  # skip the ~26-min remote recompiles on repeated runs
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass

_PEAK_BF16 = {
    "TPU v5e": 197e12,
    "TPU v5 lite": 197e12,
    "TPU v5 litepod": 197e12,
    "TPU v4": 275e12,
    "TPU v6e": 918e12,
    "TPU v6 lite": 918e12,
}


def _peak_flops(device) -> float:
    kind = str(getattr(device, "device_kind", ""))
    for key, val in _PEAK_BF16.items():
        if key.lower() in kind.lower():
            return val
    return 197e12  # assume v5e


def _infer_bench(model, params, nb, H, W, N, K, S,
                 n_iters: int, n_rounds: int):
    """(pipelined imgs/s, blocked imgs/s, flops_per_img) at batch nb.

    Chained forcing: each step's query image depends on the previous
    step's detection scores (see module docstring)."""
    from __graft_entry__ import _toy_batch
    from fgn_tpu.models.fgn import FGN

    @jax.jit
    def chained(p, b, bias):
        bb = b._replace(qry_img=b.qry_img + bias)
        out = model.apply(p, bb, method=FGN.test_forward)
        return jnp.max(out["dt_scores"]) * 1e-9, out

    batch = _toy_batch(B=nb, H=H, W=W, N=N, K=K, S=S)
    fbatch = batch._replace(qry_img=jnp.asarray(batch.qry_img, jnp.float32))
    flops_per_batch = 0.0
    try:
        cost = jax.jit(
            lambda p, b: model.apply(p, b, method=FGN.test_forward)
        ).lower(params, batch).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_per_batch = float(cost.get("flops", 0.0))
    except Exception:
        pass

    bias = jnp.float32(0.0)
    bias, _ = chained(params, fbatch, bias)  # compile + warm
    float(np.asarray(bias))  # force the warm-up to really execute

    def rate(blocked: bool) -> float:
        rates = []
        b_ = jnp.float32(0.0)
        for _ in range(n_rounds):
            t0 = time.perf_counter()
            for _ in range(n_iters):
                b_, _out = chained(params, fbatch, b_)
                if blocked:
                    b_ = jnp.float32(float(np.asarray(b_)))
            # fetching the chain's tail forces every link to execute
            float(np.asarray(b_))
            rates.append(nb * n_iters / (time.perf_counter() - t0))
        return statistics.median(rates)

    return rate(blocked=False), rate(blocked=True), (
        flops_per_batch / nb if flops_per_batch else 0.0
    )


def _make_model(n_ways, k_shots, **kw):
    from fgn_tpu.models.fgn import FGN, FGNConfig

    cfg = FGNConfig(
        n_ways=n_ways, k_shots=k_shots, backbone_norm="gn",
        backbone_frozen=False, compute_dtype="bfloat16", **kw,
    )
    return FGN(cfg=cfg)


def _init_params(model, B, H, W, N, K, S):
    from __graft_entry__ import _toy_batch
    from fgn_tpu.models.fgn import FGN

    init = jax.jit(
        lambda k, b, r: model.init(k, b, r, method=FGN.train_forward)
    )
    return init(
        jax.random.PRNGKey(0),
        _toy_batch(B=B, H=H, W=W, N=N, K=K, S=S),
        jax.random.PRNGKey(1),
    )


def main():
    from __graft_entry__ import _toy_batch

    # Inference is benched at the b8 serving batch (headline) AND the
    # historical b4 (rounds 1-3 comparability): the test graph is
    # BANDWIDTH-bound (reports/perf_profile.md), so the larger batch
    # amortizes fixed per-step work — measured b4 0.352 MFU vs b8
    # 0.409 (round 4).
    B = int(os.environ.get("BENCH_BATCH", 8))
    B_ALT = int(os.environ.get("BENCH_BATCH_ALT", 4))
    TRAIN_B = int(os.environ.get("BENCH_TRAIN_BATCH", 12))
    n_iters = int(os.environ.get("BENCH_ITERS", 20))
    n_rounds = int(os.environ.get("BENCH_ROUNDS", 5))
    peak = _peak_flops(jax.devices()[0])

    model = _make_model(3, 3)
    # Param shapes are resolution-independent; init at 480px once.
    params = _init_params(model, B, 480, 480, 3, 3, 128)

    pipelined, blocked, flops_per_img = _infer_bench(
        model, params, B, 480, 480, 3, 3, 128, n_iters, n_rounds
    )
    alt_pipelined, _ab, alt_flops_per_img = (
        _infer_bench(model, params, B_ALT, 480, 480, 3, 3, 128,
                     n_iters, n_rounds)
        if B_ALT and B_ALT != B else (0.0, 0.0, 0.0)
    )

    # -- COCO2VOC geometry (the literal BASELINE.json metric) -------------
    # 800×1088 padded canvas (the synthetic COCO2VOC production shape),
    # 256px supports, nms_pre 6144 / max 300 as in the reference
    # test_cfg; N1K1 = the metric's "1-shot", plus the N3K3 flagship NK.
    coco = {}
    if os.environ.get("BENCH_COCO", "1") != "0":
        CB = int(os.environ.get("BENCH_COCO_BATCH", 4))
        for tag, (n, k) in (("n1k1", (1, 1)), ("n3k3", (3, 3))):
            cmodel = _make_model(n, k, rpn_test_nms_pre=6144)
            # param shapes are resolution-independent: init small
            cparams = _init_params(cmodel, 1, 96, 96, n, k, 32)
            c_rate, _cb, c_flops = _infer_bench(
                cmodel, cparams, CB, 800, 1088, n, k, 256,
                n_iters, max(n_rounds - 2, 3),
            )
            coco[f"coco2voc_{tag}_imgs_s"] = round(c_rate, 2)
            coco[f"coco2voc_{tag}_flops_per_img"] = round(c_flops / 1e9, 2)
            coco[f"coco2voc_{tag}_mfu"] = (
                round(c_rate * c_flops / peak, 4) if c_flops else 0.0
            )
        coco["coco2voc_batch"] = CB
        coco["coco2voc_hw"] = "800x1088"

    # -- train step at production batch (mirrors train/loop.py) -----------
    # On an idle device the step is ~0.14 s at b12 (tools/profile_train.py
    # and the warmed rounds below). bench MUST run on an idle chip/host.
    train_rate = 0.0
    train_flops = 0.0
    try:
        from fgn_tpu.parallel.mesh import make_mesh, shard_batch
        from fgn_tpu.train.optim import build_optimizer, make_lr_schedule
        from fgn_tpu.train.train_step import make_train_step

        tbatch = _toy_batch(B=TRAIN_B, H=480, W=480, N=3, K=3, S=128)
        tmodel = _make_model(3, 3, remat=os.environ.get("BENCH_REMAT", ""))
        tparams = _init_params(tmodel, TRAIN_B, 480, 480, 3, 3, 128)
        tx = build_optimizer(
            tparams, optimizer="adam",
            schedule=make_lr_schedule(5e-3, steps_per_epoch=1000),
        )
        opt_state = jax.jit(tx.init)(tparams)
        mesh = make_mesh()
        train_step, mesh = make_train_step(tmodel, tx, mesh)
        tbatch = shard_batch(tbatch, mesh)
        rng = jax.random.PRNGKey(2)
        try:
            cost = train_step.lower(
                tparams, opt_state, tbatch, rng
            ).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            train_flops = float(cost.get("flops", 0.0))
        except Exception:
            pass
        p, o = tparams, opt_state
        # Warm-up must cover TWO calls: the first runs on the fresh-init
        # params, the second on the donated outputs (whose explicit
        # replicated shardings differ from init's), which triggers a
        # second one-time compile (~75 s through the tunnel) — timing a
        # single round right after a one-call warm-up measures that
        # compile, not the step (the round-2/round-3-queue15 "train:
        # 1.24/1.39 imgs/s" artifact).
        for _ in range(2):
            p, o, m = train_step(p, o, tbatch, rng)
            float(np.asarray(m["loss_total"]))  # real warm-up execution
        t_iters = max(n_iters // 4, 5)
        t_rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(t_iters):
                p, o, m = train_step(p, o, tbatch, rng)
            # params chain step-to-step; fetching the last loss forces all
            float(np.asarray(m["loss_total"]))
            t_rates.append(TRAIN_B * t_iters / (time.perf_counter() - t0))
        train_rate = statistics.median(t_rates)
    except Exception as e:
        print(f"train-step bench skipped: {e}")

    # MFU from the chained pipelined rate (per-step RTT amortized; the
    # chain guarantees every step really executed).
    mfu = (pipelined * flops_per_img) / peak if flops_per_img else 0.0
    alt_mfu = (
        (alt_pipelined * alt_flops_per_img) / peak
        if alt_flops_per_img else 0.0
    )

    # vs_baseline: ratio against the analytic torch-GPU estimate in
    # BASELINE.json["published"] (tools/baseline_estimate.py) — the
    # reference publishes no throughput numbers.
    base = None
    try:
        pub = json.load(open("BASELINE.json")).get("published", {})
        base = float(pub.get("torch_gpu_inference_imgs_s_est", 0)) or None
    except Exception:
        pass
    vs = pipelined / base if base else 1.0
    train_mfu = (
        train_flops * train_rate / TRAIN_B / peak if train_flops else 0.0
    )

    out = {
        "metric": "query imgs/sec/chip (episodic inference, N3K3 480px)",
        "value": round(pipelined, 2),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(vs, 3),
        "blocked": round(blocked, 2),
        "train": round(train_rate, 2),
        "train_batch": TRAIN_B,
        "train_flops_per_img": round(
            train_flops / TRAIN_B / 1e9, 2
        ) if train_flops else 0.0,
        "train_mfu": round(train_mfu, 4),
        "train_remat": os.environ.get("BENCH_REMAT", ""),
        "flops_per_img": round(flops_per_img / 1e9, 2),
        "flops_unit": "GFLOP",
        "mfu": round(mfu, 4),
        "device": str(getattr(jax.devices()[0], "device_kind", "?")),
        "batch": B,
        "value_b4": round(alt_pipelined, 2),
        "mfu_b4": round(alt_mfu, 4),
        "batch_alt": B_ALT,
        "iters": n_iters,
        "rounds": n_rounds,
    }
    out.update(coco)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
