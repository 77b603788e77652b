"""Train-step ablation profiler (VERDICT round-2 item 1).

Times the compiled 480px N3K3 train step on the real chip under
component ablations to localize the train/inference throughput gap
(round-2: inference 57.9 imgs/s blocked vs train 1.24 imgs/s — ~25x
beyond the ~3x fwd+bwd FLOPs ratio).

Measurement uses the same chained-dependency forcing as bench.py
(params chain step-to-step through the donated train state; the final
fetched loss forces every link). One variant per process:

    python tools/profile_train.py full        # unmodified train step
    python tools/profile_train.py fwd         # loss forward only, no grad
    python tools/profile_train.py nms_off     # NMS -> plain top-k passthrough
    python tools/profile_train.py assign_off  # max-IoU assigners -> fixed stub
    python tools/profile_train.py pallas_off  # gather RoIAlign (+ its VJP)
    python tools/profile_train.py mask_off    # mask branch removed
    python tools/profile_train.py backbone    # grad of backbone-only surrogate
    python tools/profile_train.py eval        # test_forward at the same batch

Appends one JSON line per run to /tmp/profile_train.jsonl.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass

B = int(os.environ.get("PROF_BATCH", 12))
ITERS = int(os.environ.get("PROF_ITERS", 5))
ROUNDS = int(os.environ.get("PROF_ROUNDS", 3))
LOG = os.environ.get("PROF_LOG", "/tmp/profile_train.jsonl")


def _apply_ablation(name):
    import fgn_tpu.models.fgn as fgn_mod

    if name == "nms_off":
        def fake_nms(boxes, scores, valid, iou, max_out, block=128):
            k = min(max_out, boxes.shape[0])
            s = jnp.where(valid, scores, -jnp.inf)
            out_s, idx = jax.lax.top_k(s, k)
            ov = jnp.isfinite(out_s)
            return (jnp.where(ov[:, None], boxes[idx], 0.0),
                    jnp.where(ov, out_s, 0.0), idx.astype(jnp.int32), ov)
        fgn_mod.nms_padded = fake_nms
    elif name == "assign_off":
        from fgn_tpu.ops.assign import AssignResult

        def fake_assign(boxes, gt_boxes, gt_valid, pos_iou, neg_iou,
                        min_pos_iou, match_low_quality=True, box_valid=None):
            M = boxes.shape[0]
            inds = jnp.where(jnp.arange(M) % 7 == 0, 1, 0).astype(jnp.int32)
            if box_valid is not None:
                inds = jnp.where(box_valid, inds, -1)
            return AssignResult(
                assigned_gt_inds=inds,
                pos_mask=inds > 0,
                neg_mask=inds == 0,
                max_overlaps=jnp.zeros((M,), jnp.float32),
            )
        fgn_mod.max_iou_assign = fake_assign
    elif name == "mask_off":
        def fake_mask_head(self, feats):
            P = feats.shape[0]
            m = self.cfg.mask_size
            return jnp.zeros((P, m, m), feats.dtype) + feats.mean() * 0.0
        fgn_mod.FGN._mask_head = fake_mask_head


def _toy(batch_b):
    from __graft_entry__ import _toy_batch
    return _toy_batch(B=batch_b, H=480, W=480, N=3, K=3, S=128)


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "full"
    # "eval_<ablation>" = the inference path with a component ablated
    # (MFU-composition attribution: eval − eval_nms_off = NMS cost etc.)
    _apply_ablation(variant[5:] if variant.startswith("eval_") else variant)

    from fgn_tpu.models.fgn import FGN, FGNConfig

    cfg = FGNConfig(n_ways=3, k_shots=3, backbone_norm="gn",
                    backbone_frozen=False, compute_dtype="bfloat16",
                    use_pallas_roi_align=(
                        False if variant == "pallas_off" else None))
    model = FGN(cfg=cfg)
    batch = _toy(B)
    init = jax.jit(lambda k, b, r: model.init(k, b, r,
                                              method=FGN.train_forward))
    params = init(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1))

    flops = 0.0

    if variant == "backbone":
        # conv roofline surrogate: fwd+bwd of the feature extractor alone
        def loss(p, b, bias):
            bb = b._replace(qry_img=b.qry_img + bias)
            qf, sf = model.apply(p, bb, method=FGN._extract)
            return (jnp.sum(qf.astype(jnp.float32) ** 2)
                    + jnp.sum(sf.astype(jnp.float32) ** 2))

        @jax.jit
        def step(p, b, bias):
            val, g = jax.value_and_grad(loss)(p, b, bias)
            leaves = jax.tree_util.tree_leaves(g)
            gn = sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in leaves)
            return val * 1e-20 + gn * 1e-20

        run = lambda bias: step(params, batch, bias)
        flops = _cost(step, params, batch, jnp.float32(0.0))
    elif variant == "eval" or variant.startswith("eval_"):
        @jax.jit
        def step(p, b, bias):
            bb = b._replace(qry_img=b.qry_img + bias)
            out = model.apply(p, bb, method=FGN.test_forward)
            return jnp.max(out["dt_scores"]) * 1e-9

        run = lambda bias: step(params, batch, bias)
        flops = _cost(step, params, batch, jnp.float32(0.0))
    elif variant == "extract":
        # forward-only feature extraction (query + support towers) —
        # the conv-roofline floor of the inference path
        @jax.jit
        def step(p, b, bias):
            bb = b._replace(qry_img=b.qry_img + bias)
            qf, sf = model.apply(p, bb, method=FGN._extract)
            return (jnp.max(qf.astype(jnp.float32))
                    + jnp.max(sf.astype(jnp.float32))) * 1e-9

        run = lambda bias: step(params, batch, bias)
        flops = _cost(step, params, batch, jnp.float32(0.0))
    elif variant == "fwd":
        def loss_fn(p, b, rng):
            losses = model.apply(p, b, rng, method=FGN.train_forward)
            return sum(v for k, v in losses.items() if k.startswith("loss_"))

        @jax.jit
        def step(p, b, bias):
            bb = b._replace(qry_img=b.qry_img + bias)
            return loss_fn(p, bb, jax.random.PRNGKey(3)) * 1e-9

        run = lambda bias: step(params, batch, bias)
        flops = _cost(step, params, batch, jnp.float32(0.0))
    else:  # full / nms_off / assign_off / pallas_off / mask_off
        import optax

        from fgn_tpu.parallel.mesh import make_mesh, shard_batch
        from fgn_tpu.train.optim import build_optimizer, make_lr_schedule
        from fgn_tpu.train.train_step import make_train_step

        tx = build_optimizer(params, optimizer="adam",
                             schedule=make_lr_schedule(
                                 5e-3, steps_per_epoch=1000))
        opt_state = jax.jit(tx.init)(params)
        mesh = make_mesh()
        train_step, mesh = make_train_step(model, tx, mesh)
        batch = shard_batch(batch, mesh)
        rng = jax.random.PRNGKey(2)
        state = {"p": params, "o": opt_state}

        def run(bias):
            state["p"], state["o"], m = train_step(
                state["p"], state["o"], batch, rng)
            return m["loss_total"]

        if os.environ.get("PROF_COST"):
            try:
                def raw(p, o, b, r):
                    return train_step(p, o, b, r)
                flops = float(
                    jax.jit(raw).lower(params, opt_state, batch, rng)
                    .compile().cost_analysis().get("flops", 0.0))
            except Exception:
                flops = 0.0

    t_compile = time.perf_counter()
    out = run(jnp.float32(0.0))
    float(np.asarray(out))
    t_compile = time.perf_counter() - t_compile

    times = []
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        o = jnp.float32(0.0)
        for _ in range(ITERS):
            o = run(o * 1e-20)
        float(np.asarray(o))
        times.append((time.perf_counter() - t0) / ITERS)
    step_s = statistics.median(times)

    rec = {
        "variant": variant, "batch": B, "step_s": round(step_s, 4),
        "imgs_s": round(B / step_s, 2), "compile_s": round(t_compile, 1),
        "flops_g": round(flops / 1e9, 1),
        "mfu": round(flops / step_s / 197e12, 4) if flops else 0.0,
    }
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


def _cost(fn, *args):
    try:
        c = fn.lower(*args).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return float(c.get("flops", 0.0))
    except Exception:
        return 0.0


if __name__ == "__main__":
    main()
