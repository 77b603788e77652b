"""Device-level profile of the bench inference / train steps.

VERDICT r3 item 1: MFU sat at ~0.31 for two rounds with no committed
evidence of where the other ~69% of the chip goes. This tool captures a
real ``jax.profiler`` trace of the exact graphs bench.py times (N3K3
480px episodic inference at b4, train step at b12), converts the
.xplane.pb with the in-image ``xprof`` converter, and writes:

  * ``<out>/op_profile.json``     — per-HLO-op time tree (MXU split)
  * ``<out>/hlo_stats.json``      — flat HLO op table
  * ``<out>/overview.json``       — device step breakdown
  * ``<out>/digest.md``           — top-N ops by self time + category
                                    rollup, printed to stdout too

Run on an IDLE chip (same rule as bench.py).

    python tools/profile_device.py [--train] [--out runs/profile]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
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


def _find_xplanes(logdir: str):
    return sorted(
        glob.glob(os.path.join(logdir, "plugins", "profile", "*", "*.xplane.pb"))
    )


def _convert(xplane_fps, tool: str):
    from xprof.convert import raw_to_tool_data

    data, _ctype = raw_to_tool_data.xspace_to_tool_data(
        xplane_fps, tool, {}
    )
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    return data


_PEAK_BF16 = 197e12  # TPU v5e
_HBM_BW = 819e9  # bytes/s, v5e


def _cost_blob(compiled, n_imgs: int, measured_s: float):
    """XLA cost analysis → analytic roofline for the whole graph."""
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
    except Exception:
        return None
    flops = float(cost.get("flops", 0.0))
    byts = float(cost.get("bytes accessed", 0.0))
    t_flops = flops / _PEAK_BF16
    t_bytes = byts / _HBM_BW
    roof = max(t_flops, t_bytes)
    return {
        "flops": flops,
        "bytes_accessed": byts,
        "t_flops_s": t_flops,
        "t_bytes_s": t_bytes,
        "roofline_s": roof,
        "bound": "flops" if t_flops >= t_bytes else "bytes",
        "measured_s_per_iter": measured_s,
        "roofline_fraction": roof / measured_s if measured_s else None,
        "mfu": flops / _PEAK_BF16 / measured_s if measured_s else None,
        "arith_intensity_flops_per_byte": flops / byts if byts else None,
        "imgs_per_iter": n_imgs,
    }


def capture(out_dir: str, train: bool, iters: int = 10):
    from __graft_entry__ import _toy_batch
    from fgn_tpu.models.fgn import FGN, FGNConfig

    cfg = FGNConfig(
        n_ways=3, k_shots=3, backbone_norm="gn", backbone_frozen=False,
        compute_dtype="bfloat16",
    )
    model = FGN(cfg=cfg)
    B = 12 if train else 4
    batch = _toy_batch(B=B, H=480, W=480, N=3, K=3, S=128)
    init = jax.jit(
        lambda k, b, r: model.init(k, b, r, method=FGN.train_forward)
    )
    params = init(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1))

    if train:
        from fgn_tpu.parallel.mesh import make_mesh, shard_batch
        from fgn_tpu.train.optim import build_optimizer, make_lr_schedule
        from fgn_tpu.train.train_step import make_train_step

        tx = build_optimizer(
            params, optimizer="adam",
            schedule=make_lr_schedule(5e-3, steps_per_epoch=1000),
        )
        opt_state = jax.jit(tx.init)(params)
        step, mesh = make_train_step(model, tx, make_mesh())
        batch = shard_batch(batch, mesh)
        p, o = params, opt_state
        for _ in range(2):  # two warm-ups: fresh + donated layouts
            p, o, m = step(p, o, batch, jax.random.PRNGKey(2))
            float(np.asarray(m["loss_total"]))

        def run_iters(n):
            nonlocal p, o
            for _ in range(n):
                p, o, m = step(p, o, batch, jax.random.PRNGKey(2))
            float(np.asarray(m["loss_total"]))
    else:
        fbatch = batch._replace(
            qry_img=jnp.asarray(batch.qry_img, jnp.float32)
        )

        @jax.jit
        def chained(p, b, bias):
            bb = b._replace(qry_img=b.qry_img + bias)
            out = model.apply(p, bb, method=FGN.test_forward)
            return jnp.max(out["dt_scores"]) * 1e-9

        bias = chained(params, fbatch, jnp.float32(0.0))
        float(np.asarray(bias))

        def run_iters(n):
            b_ = jnp.float32(0.0)
            for _ in range(n):
                b_ = chained(params, fbatch, b_)
            float(np.asarray(b_))

    run_iters(2)  # steady state
    # measured steady-state rate (chained; matches bench.py methodology)
    t0 = time.perf_counter()
    run_iters(iters)
    measured = (time.perf_counter() - t0) / iters

    logdir = os.path.join(out_dir, "trace")
    os.makedirs(logdir, exist_ok=True)
    t0 = time.perf_counter()
    jax.profiler.start_trace(logdir)
    run_iters(iters)
    jax.profiler.stop_trace()
    dt = time.perf_counter() - t0
    print(f"captured {iters} iters in {dt:.2f}s -> {logdir}")

    # Analytic roofline from XLA cost analysis of the same compiled graph.
    try:
        if train:
            compiled = step.lower(
                p, o, batch, jax.random.PRNGKey(2)
            ).compile()
        else:
            compiled = chained.lower(
                params, fbatch, jnp.float32(0.0)
            ).compile()
        blob = _cost_blob(compiled, B, measured)
        if blob:
            with open(os.path.join(out_dir, "cost.json"), "w") as f:
                json.dump(blob, f, indent=1)
            print(
                "roofline: bound=%s t_flops=%.1fms t_bytes=%.1fms "
                "measured=%.1fms roofline-fraction=%.2f mfu=%.3f"
                % (
                    blob["bound"], blob["t_flops_s"] * 1e3,
                    blob["t_bytes_s"] * 1e3, measured * 1e3,
                    blob["roofline_fraction"], blob["mfu"],
                )
            )
    except Exception as e:
        print(f"cost analysis failed: {e}")
    return logdir


def digest(out_dir: str, top: int = 25) -> str:
    xplanes = _find_xplanes(os.path.join(out_dir, "trace"))
    assert xplanes, f"no .xplane.pb under {out_dir}/trace"
    lines = []
    tools_written = {}
    for tool, fname in (
        ("op_profile", "op_profile.json"),
        ("hlo_stats", "hlo_stats.json"),
        ("overview_page", "overview.json"),
        ("roofline_model", "roofline.json"),
        ("framework_op_stats", "framework_op_stats.json"),
    ):
        try:
            data = _convert(xplanes, tool)
            with open(os.path.join(out_dir, fname), "w") as f:
                f.write(data if isinstance(data, str) else json.dumps(data))
            tools_written[tool] = True
        except Exception as e:
            lines.append(f"- {tool}: conversion failed: {e}")
            tools_written[tool] = False

    # -- hlo_stats: top ops by self time ------------------------------------
    if tools_written.get("hlo_stats"):
        blob = json.load(open(os.path.join(out_dir, "hlo_stats.json")))
        rows, cols = _tabular(blob)
        if rows is not None:
            col = {name: i for i, name in enumerate(cols)}
            tkey = next(
                (k for k in col if "self" in k.lower() and "time" in k.lower()
                 and "%" not in k), None
            ) or next((k for k in col if "time" in k.lower()), None)
            ckey = next((k for k in col if "category" in k.lower()), None)
            nkey = next(
                (k for k in col if "expression" in k.lower()
                 or "name" in k.lower()), None
            )
            total = sum(float(r[col[tkey]] or 0) for r in rows)
            by_cat = {}
            for r in rows:
                cat = str(r[col[ckey]]) if ckey else "?"
                by_cat[cat] = by_cat.get(cat, 0.0) + float(r[col[tkey]] or 0)
            lines.append(f"\n## Category rollup (total {total:.0f} us)\n")
            lines.append("| category | us | % |")
            lines.append("|---|---|---|")
            for cat, us in sorted(by_cat.items(), key=lambda kv: -kv[1]):
                lines.append(f"| {cat} | {us:.0f} | {100*us/max(total,1e-9):.1f} |")
            lines.append(f"\n## Top {top} ops by self time\n")
            lines.append("| us | % | category | op |")
            lines.append("|---|---|---|---|")
            rows_s = sorted(
                rows, key=lambda r: -float(r[col[tkey]] or 0)
            )[:top]
            for r in rows_s:
                us = float(r[col[tkey]] or 0)
                name = str(r[col[nkey]])[:110] if nkey else "?"
                cat = str(r[col[ckey]]) if ckey else "?"
                lines.append(
                    f"| {us:.0f} | {100*us/max(total,1e-9):.1f} | {cat} | `{name}` |"
                )
    text = "\n".join(lines)
    with open(os.path.join(out_dir, "digest.md"), "w") as f:
        f.write(text + "\n")
    return text


def _tabular(blob):
    """hlo_stats JSON is either gviz {cols,rows} or a list of dicts."""
    if isinstance(blob, dict) and "rows" in blob and "cols" in blob:
        cols = [c.get("label") or c.get("id") for c in blob["cols"]]
        rows = [[c.get("v") for c in r["c"]] for r in blob["rows"]]
        return rows, cols
    if isinstance(blob, list) and blob and isinstance(blob[0], dict):
        cols = list(blob[0])
        return [[r.get(c) for c in cols] for r in blob], cols
    return None, None


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--out", default=None)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--digest-only", action="store_true",
                    help="skip capture; re-digest an existing trace dir")
    args = ap.parse_args()
    out = args.out or os.path.join(
        "runs", "profile_train" if args.train else "profile_infer"
    )
    os.makedirs(out, exist_ok=True)
    if not args.digest_only:
        capture(out, train=args.train, iters=args.iters)
    print(digest(out))
