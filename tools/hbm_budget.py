"""Peak-HBM accounting for the FGN train step (VERDICT r4 item 3).

AOT-compiles the production train step at chosen (batch, remat)
variants — no execution — and prints the XLA compiled-memory stats:
argument/output/temp/alias sizes and the resulting peak HBM estimate.
Answers "can 16 GB v5e hold the reference batch heuristic's N3K1 b10
geometry, and what does remat buy?" with compiler numbers instead of
the observed worker crash.

Usage (idle chip — the remote compiler rides the same tunnel):
    python tools/hbm_budget.py                      # N3K1 480px b8 vs b10, remat off/on
    python tools/hbm_budget.py --batches 8 10 12 --remats "" relation backbone,res5,relation,mask

Results land in reports/hbm_budget.md (hand-edited narrative around the
table this prints).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass


def stats_for(n_ways: int, k_shots: int, batch: int, hw: int, remat: str,
              spp: int = 128):
    from __graft_entry__ import _toy_batch
    from fgn_tpu.models.fgn import FGN, FGNConfig
    from fgn_tpu.parallel.mesh import make_mesh, shard_batch
    from fgn_tpu.train.optim import build_optimizer, make_lr_schedule
    from fgn_tpu.train.train_step import make_train_step

    cfg = FGNConfig(
        n_ways=n_ways, k_shots=k_shots, backbone_norm="gn",
        compute_dtype="bfloat16", remat=remat,
    )
    model = FGN(cfg=cfg)
    tb = _toy_batch(B=batch, H=hw, W=hw, N=n_ways, K=k_shots, S=spp)
    init = jax.jit(
        lambda k, b, r: model.init(k, b, r, method=FGN.train_forward)
    )
    params = jax.eval_shape(
        init, jax.random.PRNGKey(0), tb, jax.random.PRNGKey(1)
    )
    # Real params are needed for lowering inputs; init on a small canvas
    # (param shapes are resolution-independent) to keep this cheap.
    small = _toy_batch(B=1, H=96, W=96, N=n_ways, K=k_shots, S=32)
    params = init(jax.random.PRNGKey(0), small, jax.random.PRNGKey(1))
    tx = build_optimizer(
        params, optimizer="adam",
        schedule=make_lr_schedule(5e-3, steps_per_epoch=1000),
    )
    opt_state = jax.jit(tx.init)(params)
    mesh = make_mesh()
    train_step, mesh = make_train_step(model, tx, mesh)
    tb = shard_batch(tb, mesh)
    compiled = train_step.lower(
        params, opt_state, tb, jax.random.PRNGKey(2)
    ).compile()
    mem = compiled.memory_analysis()
    row = {
        "geometry": f"N{n_ways}K{k_shots} {hw}px b{batch}",
        "remat": remat or "(off)",
    }
    for k in (
        "argument_size_in_bytes", "output_size_in_bytes",
        "temp_size_in_bytes", "alias_size_in_bytes",
        "generated_code_size_in_bytes",
    ):
        v = getattr(mem, k, None)
        if v is not None:
            row[k.replace("_in_bytes", "_gb")] = round(v / 2**30, 3)
    # Peak = args + outputs + temps − donated aliases (donated params /
    # opt_state buffers are reused in place).
    try:
        row["peak_gb"] = round(
            (mem.argument_size_in_bytes + mem.output_size_in_bytes
             + mem.temp_size_in_bytes - mem.alias_size_in_bytes) / 2**30,
            3,
        )
    except Exception:
        pass
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--k", type=int, default=1)
    ap.add_argument("--hw", type=int, default=480)
    ap.add_argument("--spp", type=int, default=128)
    ap.add_argument("--batches", type=int, nargs="+", default=[8, 10])
    ap.add_argument(
        "--remats", type=str, nargs="+", default=["", "relation",
                                                  "backbone,res5,relation,mask"]
    )
    args = ap.parse_args()
    rows = []
    for b in args.batches:
        for r in args.remats:
            try:
                row = stats_for(args.n, args.k, b, args.hw, r, spp=args.spp)
            except Exception as e:
                row = {
                    "geometry": f"N{args.n}K{args.k} {args.hw}px b{b}",
                    "remat": r or "(off)",
                    "error": f"{type(e).__name__}: {str(e)[:200]}",
                }
            rows.append(row)
            print(json.dumps(row))
    # markdown table for reports/hbm_budget.md
    keys = ["geometry", "remat", "argument_size_gb", "output_size_gb",
            "temp_size_gb", "alias_size_gb", "peak_gb", "error"]
    print("\n| " + " | ".join(keys) + " |")
    print("|" + "---|" * len(keys))
    for row in rows:
        print("| " + " | ".join(str(row.get(k, "")) for k in keys) + " |")


if __name__ == "__main__":
    main()
