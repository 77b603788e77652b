"""A/B microbenchmark: blocked-XLA greedy NMS sweep vs the fused Pallas
keep-mask kernel (ops/nms_pallas.py), at the model's real geometries.

Run on an IDLE chip. Times the full ``nms_padded`` call (sort + sweep +
gather) under ``jax.vmap`` over the batch, exactly how the model invokes
it (fgn.py get_proposals / nms_one):

  * RPN test:  B x (4096 candidates -> 300 out)   [rpn_test_nms_pre]
  * RPN train: B x (4096 candidates -> 2000 out)  [rpn_train_*]
  * RCNN:      B x (300*3 candidates -> 100 out, class-offset batched]

Chained-dependency forcing (the boxes of step i+1 depend on step i's
output scores) + final fetch, same integrity rules as bench.py.

Appends one JSON line per variant to /tmp/nms_bench.jsonl and prints a
summary table.
"""

from __future__ import annotations

import functools
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

from fgn_tpu.ops.nms import nms_padded  # noqa: E402
from fgn_tpu.ops.nms_pallas import greedy_alive_pallas  # noqa: E402

ITERS = int(os.environ.get("NMS_ITERS", 20))
ROUNDS = int(os.environ.get("NMS_ROUNDS", 5))
LOG = os.environ.get("NMS_LOG", "/tmp/nms_bench.jsonl")


def _mk_inputs(rng, B, M):
    ctr = rng.uniform(40, 440, (B, M, 2)).astype(np.float32)
    wh = rng.uniform(8, 96, (B, M, 2)).astype(np.float32)
    boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], -1)
    scores = rng.uniform(size=(B, M)).astype(np.float32)
    valid = rng.uniform(size=(B, M)) > 0.05
    return jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid)


def time_variant(name, B, M, max_out, alive_fn):
    rng = np.random.default_rng(0)
    boxes, scores, valid = _mk_inputs(rng, B, M)

    @jax.jit
    def step(bx, sc, vl, bias):
        ob, os_, oi, ov = jax.vmap(
            lambda b, s, v: nms_padded(
                b, s, v, 0.5, max_out, alive_fn=alive_fn
            )
        )(bx + bias, sc, vl)
        # chain: next call's boxes depend on this call's output
        return jnp.sum(os_) * 1e-9, ov

    bias = jnp.float32(0.0)
    bias, _ = step(boxes, scores, valid, bias)
    float(np.asarray(bias))  # force warm-up execution

    rates = []
    for _ in range(ROUNDS):
        b_ = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            b_, _ = step(boxes, scores, valid, b_)
        float(np.asarray(b_))
        dt = time.perf_counter() - t0
        rates.append(dt / ITERS)
    med_ms = statistics.median(rates) * 1e3
    rec = {"variant": name, "B": B, "M": M, "max_out": max_out,
           "ms_per_call": round(med_ms, 3)}
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    return med_ms


def main():
    print(f"devices: {jax.devices()}")
    geoms = [
        ("rpn_test", 4, 4096, 300),
        ("rpn_train", 12, 4096, 2000),
        ("rcnn", 4, 1024, 100),
    ]
    for gname, B, M, max_out in geoms:
        xla = time_variant(f"{gname}/xla", B, M, max_out, None)
        pal = time_variant(
            f"{gname}/pallas", B, M, max_out,
            functools.partial(greedy_alive_pallas),
        )
        print(f"== {gname}: xla {xla:.2f} ms  pallas {pal:.2f} ms  "
              f"speedup {xla / pal:.2f}x")


if __name__ == "__main__":
    main()
