"""TPU-vs-CPU numeric probe for the N3K1 b10 geometry (round 5).

History: b10 killed the TPU worker at step 0 in rounds 3-4; on the
round-5 code path it trains without crashing but way-classification
never learns (acc_balanced pinned at 1/(N+1), right-class detection
recall 0.154 at epoch 8) while the b8 run of the same recipe reaches
0.95 mAP. Localization is perfect in both.

This probe runs the SAME train_forward (losses + balanced accuracy) on
the SAME params and batch on the TPU and on the host CPU, at b10 and at
a b8 control. A shape-specialized miscompile on the b10 TPU graph shows
up as b10 divergence >> b8 divergence; matching values exonerate the
compiled graph and leave a training-dynamics question.

    python tools/b10_probe.py
"""

from __future__ import annotations

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


def losses_on(dev, model, params, batch, rng):
    import jax.numpy as jnp
    from fgn_tpu.models.fgn import FGN

    with jax.default_device(dev):
        f = jax.jit(
            lambda p, b, r: model.apply(p, b, r, method=FGN.train_forward)
        )
        out = f(jax.device_put(params, dev), jax.device_put(batch, dev), rng)
        return {k: float(v) for k, v in out.items()}


def main():
    from __graft_entry__ import _toy_batch
    from fgn_tpu.models.fgn import FGN, FGNConfig

    cfg = FGNConfig(
        n_ways=3, k_shots=1, backbone_norm="gn", compute_dtype="bfloat16",
    )
    model = FGN(cfg=cfg)
    tpu = jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    rng = jax.random.PRNGKey(7)
    small = _toy_batch(B=1, H=96, W=96, N=3, K=1, S=32)
    with jax.default_device(cpu):
        params = jax.jit(
            lambda k, b, r: model.init(k, b, r, method=FGN.train_forward)
        )(jax.random.PRNGKey(0), small, jax.random.PRNGKey(1))
    for B in (10, 8):
        batch = _toy_batch(B=B, H=480, W=480, N=3, K=1, S=128, seed=3)
        lt = losses_on(tpu, model, params, batch, rng)
        lc = losses_on(cpu, model, params, batch, rng)
        rows = {}
        for k in sorted(lt):
            a, b = lt[k], lc[k]
            denom = max(abs(a), abs(b), 1e-6)
            rows[k] = {"tpu": round(a, 5), "cpu": round(b, 5),
                       "rel": round(abs(a - b) / denom, 4)}
        print(json.dumps({"batch": B, "cmp": rows}, indent=1))


if __name__ == "__main__":
    main()
