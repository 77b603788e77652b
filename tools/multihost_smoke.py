"""Two-process multi-host smoke test (VERDICT r4 item 8, SURVEY §2.8).

Everything multi-host in this repo is otherwise proven by single-process
simulation (tests/test_multihost_shard.py drives shard_count=2 in one
process). This script runs the real thing on CPU: two OS processes
joined by ``jax.distributed.initialize`` (one CPU device each), which

  1. shard the grain episode loader per host and prove the shards are
     disjoint and complete via a cross-process allgather;
  2. run one jitted cross-process reduction (psum-style sum over the
     2-device global mesh);
  3. save one orbax checkpoint of a GLOBAL (replicated) array tree from
     both processes into a shared directory, and read it back.

Run (parent spawns the two workers with the axon plugin stripped —
pure-CPU jax needs PYTHONPATH without /root/.axon_site):

    python tools/multihost_smoke.py

Exit 0 + "MULTIHOST SMOKE OK" means all three claims executed for real.
Output recorded in reports/multihost_smoke.txt.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(pid: int):
    import numpy as np

    import jax

    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{os.environ['FGN_MH_PORT']}",
        num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 1, jax.local_devices()
    assert jax.device_count() == 2, jax.devices()

    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from fgn_tpu.data.loader_grain import GrainEpisodeLoader
    from tests.test_train_e2e import TinyFewShot
    from tests.test_spp_bank import _cfg

    # -- 1. per-host loader sharding on a real dataset -------------------
    root = os.environ["FGN_MH_ROOT"]
    ds = TinyFewShot(_cfg(os.path.join(root, "raw"), os.path.join(root, "fst")))
    loader = GrainEpisodeLoader(
        ds, batch_size=2, max_gt=8, shard_index=pid, shard_count=2,
        drop_last=False,
    )
    mine = sorted(
        int(i)
        for _batch, meta in loader
        for i in np.asarray(meta.idx)[: meta.n_real or len(meta.idx)]
    )
    n_total = len(ds)
    padded = np.full(n_total, -1, np.int32)
    padded[: len(mine)] = mine
    both = np.asarray(multihost_utils.process_allgather(padded))
    a = set(int(v) for v in both[0] if v >= 0)
    b = set(int(v) for v in both[1] if v >= 0)
    assert a and b, (a, b)
    assert not (a & b), f"shard overlap: {a & b}"
    assert a | b == set(range(n_total)), (a | b, n_total)

    # -- 2. one cross-process mesh reduction -----------------------------
    mesh = Mesh(np.array(jax.devices()), ("data",))
    local = np.array([float(pid + 1)], np.float32)
    gx = multihost_utils.host_local_array_to_global_array(
        local, mesh, P("data")
    )  # global shape (2,): [1., 2.]

    summed = jax.jit(
        jnp.sum,
        in_shardings=NamedSharding(mesh, P("data")),
        out_shardings=NamedSharding(mesh, P()),
    )(gx)
    assert float(summed) == 3.0, float(summed)

    # -- 3. shared-directory checkpoint from both processes --------------
    from fgn_tpu.train.checkpoints import CheckpointManager

    rep = NamedSharding(mesh, P())
    params = {
        "w": jax.device_put(jnp.arange(8, dtype=jnp.float32), rep),
        "b": jax.device_put(jnp.float32(pid * 0 + 7.0), rep),
    }
    opt_state = {"mu": jax.device_put(jnp.zeros(8, jnp.float32), rep)}
    ckpt = CheckpointManager(os.path.join(root, "shared_ckpt"), max_keep=1)
    ckpt.save(1, params, opt_state, extra={"epoch": 0})
    ckpt.wait()
    step, restored = ckpt.restore(
        template={"params": params, "opt_state": opt_state,
                  "extra": {"epoch": 0}}
    )
    assert step == 1
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(restored["params"]["w"])), np.arange(8)
    )
    ckpt.close()
    print(f"[proc {pid}] loader shards disjoint ({len(a)}+{len(b)}="
          f"{n_total}), mesh sum 3.0, shared ckpt round-trip OK")


def parent():
    import tempfile

    tmp = tempfile.mkdtemp(prefix="fgn_mh_smoke_")
    # raw data, databag AND support bank are built ONCE by the parent —
    # two workers racing the same cache files corrupt each other
    # (observed: .tmp rename race on the bank build).
    sys.path.insert(0, REPO)
    from tests.test_train_e2e import TinyFewShot, TinyMNISTISEG
    from tests.test_spp_bank import _cfg

    TinyMNISTISEG.create(
        root=os.path.join(tmp, "raw"),
        quantities={"train": 10, "val": 2, "test": 2}, seed=13,
    )
    TinyFewShot(_cfg(os.path.join(tmp, "raw"), os.path.join(tmp, "fst")))

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO  # drop /root/.axon_site → no TPU plugin
    env["JAX_PLATFORMS"] = "cpu"
    env["FGN_MH_ROOT"] = tmp
    env["FGN_MH_PORT"] = os.environ.get("FGN_MH_PORT", "52357")
    env.pop("XLA_FLAGS", None)  # 1 CPU device per process
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), str(pid)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    ok = all(p.returncode == 0 for p in procs)
    for pid, out in enumerate(outs):
        tail = "\n".join(out.strip().splitlines()[-6:])
        print(f"--- proc {pid} (rc={procs[pid].returncode}) ---\n{tail}")
    if not ok:
        sys.exit("MULTIHOST SMOKE FAILED")
    print("MULTIHOST SMOKE OK")


if __name__ == "__main__":
    if len(sys.argv) > 1:
        child(int(sys.argv[1]))
    else:
        parent()
