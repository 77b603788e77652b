"""Runner behaviour: epoch loop, checkpointing cadence, resume."""

import os

import jax
import numpy as np
import pytest

from fgn_tpu.models.fgn import FGN
from fgn_tpu.parallel.mesh import make_mesh
from fgn_tpu.train.loop import Runner
from fgn_tpu.train.optim import build_optimizer, make_lr_schedule
from fgn_tpu.train.train_step import make_train_step
from tests.test_train_e2e import TINY_MODEL, TinyFewShot, TinyMNISTISEG


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("runner")
    root = str(tmp / "raw")
    # 20 raw images: novel-digit-only images drop out of the parents
    # pool, and the 8-device runner test needs len(ds) >= batch 8
    TinyMNISTISEG.create(
        root=root, quantities={"train": 20, "val": 2, "test": 2}, seed=9
    )
    cfg = dict(
        n_ways=1, k_shots=1,
        ds_base_="MNISTISEG", ds_base__subset="train",
        ds_novel="MNISTISEG", ds_novel_subset="val",
        sampling_origin_ds="MNISTISEG", sampling_origin_ds_subset="train",
        sampling_cats="base_", sampling_scenario="parents",
        repeats=1, finetune="Ignore", shuffle=True,
        qry_cats_choice_random=True,
        delete_qry_insts_in_spp_insts_on_train=False,
        inner_root=root, root=str(tmp / "fst"),
    )
    return TinyFewShot(cfg), str(tmp)


def _build(ds, work_dir, n_dev=2, batch_size=2):
    model = FGN(cfg=TINY_MODEL)
    mesh = make_mesh(jax.devices("cpu")[:n_dev])
    from fgn_tpu.data.batching import collate_episodes

    samples = [ds[i] for i in range(batch_size)]
    batch, _ = collate_episodes(samples, ds.mean, ds.std, max_gt=8)
    params = jax.jit(
        lambda k, b, r: model.init(k, b, r, method=FGN.train_forward)
    )(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1))
    schedule = make_lr_schedule(1e-3, steps_per_epoch=4, warmup_iters=1)
    tx = build_optimizer(params, optimizer="adam", schedule=schedule)
    opt_state = jax.jit(tx.init)(params)
    train_step, mesh = make_train_step(model, tx, mesh)
    return Runner(
        model, params, opt_state, train_step, ds,
        batch_size=batch_size, work_dir=work_dir, mesh=mesh, max_epochs=2,
        evaluators=[], max_gt=8, log_interval=1, lr_schedule=schedule,
        hparams={"note": "runner-test"},
    )


def test_runner_trains_checkpoints_and_resumes(tiny):
    # Full 8-virtual-device mesh (VERDICT r3 item 3c): the epoch loop,
    # checkpoint cadence, and resume all run with the batch sharded 8
    # ways, not just 2.
    ds, tmp = tiny
    work = os.path.join(tmp, "run1")
    runner = _build(ds, work, n_dev=8, batch_size=8)
    runner.run()
    steps_per_epoch = len(ds) // 8
    assert steps_per_epoch >= 1, "degenerate fixture: zero-step epochs"
    assert runner.step == 2 * steps_per_epoch
    ckpts = os.listdir(os.path.join(work, "checkpoints"))
    assert ckpts, "no checkpoints saved"

    # Fresh runner in the same work_dir resumes at the last step; the
    # final checkpoint records epoch=max_epochs so completed epochs are
    # NEVER replayed (the reference/mmcv saves epoch+1 the same way).
    runner2 = _build(ds, work, n_dev=8, batch_size=8)
    assert runner2.resume()
    assert runner2.step == runner.step
    assert runner2.epoch == 2  # training is complete
    runner2.max_epochs = 2
    runner2.run()  # nothing left to do
    assert runner2.step == runner.step
    runner2.ckpt.close()
    runner.ckpt.close()


def test_mid_epoch_resume_consumes_each_episode_once(tiny):
    """Kill mid-epoch, resume: every batch of the epoch must be consumed
    exactly once across the two half-runs (VERDICT round-1 item 5)."""
    ds, tmp = tiny
    work = os.path.join(tmp, "run_cursor")
    steps_per_epoch = len(ds) // 2

    from fgn_tpu.data.batching import EpisodeLoader
    from fgn_tpu.parallel.mesh import shard_batch
    import jax as _jax

    # First half: run 2 steps, checkpoint with cursor=2, then "crash".
    runner = _build(ds, work)
    runner.max_epochs = 1
    runner.train_ds.reshuffle(0)
    seen_first = []
    loader = EpisodeLoader(runner.train_ds, 2, max_gt=8)
    for i, (batch, meta) in enumerate(loader):
        if i >= 2:
            break
        runner.rng, k = _jax.random.split(runner.rng)
        runner.params, runner.opt_state, _ = runner.train_step(
            runner.params, runner.opt_state,
            shard_batch(batch, runner.mesh), k,
        )
        seen_first.append(tuple(meta.idx.tolist()))
        runner.step += 1
    runner.check(epoch=0, cursor=2)
    runner.ckpt.wait()
    runner.ckpt.close()

    # Second half: fresh runner resumes mid-epoch with the saved cursor.
    runner2 = _build(ds, work)
    runner2.max_epochs = 1
    assert runner2.resume()
    assert runner2.step == 2
    assert runner2._start_cursor == 2

    runner2.train_ds.reshuffle(0)
    loader2 = EpisodeLoader(
        runner2.train_ds, 2, max_gt=8,
        start_batch=runner2._start_cursor,
    )
    seen_second = [tuple(m.idx.tolist()) for _, m in loader2]

    all_first = {i for t in seen_first for i in t}
    all_second = {i for t in seen_second for i in t}
    assert not (all_first & all_second), "episode consumed twice"
    assert len(all_first) + len(all_second) == steps_per_epoch * 2
    runner2.ckpt.close()
