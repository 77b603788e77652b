"""End-to-end slice: synthetic dataset → episodic sampler → FGN train
steps → episodic evaluation → checkpoint round-trip.

The reference's equivalent is the MNISTISEG overfit mode
(SURVEY.md §7 'minimum end-to-end slice'); here scaled down to a
128px dataset so the whole thing runs on the CPU test mesh.
"""

import os

import jax
import numpy as np
import pytest

from fgn_tpu.data.batching import EpisodeLoader, collate_episodes
from fgn_tpu.data.mnistiseg import MNISTISEG
from fgn_tpu.data.fst_bindings import MNISTFewShotISEG
from fgn_tpu.models.fgn import FGN, FGNConfig
from fgn_tpu.train.evaluator import Evaluator
from fgn_tpu.train.optim import build_optimizer, make_lr_schedule
from fgn_tpu.train.train_step import make_eval_step, make_train_step
from fgn_tpu.parallel.mesh import make_mesh, shard_batch


class TinyMNISTISEG(MNISTISEG):
    img_size = 128
    target_size = 128
    max_size = 128
    ds_name = "tiny_mnistiseg"
    sizes_max_amount = {"small": 2, "large": 2}
    sizes_min_max_ratios = {"small": [0.7, 1.0], "large": [1.0, 1.4]}


class TinyFewShot(MNISTFewShotISEG):
    inner_ds_cl = TinyMNISTISEG
    spp_img_size = 64
    fst_dir_name = "tiny_fst"


TINY_MODEL = FGNConfig(
    n_ways=1, k_shots=1, backbone_norm="gn", backbone_frozen=False,
    rpn_train_nms_pre=512, rpn_train_max_per_img=128,
    rpn_test_nms_pre=512, rpn_test_max_per_img=64,
    rpn_num_samples=32, rcnn_num_samples=32, rcnn_max_per_img=10,
)


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    root = str(tmp / "raw")
    TinyMNISTISEG.create(
        root=root, quantities={"train": 10, "val": 4, "test": 2}, seed=7
    )
    cfg = dict(
        n_ways=1, k_shots=1,
        ds_base_="MNISTISEG", ds_base__subset="train",
        ds_novel="MNISTISEG", ds_novel_subset="val",
        sampling_origin_ds="MNISTISEG", sampling_origin_ds_subset="train",
        sampling_cats="base_", sampling_scenario="parents",
        repeats=1, finetune="Ignore", shuffle=False,
        qry_cats_choice_random=True,
        # tiny dataset: rare cats may have all instances on the query
        # image, so keep query instances eligible as supports
        delete_qry_insts_in_spp_insts_on_train=False,
        inner_root=root, root=str(tmp / "fst"),
    )
    ds = TinyFewShot(cfg)
    eval_cfg = dict(cfg, sampling_origin_ds_subset="val", root=str(tmp / "fst"))
    eval_ds = TinyFewShot(eval_cfg)
    return ds, eval_ds, str(tmp)


def test_train_steps_and_eval(tiny_setup):
    ds, eval_ds, work = tiny_setup
    model = FGN(cfg=TINY_MODEL)
    mesh = make_mesh(jax.devices("cpu")[:2])

    loader = EpisodeLoader(ds, batch_size=2, max_gt=8)
    batches = [b for b, _ in loader]
    assert len(batches) >= 3

    init = jax.jit(
        lambda k, b, r: model.init(k, b, r, method=FGN.train_forward)
    )
    params = init(jax.random.PRNGKey(0), batches[0], jax.random.PRNGKey(1))
    tx = build_optimizer(
        params, base_lr=2e-3, optimizer="adam",
        schedule=make_lr_schedule(2e-3, steps_per_epoch=100, warmup_iters=1),
    )
    opt_state = jax.jit(tx.init)(params)
    train_step, mesh = make_train_step(model, tx, mesh)

    rng = jax.random.PRNGKey(3)
    losses = []
    for epoch in range(6):
        for batch in batches:
            rng, k = jax.random.split(rng)
            params, opt_state, metrics = train_step(
                params, opt_state, shard_batch(batch, mesh), k
            )
            losses.append(float(metrics["loss_total"]))
    assert all(np.isfinite(l) for l in losses)
    # training reduces the loss on this trivially small set
    assert np.mean(losses[-len(batches):]) < np.mean(losses[: len(batches)])

    # --- evaluation end-to-end (pkl chunks → FSISEGEval metrics) ---------
    eval_step, _ = make_eval_step(model, mesh)
    ev = Evaluator(
        model, eval_ds, batch_size=2, eval_step=eval_step,
        work_dir=os.path.join(work, "evalrun"), max_gt=8,
    )
    metrics = ev.run(params)
    assert len(metrics) == 4
    for k, v in metrics.items():
        assert 0.0 <= v <= 1.0, (k, v)
    tags = sorted(metrics)
    assert any("bbox_mAP" in t for t in tags)
    assert any("isegm_mAR" in t for t in tags)
    assert all(t.startswith("MNISTISEG_val_FT_Ignore/") for t in tags)
    # The first pass STREAMS episodes into the cache (round 5: no
    # serial list(loader) phase); a second pass must reuse it and
    # reproduce the metrics exactly (same episodes, same graph).
    assert ev._episode_cache is not None and len(ev._episode_cache) > 0
    assert ev.run(params) == metrics

    # --- checkpoint round-trip -------------------------------------------
    from fgn_tpu.train.checkpoints import CheckpointManager

    mngr = CheckpointManager(os.path.join(work, "ckpt"), max_keep=2)
    mngr.save(1, params, opt_state, extra={"epoch": 1, "ds_state": ds.state_dict()})
    mngr.wait()
    step, restored = mngr.restore(
        template={"params": params, "opt_state": opt_state,
                  "extra": {"epoch": 0, "ds_state": ds.state_dict()}}
    )
    assert step == 1
    a = jax.tree_util.tree_leaves(params)[0]
    b = jax.tree_util.tree_leaves(restored["params"])[0]
    assert np.allclose(np.asarray(a), np.asarray(b))
    mngr.close()
