"""Train / finetune / evaluate driver.

Rebuild of the reference entry point
(subprojects/sp02_omniiseg_fgn_mmdet/main.py:364-501): ``main(cfg)``
builds the episodic dataset(s), the FGN model, the optimizer and runner,
wires eval hooks discovered by ``eval_ds_cfg\\d`` key scan, handles the
finetune merge path (ft_ds_cfg0 + ft_ds_cfg1 → merge_ds), and resumes
from checkpoints. The N/K consistency asserts between model and dataset
configs are kept (reference main.py:396-400).

Usage:
    python -m fgn_tpu.main fgn_tpu/configs/fgn_train_mnistiseg_n1k1.py
"""

from __future__ import annotations

import dataclasses
import os
import re
import sys
from typing import Dict, List, Optional

import jax

if os.environ.get("FGN_STACK_DUMP_S"):
    # Hang forensics: periodically dump every thread's Python stack.
    # The axon tunnel client can wedge a process with all threads parked
    # in futex/socket waits; this shows which Python frame each wait
    # belongs to. Dumps go to FGN_STACK_DUMP_FILE (default
    # /tmp/fgn_stacks_<pid>.log), NOT stderr: the watchdog and
    # stall-nudger detect hangs via log-file mtime, and periodic dumps
    # into the same log keep refreshing it — a deadlocked run then looks
    # alive forever (observed in production; 36+ min undetected wedge).
    import faulthandler

    _dump_fp = os.environ.get(
        "FGN_STACK_DUMP_FILE", f"/tmp/fgn_stacks_{os.getpid()}.log"
    )
    _dump_f = open(_dump_fp, "a", buffering=1)
    faulthandler.dump_traceback_later(
        int(os.environ["FGN_STACK_DUMP_S"]), repeat=True, file=_dump_f
    )

from fgn_tpu.config import Config
from fgn_tpu.data.fst_bindings import init_ds_class_by_config
from fgn_tpu.models.fgn import FGN, FGNConfig
from fgn_tpu.parallel.mesh import make_mesh
from fgn_tpu.train.evaluator import Evaluator
from fgn_tpu.train.loop import Runner
from fgn_tpu.train.optim import build_optimizer, make_lr_schedule
from fgn_tpu.train.train_step import make_eval_step, make_train_step


def model_config_from_cfg(cfg: Config) -> FGNConfig:
    fields = {f.name for f in dataclasses.fields(FGNConfig)}
    kwargs = {k: v for k, v in dict(cfg.model).items() if k in fields}
    for k in ("anchor_scales", "anchor_ratios", "rcnn_bbox_stds"):
        if k in kwargs:
            kwargs[k] = tuple(kwargs[k])
    return FGNConfig(**kwargs)


def batch_heuristic(n_ways: int, k_shots: int) -> int:
    """Reference batch-size heuristic by (N, K)
    (main.py:487-501): N1K1 → 12, N3K1 → 10, N3K3 → 8.

    N3K1 is capped at 8 here for QUALITY, not memory: the rounds-3/4
    "b10 HBM crash" was retired in round 5 (XLA peak 5.65/16 GB,
    reports/hbm_budget.md; an 8-epoch b10 run completed crash-free —
    fgn_train_mnistiseg_n3k1_b10.py), but b10 under-trains
    way-classification on this data (0.235 vs 0.951 fresh bbox mAP,
    RESULTS.md "N3K1 batch-10")."""
    if n_ways == 1 and k_shots == 1:
        return 12
    return 8


def _init_params(model: FGN, ds, batch_size: int, max_gt: int, pad_hw=None,
                 seed: int = 0):
    """Initialize parameters from one real batch (jitted — eager init is
    minutes on a slow host)."""
    from fgn_tpu.data.batching import collate_episodes

    samples = [ds[i] for i in range(min(batch_size, len(ds)))]
    batch, _ = collate_episodes(
        samples, ds.mean, ds.std, max_gt=max_gt, pad_hw=pad_hw
    )
    init = jax.jit(
        lambda k, b, r: model.init(k, b, r, method=FGN.train_forward)
    )
    params = init(jax.random.PRNGKey(seed), batch, jax.random.PRNGKey(seed + 1))
    return params, batch


def main(cfg: Config):
    # Persistent compile cache: repeated runs at the same shapes skip the
    # ~10 min remote TPU compile.
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
    mcfg = model_config_from_cfg(cfg)
    model = FGN(cfg=mcfg)

    # --- datasets -------------------------------------------------------
    is_ft = "ft_ds_cfg0" in cfg
    if is_ft:
        ds0 = init_ds_class_by_config(cfg.ft_ds_cfg0)
        ds1 = init_ds_class_by_config(cfg.ft_ds_cfg1)
        ds0.merge_ds(ds1)
        train_ds = ds0
    else:
        train_ds = init_ds_class_by_config(cfg.train_ds_cfg)

    # N/K consistency (reference main.py:396-400)
    assert train_ds.n_ways == mcfg.n_ways
    assert train_ds.k_shots == mcfg.k_shots

    batch_size = int(cfg.get("batch_size") or batch_heuristic(mcfg.n_ways, mcfg.k_shots))
    max_gt = int(cfg.get("max_gt", 30))
    # Run seed (config key `seed`, default 0): drives param init and the
    # Runner's train-forward sampling rng — distinct seeds give genuinely
    # independent training trajectories for run-to-run variance bands
    # (dataset order stays the reference's epoch-seeded reshuffle).
    run_seed = int(cfg.get("seed", 0))

    # --- model / optimizer ----------------------------------------------
    params, example_batch = _init_params(
        model, train_ds, batch_size, max_gt, seed=run_seed
    )

    maybe_ckpt = cfg.get("checkpoint_fp") or ""
    if maybe_ckpt:
        from fgn_tpu.models.convert import load_torch_backbone

        params = load_torch_backbone(params, maybe_ckpt)

    steps_per_epoch = max(len(train_ds) // batch_size, 1)
    # Under gradient accumulation the optax.MultiSteps inner step counter
    # advances once per `cumulative_iters` micro-batches, so schedule
    # boundaries/warmup must be expressed in OPTIMIZER steps to keep the
    # reference's per-epoch decay timing.
    cum_iters = max(int(cfg.optimizer.get("cumulative_iters", 1)), 1)
    lr_kwargs = {k: v for k, v in dict(cfg.lr_schedule).items()}
    if lr_kwargs.get("type") == "cosine":
        lr_kwargs.setdefault("total_epochs", int(cfg.max_epochs))
    if cum_iters > 1:
        lr_kwargs["warmup_iters"] = max(
            int(lr_kwargs.get("warmup_iters", 100)) // cum_iters, 1
        )
    schedule = make_lr_schedule(
        base_lr=float(cfg.optimizer.lr),
        steps_per_epoch=max(steps_per_epoch // cum_iters, 1),
        **lr_kwargs,
    )
    tx = build_optimizer(
        params,
        base_lr=float(cfg.optimizer.lr),
        weight_decay=float(cfg.optimizer.weight_decay),
        optimizer=cfg.optimizer.type,
        roi_head_lr_mult=float(cfg.optimizer.get("roi_head_lr_mult", 0.1)),
        schedule=schedule,
        cumulative_iters=cum_iters,
        # Frozen-pretrained backbone (reference main.py:402-405 +
        # fgn.py:52-53): exclude it from updates entirely.
        frozen_modules=("backbone",) if mcfg.backbone_frozen else (),
    )
    opt_state = tx.init(params)

    mesh = make_mesh()
    train_step, mesh = make_train_step(model, tx, mesh)
    eval_step, _ = make_eval_step(model, mesh)

    # --- eval hooks (key scan like reference main.py:453-475) ------------
    evaluators: List[Evaluator] = []
    for key in sorted(cfg):
        if re.fullmatch(r"eval_ds_cfg\d+", key):
            eval_ds = init_ds_class_by_config(cfg[key])
            evaluators.append(
                Evaluator(
                    model, eval_ds,
                    batch_size=int(cfg.get("eval_batch_size", 4)),
                    eval_step=eval_step,
                    work_dir=str(cfg.work_dir),
                    max_gt=max_gt,
                    mask_thr=mcfg.mask_thr,
                    cache_episodes=bool(cfg.get("eval_cache_episodes", True)),
                )
            )

    # --- stage-1 checkpoint for FT (reference main_ft.py:104-109) --------
    if is_ft and cfg.get("init_from"):
        from fgn_tpu.train.checkpoints import CheckpointManager

        src = CheckpointManager(str(cfg.init_from))
        # Template-free restore: the stage-1 run's extra/ds_state tree
        # differs from this run's (different dataset), so only the raw
        # on-disk tree is read and the params subtree is taken.
        restored = src.restore()
        if restored is None:
            # Hard error: silently finetuning from scratch would produce
            # a plausible-looking but protocol-invalid FT cell.
            raise FileNotFoundError(
                f"no stage-1 checkpoint in {cfg.init_from} — run the "
                "matching stage-1 config first"
            )
        params = restored[1]["params"]
        print(f"Initialized from stage-1 checkpoint at step {restored[0]}")

    runner = Runner(
        model, params, opt_state, train_step, train_ds,
        batch_size=batch_size,
        work_dir=str(cfg.work_dir),
        mesh=mesh,
        max_epochs=int(cfg.get("max_epochs", 3)),
        eval_interval_iters=(
            int(cfg["eval_interval_iters"])
            if cfg.get("eval_interval_iters") else None
        ),
        evaluators=evaluators,
        max_gt=max_gt,
        max_keep_ckpts=int(cfg.get("max_keep_ckpts", 3)),
        log_interval=int(cfg.get("log_interval", 50)),
        seed=run_seed,
        # TB logs LR in micro-step domain (the Runner's step counter).
        lr_schedule=(
            schedule if cum_iters == 1
            else (lambda s: schedule(s // cum_iters))
        ),
        hparams={
            "optimizer": dict(cfg.optimizer),
            "lr_schedule": dict(cfg.lr_schedule),
            "model": dict(cfg.model),
            "batch_size": batch_size,
        },
    )
    runner.resume()
    return runner.run()


if __name__ == "__main__":
    config = Config.from_file(sys.argv[1])
    main(config)
