"""Frozen-pretrained backbone pipeline (VERDICT r3 item 5).

Covers the convert→train wiring on CPU:
  * export (orbax backbone → DenseCL-layout torch .pth,
    tools/export_pretrained_pth.py) round-trips through
    models/convert.py::load_torch_backbone with ZERO missing tensors
    and exact values;
  * training with backbone_frozen=True + frozen_modules=("backbone",)
    leaves every backbone param bit-identical while heads move.

Reference anchors: fgn_r50_c4_densecl.py:4-41, main.py:402-405 (res4
drop — structural here: ResNetC4 never builds a 4th stage),
fgn.py:52-53,67-77 (no-grad feature extraction when frozen).
"""

import os

import jax
import numpy as np
import pytest

from __graft_entry__ import _toy_batch
from fgn_tpu.models.fgn import FGN, FGNConfig
from fgn_tpu.parallel.mesh import make_mesh, shard_batch
from fgn_tpu.train.optim import build_optimizer, make_lr_schedule
from fgn_tpu.train.train_step import make_train_step

FROZEN_CFG = FGNConfig(
    n_ways=1, k_shots=1, backbone_norm="frozen_bn", backbone_frozen=True,
    deep_stem=False, avg_down=False,
    rpn_train_nms_pre=256, rpn_train_max_per_img=64,
    rpn_test_nms_pre=256, rpn_test_max_per_img=32,
    rpn_num_samples=16, rcnn_num_samples=16, rcnn_max_per_img=8,
)


def test_export_roundtrips_through_converter(tmp_path):
    import torch

    from fgn_tpu.models.convert import load_torch_backbone
    from fgn_tpu.models.resnet import ResNetC4
    from tools.export_pretrained_pth import backbone_to_state_dict

    bb = ResNetC4(norm="frozen_bn", deep_stem=False, avg_down=False)
    variables = jax.jit(bb.init)(
        jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32)
    )
    backbone = jax.device_get(variables["params"])
    sd = backbone_to_state_dict(backbone)
    fp = str(tmp_path / "standin.pth")
    torch.save(
        {"state_dict": {k: torch.from_numpy(v) for k, v in sd.items()}}, fp
    )

    # a DIFFERENT random init must be fully overwritten by the load
    variables2 = jax.jit(bb.init)(
        jax.random.PRNGKey(1), np.zeros((1, 64, 64, 3), np.float32)
    )
    fake_full = {"params": {"backbone": jax.device_get(variables2["params"])}}
    out = load_torch_backbone(fake_full, fp)

    flat_src = jax.tree_util.tree_leaves_with_path(backbone)
    flat_out = jax.tree_util.tree_leaves(out["params"]["backbone"])
    assert len(flat_src) == len(flat_out)
    for (path, a), b in zip(flat_src, flat_out):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=1e-6,
            err_msg=jax.tree_util.keystr(path),
        )


def test_frozen_backbone_params_never_move(cpu_devices):
    model = FGN(cfg=FROZEN_CFG)
    batch = _toy_batch(B=2, H=64, W=64, N=1, K=1, S=32)
    init = jax.jit(
        lambda k, b, r: model.init(k, b, r, method=FGN.train_forward)
    )
    params = init(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1))
    tx = build_optimizer(
        params, base_lr=5e-3, optimizer="adam", weight_decay=1e-3,
        schedule=make_lr_schedule(5e-3, steps_per_epoch=10, warmup_iters=1),
        frozen_modules=("backbone",),
    )
    mesh = make_mesh(cpu_devices[:2])
    opt_state = jax.jit(tx.init)(params)
    train_step, mesh = make_train_step(model, tx, mesh)

    before = jax.device_get(params)
    p, o = params, opt_state
    for i in range(3):
        p, o, metrics = train_step(
            p, o, shard_batch(batch, mesh), jax.random.PRNGKey(2 + i)
        )
    assert np.isfinite(float(metrics["loss_total"]))
    after = jax.device_get(p)

    bb_before = before["params"]["backbone"]
    bb_after = after["params"]["backbone"]
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(bb_before),
        jax.tree_util.tree_leaves(bb_after),
    ):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg=f"frozen backbone moved at {jax.tree_util.keystr(path)}",
        )

    # ...while the trainable heads actually moved
    moved = 0
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(before["params"]),
        jax.tree_util.tree_leaves(after["params"]),
    ):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        if top != "backbone" and not np.array_equal(
            np.asarray(a), np.asarray(b)
        ):
            moved += 1
    assert moved > 0, "no head parameters changed"
