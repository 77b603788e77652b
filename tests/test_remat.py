"""Remat (jax.checkpoint over model blocks) must not change numerics.

``FGNConfig.remat`` trades HBM residency for recompute in the backward
pass (reports/perf_profile.md: the train step is bandwidth-bound;
reports/hbm_budget.md: the relation tensor dominates peak memory). The
forward ops are IDENTICAL with remat on/off — these tests pin that, and
that param trees stay interchangeable (nn.remat keeps param paths).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from __graft_entry__ import _toy_batch
from fgn_tpu.models.fgn import FGN, FGNConfig

_SMALL = dict(
    n_ways=3, k_shots=1, backbone_norm="gn",
    rpn_train_nms_pre=64, rpn_train_max_per_img=16,
    rpn_test_nms_pre=64, rpn_test_max_per_img=16,
    rpn_num_samples=8, rcnn_num_samples=8, rcnn_max_per_img=4,
)


def _loss_and_grads(remat: str):
    cfg = FGNConfig(remat=remat, **_SMALL)
    model = FGN(cfg=cfg)
    batch = _toy_batch(B=2, H=64, W=64, N=3, K=1, S=32)

    @jax.jit
    def init(k, b, r):
        return model.init(k, b, r, method=FGN.train_forward)

    params = init(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1))

    @jax.jit
    def loss_fn(p):
        losses = model.apply(
            p, batch, jax.random.PRNGKey(2), method=FGN.train_forward
        )
        return sum(v for k, v in losses.items() if k.startswith("loss_"))

    loss, grads = jax.value_and_grad(loss_fn)(params)
    return params, float(loss), grads


def test_remat_identical_loss_and_grads():
    p0, loss0, g0 = _loss_and_grads("")
    p1, loss1, g1 = _loss_and_grads("backbone,res5,relation,mask")
    # Param paths unchanged (checkpoints interchangeable) and values
    # identical (same init keys through nn.remat).
    paths0 = [jax.tree_util.keystr(k)
              for k, _ in jax.tree_util.tree_leaves_with_path(p0)]
    paths1 = [jax.tree_util.keystr(k)
              for k, _ in jax.tree_util.tree_leaves_with_path(p1)]
    assert paths0 == paths1
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p1)):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    assert np.isfinite(loss0)
    # Same ops, same order: remat recomputes the forward instead of
    # saving it — bit-identical loss, grads equal to float tolerance
    # (XLA may fuse/schedule the recomputation differently).
    assert loss0 == pytest.approx(loss1, rel=0, abs=0)
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(g0),
        jax.tree_util.tree_leaves(g1),
    ):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        assert np.abs(a - b).max() <= 1e-5 * scale, (
            jax.tree_util.keystr(path), np.abs(a - b).max(), scale
        )
