import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgn_tpu.data.batching import EpisodeBatch
from fgn_tpu.models.fgn import FGN, FGNConfig


def _toy_batch(rng, B=2, H=64, W=64, G=4, N=3, K=1, S=32):
    qry_img = rng.randn(B, H, W, 3).astype(np.float32) * 0.1
    qry_boxes = np.zeros((B, G, 4), np.float32)
    qry_cats = np.zeros((B, G), np.int32)
    qry_valid = np.zeros((B, G), bool)
    mh, mw = H // 4, W // 4
    qry_masks = np.zeros((B, G, mh, mw), np.float32)
    for b in range(B):
        for g in range(2):
            x1, y1 = rng.randint(0, W // 2, 2)
            bw, bh = rng.randint(12, 28, 2)
            qry_boxes[b, g] = [x1, y1, min(x1 + bw, W - 1), min(y1 + bh, H - 1)]
            qry_cats[b, g] = g % N
            qry_valid[b, g] = True
            bx = (qry_boxes[b, g] / 4).astype(int)
            qry_masks[b, g, bx[1] : bx[3], bx[0] : bx[2]] = 1.0
    spp_imgs = rng.randn(B, N * K, S, S, 3).astype(np.float32) * 0.1
    spp_boxes = np.tile(
        np.array([4, 4, S - 4, S - 4], np.float32), (B, N * K, 1)
    )
    spp_masks = np.zeros((B, N * K, S, S), np.float32)
    spp_masks[:, :, 8:-8, 8:-8] = 1.0
    img_hw = np.tile(np.array([H, W], np.int32), (B, 1))
    return EpisodeBatch(
        qry_img=jnp.asarray(qry_img),
        qry_boxes=jnp.asarray(qry_boxes),
        qry_cats=jnp.asarray(qry_cats),
        qry_valid=jnp.asarray(qry_valid),
        qry_masks=jnp.asarray(qry_masks),
        spp_imgs=jnp.asarray(spp_imgs),
        spp_boxes=jnp.asarray(spp_boxes),
        spp_masks=jnp.asarray(spp_masks),
        img_hw=jnp.asarray(img_hw),
    )


SMALL = FGNConfig(
    n_ways=3,
    k_shots=1,
    backbone_norm="gn",
    backbone_frozen=False,
    rpn_train_nms_pre=256,
    rpn_train_max_per_img=64,
    rpn_test_nms_pre=256,
    rpn_test_max_per_img=32,
    rcnn_num_samples=16,
    rpn_num_samples=16,
    rcnn_max_per_img=8,
)


@pytest.fixture(scope="module")
def model_and_params():
    model = FGN(cfg=SMALL)
    rng = np.random.RandomState(3)
    batch = _toy_batch(rng)
    # init/apply must be jitted: eager per-op dispatch of the full graph
    # is minutes on this host.
    init = jax.jit(
        lambda k, b, r: model.init(k, b, r, method=FGN.train_forward)
    )
    params = init(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1))
    return model, params, batch


def test_train_forward_losses(model_and_params):
    model, params, batch = model_and_params
    losses = jax.jit(
        lambda p, b, r: model.apply(p, b, r, method=FGN.train_forward)
    )(params, batch, jax.random.PRNGKey(2))
    for k in ("loss_rpn_cls", "loss_rpn_bbox", "loss_cls", "loss_bbox", "loss_mask"):
        v = float(losses[k])
        assert np.isfinite(v), f"{k} not finite"
        assert v >= 0, f"{k} negative"
    assert 0 <= float(losses["acc_balanced"]) <= 1


def test_gradients_flow(model_and_params):
    model, params, batch = model_and_params

    def total_loss(p):
        losses = model.apply(
            p, batch, jax.random.PRNGKey(2), method=FGN.train_forward
        )
        return sum(
            v for k, v in losses.items() if k.startswith("loss_")
        )

    grads = jax.jit(jax.grad(total_loss))(params)
    flat = jax.tree_util.tree_leaves(grads)
    norms = [float(jnp.abs(g).max()) for g in flat]
    assert all(np.isfinite(n) for n in norms)
    assert sum(n > 0 for n in norms) > len(norms) // 2, "too many dead grads"
    # every head receives gradient
    gp = grads["params"]
    for key in ("rpn_cls", "rpn_reg", "fc_cls", "fc_reg", "mask_logits",
                "rel_conv_roi", "rel_conv_spp", "backbone"):
        g = jax.tree_util.tree_leaves(gp[key])
        assert any(float(jnp.abs(x).max()) > 0 for x in g), f"dead grads in {key}"


def test_test_forward_shapes(model_and_params):
    model, params, batch = model_and_params
    out = jax.jit(lambda p, b: model.apply(p, b, method=FGN.test_forward))(
        params, batch
    )
    B = batch.qry_img.shape[0]
    M = SMALL.rcnn_max_per_img
    assert out["dt_boxes"].shape == (B, M, 4)
    assert out["dt_scores"].shape == (B, M)
    assert out["dt_cats"].shape == (B, M)
    assert out["dt_valid"].shape == (B, M)
    assert out["dt_mask_logits"].shape == (B, M, 14, 14)
    # classes within range, scores sorted desc among valid
    v = np.asarray(out["dt_valid"])
    s = np.asarray(out["dt_scores"])
    cats = np.asarray(out["dt_cats"])
    assert ((cats >= 0) & (cats < SMALL.n_ways)).all()
    for b in range(B):
        sv = s[b][v[b]]
        assert np.all(np.diff(sv) <= 1e-6)
    # boxes within image bounds
    boxes = np.asarray(out["dt_boxes"])
    assert boxes.min() >= 0 and boxes.max() <= 64


def test_frozen_backbone_no_grad():
    model = FGN(cfg=FGNConfig(
        n_ways=3, k_shots=1, backbone_norm="frozen_bn", backbone_frozen=True,
        rpn_train_nms_pre=128, rpn_train_max_per_img=32,
        rcnn_num_samples=8, rpn_num_samples=8, rcnn_max_per_img=4,
    ))
    rng = np.random.RandomState(0)
    batch = _toy_batch(rng, B=1)
    params = jax.jit(
        lambda k, b, r: model.init(k, b, r, method=FGN.train_forward)
    )(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1))

    def total_loss(p):
        losses = model.apply(
            p, batch, jax.random.PRNGKey(2), method=FGN.train_forward
        )
        return sum(v for k, v in losses.items() if k.startswith("loss_"))

    grads = jax.jit(jax.grad(total_loss))(params)["params"]
    bb = jax.tree_util.tree_leaves(grads["backbone"])
    assert all(float(jnp.abs(x).max()) == 0 for x in bb)


def test_proposals_filter_degenerate_boxes():
    """Regression: zero-area decoded boxes (IoU 0 with everything, so NMS
    cannot suppress them) must be dropped before NMS even when an
    untrained anchor channel gives them the top score."""
    model = FGN(cfg=SMALL)
    h = w = 4
    A = SMALL.num_anchors
    cls_m = jnp.full((1, h, w, A), -10.0)
    reg_m = jnp.zeros((1, h, w, A, 4))
    # Anchor channel A-1 (the 512px anchor): push it far above the image
    # so the clipped box has zero height, and give it the max score.
    cls_m = cls_m.at[..., A - 1].set(20.0)
    reg_m = reg_m.at[..., A - 1, 1].set(-10.0)  # dy: shift way up
    # One honest mid-score anchor.
    cls_m = cls_m.at[0, 2, 2, 6].set(5.0)
    img_hw = jnp.array([[64, 64]])
    props, scores, valid = model.apply(
        {}, cls_m, reg_m, img_hw, 64, 8, method=FGN.get_proposals
    )
    props, scores, valid = map(np.asarray, (props, scores, valid))
    kept = props[0][valid[0]]
    assert len(kept) >= 1
    hs = kept[:, 3] - kept[:, 1]
    ws = kept[:, 2] - kept[:, 0]
    assert (hs > 0).all() and (ws > 0).all(), kept


def test_guidance_off_plain_frcnn():
    """sp01-equivalent mode: support conditioning disabled end to end."""
    import dataclasses

    cfg = dataclasses.replace(SMALL, n_ways=1, guidance=False)
    model = FGN(cfg=cfg)
    rng = np.random.RandomState(1)
    batch = _toy_batch(rng, N=1)
    init = jax.jit(
        lambda k, b, r: model.init(k, b, r, method=FGN.train_forward)
    )
    params = init(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1))
    losses = jax.jit(
        lambda p, b, r: model.apply(p, b, r, method=FGN.train_forward)
    )(params, batch, jax.random.PRNGKey(2))
    assert all(
        np.isfinite(float(v)) for k, v in losses.items() if k.startswith("loss_")
    )
    # support images must have NO influence on the outputs
    out1 = jax.jit(lambda p, b: model.apply(p, b, method=FGN.test_forward))(
        params, batch
    )
    batch2 = batch._replace(spp_imgs=batch.spp_imgs * 0.0 + 1.0)
    out2 = jax.jit(lambda p, b: model.apply(p, b, method=FGN.test_forward))(
        params, batch2
    )
    assert np.allclose(
        np.asarray(out1["dt_scores"]), np.asarray(out2["dt_scores"])
    )
