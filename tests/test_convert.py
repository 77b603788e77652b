"""Torch→flax backbone conversion: build a tiny torch state_dict in the
torchvision ResNet layout and check tensors land transposed/folded."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from fgn_tpu.models.convert import _fold_bn, _map_path, load_torch_backbone
from fgn_tpu.models.resnet import ResNetC4


def test_map_path():
    assert _map_path(("conv1", "kernel")) == "conv1"
    assert _map_path(("bn1", "scale")) == "bn1"
    assert _map_path(("layer2", "block3", "conv2", "kernel")) == "layer2.3.conv2"
    assert _map_path(("layer1", "block0", "ds_conv", "kernel")) == "layer1.0.downsample.0"
    assert _map_path(("layer1", "block0", "ds_bn", "scale")) == "layer1.0.downsample.1"


def test_fold_bn():
    g = np.array([2.0]); b = np.array([1.0])
    m = np.array([0.5]); v = np.array([4.0])
    scale, bias = _fold_bn(g, b, m, v, eps=0.0)
    # y = (x - 0.5)/2 * 2 + 1 = x + 0.5 → scale 1, bias 0.5
    assert np.allclose(scale, 1.0)
    assert np.allclose(bias, 0.5)


def test_backbone_conversion_roundtrip(tmp_path, rng):
    backbone = ResNetC4(norm="frozen_bn", frozen=True)
    x = jnp.zeros((1, 64, 64, 3))
    params = jax.jit(backbone.init)(jax.random.PRNGKey(0), x)

    # Torch state_dict with matching shapes for a couple of entries.
    w_conv1 = rng.randn(64, 3, 7, 7).astype(np.float32)
    gamma = rng.rand(64).astype(np.float32) + 0.5
    beta = rng.randn(64).astype(np.float32)
    mean = rng.randn(64).astype(np.float32)
    var = rng.rand(64).astype(np.float32) + 0.5
    sd = {
        "backbone.conv1.weight": torch.from_numpy(w_conv1),
        "backbone.bn1.weight": torch.from_numpy(gamma),
        "backbone.bn1.bias": torch.from_numpy(beta),
        "backbone.bn1.running_mean": torch.from_numpy(mean),
        "backbone.bn1.running_var": torch.from_numpy(var),
    }
    fp = str(tmp_path / "ckpt.pth")
    torch.save({"state_dict": sd}, fp)

    full = {"params": {"backbone": params["params"]}}
    out = load_torch_backbone(full, fp)
    got_kernel = np.asarray(out["params"]["backbone"]["conv1"]["kernel"])
    assert got_kernel.shape == (7, 7, 3, 64)
    assert np.allclose(got_kernel, w_conv1.transpose(2, 3, 1, 0))
    scale = np.asarray(out["params"]["backbone"]["bn1"]["scale"])
    bias = np.asarray(out["params"]["backbone"]["bn1"]["bias"])
    exp_scale, exp_bias = _fold_bn(gamma, beta, mean, var)
    assert np.allclose(scale, exp_scale, atol=1e-6)
    assert np.allclose(bias, exp_bias, atol=1e-6)
    # untouched tensors stay from init
    l1 = np.asarray(out["params"]["backbone"]["layer1"]["block0"]["conv1"]["kernel"])
    ref = np.asarray(params["params"]["layer1"]["block0"]["conv1"]["kernel"])
    assert np.allclose(l1, ref)


def test_full_densecl_layout_loads_completely(tmp_path, rng):
    """Build the COMPLETE DenseCL/mmcv checkpoint layout (backbone.*
    prefixed, every stem/stage tensor, plus neck/head keys that must be
    ignored) and require that EVERY backbone leaf converts — a single
    silently-skipped tensor is how a wrong layout slips through
    (VERDICT round-1 item 8)."""
    import io
    from contextlib import redirect_stdout

    backbone = ResNetC4(norm="frozen_bn", frozen=True)
    params = jax.jit(backbone.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
    )

    from fgn_tpu.models.convert import _map_path as mp

    sd = {}
    flat = jax.tree_util.tree_flatten_with_path(params["params"])[0]
    for path, leaf in flat:
        names = tuple(p.key for p in path)
        prefix = "backbone." + mp(names)
        if names[-1] == "kernel":
            kh, kw, ci, co = leaf.shape
            sd[prefix + ".weight"] = torch.from_numpy(
                rng.randn(co, ci, kh, kw).astype(np.float32)
            )
        elif names[-1] == "scale":
            c = leaf.shape[0]
            sd[prefix + ".weight"] = torch.from_numpy(
                rng.rand(c).astype(np.float32) + 0.5
            )
            sd[prefix + ".bias"] = torch.from_numpy(
                rng.randn(c).astype(np.float32)
            )
            sd[prefix + ".running_mean"] = torch.from_numpy(
                rng.randn(c).astype(np.float32)
            )
            sd[prefix + ".running_var"] = torch.from_numpy(
                rng.rand(c).astype(np.float32) + 0.5
            )
            sd[prefix + ".num_batches_tracked"] = torch.tensor(1600)

    # The mapping must produce the real torchvision/mmcv names.
    for expect in (
        "backbone.conv1.weight",
        "backbone.bn1.running_var",
        "backbone.layer1.0.downsample.0.weight",
        "backbone.layer1.0.downsample.1.running_mean",
        "backbone.layer3.5.bn3.weight",
        "backbone.layer2.3.conv2.weight",
    ):
        assert expect in sd, expect

    # DenseCL checkpoints also carry projector/momentum-encoder keys.
    sd["neck.mlp.0.weight"] = torch.zeros(128, 2048)
    sd["head.fc.weight"] = torch.zeros(10, 128)

    fp = str(tmp_path / "densecl.pth")
    torch.save({"state_dict": sd}, fp)
    full = {"params": {"backbone": params["params"]}}

    buf = io.StringIO()
    with redirect_stdout(buf):
        out = load_torch_backbone(full, fp)
    assert "0 missing" in buf.getvalue(), buf.getvalue()

    # every leaf actually changed to the torch values
    got = jax.tree_util.tree_flatten_with_path(
        out["params"]["backbone"]
    )[0]
    for path, leaf in got:
        names = tuple(p.key for p in path)
        prefix = "backbone." + mp(names)
        if names[-1] == "kernel":
            w = sd[prefix + ".weight"].numpy().transpose(2, 3, 1, 0)
            assert np.allclose(np.asarray(leaf), w), prefix
        else:
            scale, bias = _fold_bn(
                sd[prefix + ".weight"].numpy(),
                sd[prefix + ".bias"].numpy(),
                sd[prefix + ".running_mean"].numpy(),
                sd[prefix + ".running_var"].numpy(),
            )
            exp = scale if names[-1] == "scale" else bias
            assert np.allclose(np.asarray(leaf), exp, atol=1e-6), prefix


def test_wrong_layout_fails_loudly(tmp_path):
    """A checkpoint whose keys match nothing must raise, not silently
    leave the random init in place."""
    backbone = ResNetC4(norm="frozen_bn", frozen=True)
    params = jax.jit(backbone.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
    )
    sd = {"encoder_q.stem.conv.weight": torch.zeros(64, 3, 7, 7)}
    fp = str(tmp_path / "bad.pth")
    torch.save({"state_dict": sd}, fp)
    full = {"params": {"backbone": params["params"]}}
    with pytest.raises(ValueError):
        load_torch_backbone(full, fp, verbose=False)


def test_folded_bn_numerics_golden():
    """conv + folded BN output matches the direct BN formula on a tiny
    fixture (torch-free golden)."""
    g = np.array([1.5, 0.5], np.float32)
    b = np.array([0.1, -0.2], np.float32)
    m = np.array([0.3, -0.1], np.float32)
    v = np.array([0.25, 4.0], np.float32)
    x = np.array([[0.2, -1.0], [3.0, 0.5]], np.float32)  # (2 samples, 2 ch)
    eps = 1e-5
    golden = (x - m) / np.sqrt(v + eps) * g + b
    scale, bias = _fold_bn(g, b, m, v, eps=eps)
    assert np.allclose(x * scale + bias, golden, atol=1e-6)
