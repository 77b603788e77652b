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
