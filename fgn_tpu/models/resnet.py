"""ResNet-50-C4 backbone and the FGN shared res5 head, in flax.

TPU-native rebuild of the backbone the reference configures via mmdet
(subprojects/sp02_omniiseg_fgn_mmdet/fgn_r50_c4_densecl.py:14-41):
ResNet-50, out_indices=(2,) → a single C4 feature map (1024 channels,
stride 16). Two flavors are used:

  * DenseCL-pretrained: 7×7 stem, BN frozen, whole backbone frozen
    (``frozen_stages=4``) — here ``norm='frozen_bn'`` folds BN into a
    per-channel affine (scale, bias) whose values come from the torch
    checkpoint via models/convert.py;
  * from-scratch (fgn_r50_c4_scratch.py:11-29): deep 3×3×3 stem,
    avg-down shortcuts, GroupNorm(32), trainable.

Layout is NHWC with channel-last convs (XLA/TPU native). Submodule names
(conv1/bn1/layer{1..3}/block{i}/{conv,bn}{1..3}/ds_conv/ds_bn) define the
param-tree paths the torch converter maps onto (models/convert.py).

``SharedRes5`` is the FGN RoI head's shared stage-5 ResLayer with
Bottleneck expansion hacked 4→2 and stride 1 (reference:
fgn_roi_head.py:202-233); GroupNorm by default (the reference's
hyperparameter sweep found GN > BN on this head, SURVEY.md §6).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class FrozenAffine(nn.Module):
    """Per-channel scale + bias — a BatchNorm folded at conversion time.

    Values default to identity; models/convert.py fills them from torch
    running stats (_fold_bn)."""

    features: int
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        dt = x.dtype
        return x * scale.astype(dt) + bias.astype(dt)


def make_norm(norm: str, features: int, dtype=None, name: str = None):
    if norm == "gn":
        groups = 32 if features % 32 == 0 else features
        return nn.GroupNorm(
            num_groups=groups, epsilon=1e-5, dtype=dtype, name=name
        )
    if norm in ("frozen_bn", "bn"):
        # Training-mode running-stat BN buys nothing under data-parallel
        # jit at these batch sizes; both variants are affine at apply time
        # ('bn' simply starts at identity and trains its scale/bias).
        return FrozenAffine(features=features, dtype=dtype, name=name)
    raise ValueError(f"unknown norm {norm!r}")


class Bottleneck(nn.Module):
    """mmdet 'pytorch'-style bottleneck: stride on conv2 (3×3)."""

    planes: int
    stride: int = 1
    expansion: int = 4
    norm: str = "gn"
    avg_down: bool = False
    has_downsample: bool = False
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * self.expansion
        identity = x
        y = nn.Conv(
            self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1"
        )(x)
        y = make_norm(self.norm, self.planes, self.dtype, "bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            use_bias=False, dtype=self.dtype, name="conv2",
        )(y)
        y = make_norm(self.norm, self.planes, self.dtype, "bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(
            out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv3"
        )(y)
        y = make_norm(self.norm, out_ch, self.dtype, "bn3")(y)

        if self.has_downsample:
            if self.avg_down and self.stride > 1:
                identity = nn.avg_pool(
                    identity, (self.stride, self.stride),
                    strides=(self.stride, self.stride),
                )
                identity = nn.Conv(
                    out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="ds_conv",
                )(identity)
            else:
                identity = nn.Conv(
                    out_ch, (1, 1), strides=(self.stride, self.stride),
                    use_bias=False, dtype=self.dtype, name="ds_conv",
                )(identity)
            identity = make_norm(self.norm, out_ch, self.dtype, "ds_bn")(identity)
        return nn.relu(y + identity)


class ResLayer(nn.Module):
    planes: int
    num_blocks: int
    stride: int = 1
    expansion: int = 4
    norm: str = "gn"
    avg_down: bool = False
    in_channels: int = 0
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * self.expansion
        for i in range(self.num_blocks):
            stride = self.stride if i == 0 else 1
            has_ds = i == 0 and (
                stride != 1 or self.in_channels != out_ch
            )
            x = Bottleneck(
                planes=self.planes, stride=stride, expansion=self.expansion,
                norm=self.norm, avg_down=self.avg_down, has_downsample=has_ds,
                dtype=self.dtype, name=f"block{i}",
            )(x)
        return x


class ResNetC4(nn.Module):
    """Stem + stages 1-3 → (B, H/16, W/16, 1024).

    ``frozen=True`` stop-gradients the output (the reference freezes all
    four stages of the pretrained backbone, fgn_r50_c4_densecl.py:31)."""

    norm: str = "gn"
    frozen: bool = False
    deep_stem: bool = False
    avg_down: bool = False
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        if self.deep_stem:
            x = nn.Conv(
                32, (3, 3), strides=(2, 2), use_bias=False, dtype=self.dtype,
                name="stem_conv1",
            )(x)
            x = make_norm(self.norm, 32, self.dtype, "stem_bn1")(x)
            x = nn.relu(x)
            x = nn.Conv(
                32, (3, 3), use_bias=False, dtype=self.dtype, name="stem_conv2"
            )(x)
            x = make_norm(self.norm, 32, self.dtype, "stem_bn2")(x)
            x = nn.relu(x)
            x = nn.Conv(
                64, (3, 3), use_bias=False, dtype=self.dtype, name="stem_conv3"
            )(x)
            x = make_norm(self.norm, 64, self.dtype, "stem_bn3")(x)
            x = nn.relu(x)
        else:
            x = nn.Conv(
                64, (7, 7), strides=(2, 2), use_bias=False, dtype=self.dtype,
                name="conv1",
            )(x)
            x = make_norm(self.norm, 64, self.dtype, "bn1")(x)
            x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        x = ResLayer(
            planes=64, num_blocks=3, stride=1, norm=self.norm,
            avg_down=self.avg_down, in_channels=64, dtype=self.dtype,
            name="layer1",
        )(x)
        x = ResLayer(
            planes=128, num_blocks=4, stride=2, norm=self.norm,
            avg_down=self.avg_down, in_channels=256, dtype=self.dtype,
            name="layer2",
        )(x)
        x = ResLayer(
            planes=256, num_blocks=6, stride=2, norm=self.norm,
            avg_down=self.avg_down, in_channels=512, dtype=self.dtype,
            name="layer3",
        )(x)
        if self.frozen:
            x = jax.lax.stop_gradient(x)
        return x


class SharedRes5(nn.Module):
    """FGN shared head: res5 ResLayer with expansion 2, stride 1,
    1024 → 1024 (reference: fgn_roi_head.py:202-233)."""

    norm: str = "gn"
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        return ResLayer(
            planes=512, num_blocks=3, stride=1, expansion=2, norm=self.norm,
            in_channels=1024, dtype=self.dtype, name="res5",
        )(x)
