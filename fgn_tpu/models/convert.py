"""Torch checkpoint → flax backbone conversion (DenseCL ResNet-50).

The reference initializes its backbone from a DenseCL torch checkpoint
(fgn_r50_c4_densecl.py:4-11,39-41; main.py:402-405). This module maps a
torchvision/mmcv-layout ResNet state_dict onto the ResNetC4 param tree:

  * conv weights transpose (O, I, kh, kw) → (kh, kw, I, O);
  * BatchNorms fold into the FrozenAffine (scale, bias) pairs:
    scale = γ / sqrt(var + eps), bias = β − mean · scale;
  * keys are matched under several prefixes ('backbone.', 'module.', '')
    — DenseCL checkpoints carry a 'backbone.'-prefixed state_dict.

Missing/unconvertible keys are REPORTED (printed with a count); the
loader raises if nothing at all matched, which catches a wrong layout
loudly instead of silently training from random init.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _fold_bn(gamma, beta, mean, var, eps: float = 1e-5):
    gamma = np.asarray(gamma, np.float64)
    beta = np.asarray(beta, np.float64)
    mean = np.asarray(mean, np.float64)
    var = np.asarray(var, np.float64)
    scale = gamma / np.sqrt(var + eps)
    bias = beta - mean * scale
    return scale.astype(np.float32), bias.astype(np.float32)


def _map_path(path: Tuple[str, ...]) -> str:
    """Flax param path → torch module prefix.

    ('layer2', 'block3', 'conv2', 'kernel') → 'layer2.3.conv2';
    downsample convs/bns ('ds_conv'/'ds_bn') → 'downsample.0/1'."""
    parts = []
    for p in path[:-1]:
        name = p if isinstance(p, str) else getattr(p, "key", str(p))
        if name.startswith("block"):
            parts.append(name[len("block"):])
        elif name == "ds_conv":
            parts.append("downsample.0")
        elif name == "ds_bn":
            parts.append("downsample.1")
        else:
            parts.append(name)
    return ".".join(parts)


def load_torch_backbone(params: Dict, checkpoint_fp: str,
                        verbose: bool = True) -> Dict:
    """Fill params['params']['backbone'] from a torch checkpoint.

    Returns a new param pytree; reports (and tolerates) missing torch
    keys so partial checkpoints can be probed, but raises when NOTHING
    matches — that means the layout assumption is wrong."""
    import jax
    import torch

    ckpt = torch.load(checkpoint_fp, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}
    prefixes = ("backbone.", "module.backbone.", "module.", "")

    def find(key: str):
        for pre in prefixes:
            if pre + key in sd:
                return sd[pre + key]
        return None

    loaded, missing = [], []

    flat = jax.tree_util.tree_flatten_with_path(
        params["params"]["backbone"]
    )[0]
    new_backbone = params["params"]["backbone"]
    new_backbone = jax.tree_util.tree_map(lambda x: x, new_backbone)  # copy

    def set_in(tree, path, value):
        node = tree
        for p in path[:-1]:
            name = p if isinstance(p, str) else getattr(p, "key", str(p))
            node = node[name]
        leaf = path[-1]
        leaf = leaf if isinstance(leaf, str) else getattr(leaf, "key", str(leaf))
        node[leaf] = value

    # Work on a mutable copy
    import copy as _copy

    mutable = _copy.deepcopy(
        jax.tree_util.tree_map(np.asarray, params["params"]["backbone"])
    )

    for path, leaf in flat:
        names = [
            p.key if hasattr(p, "key") else str(p) for p in path
        ]
        torch_prefix = _map_path(tuple(names))
        leaf_name = names[-1]
        if leaf_name == "kernel":
            w = find(torch_prefix + ".weight")
            if w is None:
                missing.append(torch_prefix + ".weight")
                continue
            if w.ndim != 4:
                missing.append(torch_prefix + ".weight (ndim)")
                continue
            w = w.transpose(2, 3, 1, 0)
            if w.shape != leaf.shape:
                missing.append(f"{torch_prefix}.weight (shape {w.shape})")
                continue
            set_in(mutable, names, w.astype(np.float32))
            loaded.append(torch_prefix)
        elif leaf_name in ("scale", "bias"):
            g = find(torch_prefix + ".weight")
            b = find(torch_prefix + ".bias")
            m = find(torch_prefix + ".running_mean")
            v = find(torch_prefix + ".running_var")
            if any(x is None for x in (g, b, m, v)):
                missing.append(torch_prefix + " (bn stats)")
                continue
            scale, bias = _fold_bn(g, b, m, v)
            if scale.shape != leaf.shape:
                missing.append(f"{torch_prefix} (bn shape {scale.shape})")
                continue
            set_in(mutable, names, scale if leaf_name == "scale" else bias)
            loaded.append(f"{torch_prefix}.{leaf_name}")

    if verbose:
        print(
            f"load_torch_backbone: {len(loaded)} tensors loaded, "
            f"{len(set(missing))} missing"
        )
        for k in sorted(set(missing))[:20]:
            print(f"  missing: {k}")
    if not loaded:
        raise ValueError(
            f"no tensors matched the checkpoint layout of {checkpoint_fp}; "
            f"sample torch keys: {sorted(sd)[:5]}"
        )

    out = dict(params)
    out_params = dict(params["params"])
    out_params["backbone"] = mutable
    out["params"] = out_params
    return out
