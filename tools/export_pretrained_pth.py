"""Export a self-trained backbone as a DenseCL-layout torch checkpoint.

VERDICT r3 item 5: the frozen-pretrained path (reference
fgn_r50_c4_densecl.py:4-41 → load via main.py + torch; res4 dropped,
backbone frozen) had never executed because no DenseCL .pth exists in
this image. This tool INVERTS models/convert.py::load_torch_backbone: a
stage-1 orbax checkpoint of the densecl-arch model (frozen_bn backbone)
becomes a ``backbone.``-prefixed torch state_dict that the converter
maps back with zero misses — a faithful stand-in for the real DenseCL
file, letting the whole pretrained→frozen pipeline run end-to-end.

FrozenAffine (scale, bias) pairs are emitted as BatchNorms with
running_mean = 0 and running_var = 1 − eps, so the converter's BN fold
(γ/√(var+eps), β − mean·scale) reproduces scale/bias EXACTLY.

    python tools/export_pretrained_pth.py <work_dir> <out.pth>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BN_EPS = 1e-5


def backbone_to_state_dict(backbone_params) -> dict:
    """Nested flax backbone param dict → torch-layout numpy state_dict
    (no torch dependency; caller wraps values in tensors)."""
    from fgn_tpu.models.convert import _map_path

    sd = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
            return
        leaf_name = path[-1]
        prefix = "backbone." + _map_path(path)
        arr = np.asarray(node)
        if leaf_name == "kernel":
            # (kh, kw, I, O) -> (O, I, kh, kw)
            sd[prefix + ".weight"] = np.ascontiguousarray(
                arr.transpose(3, 2, 0, 1)
            ).astype(np.float32)
        elif leaf_name == "scale":
            sd[prefix + ".weight"] = arr.astype(np.float32)
            sd[prefix + ".running_mean"] = np.zeros_like(arr, np.float32)
            sd[prefix + ".running_var"] = np.full_like(
                arr, 1.0 - BN_EPS, np.float32
            )
        elif leaf_name == "bias":
            sd[prefix + ".bias"] = arr.astype(np.float32)
        else:  # pragma: no cover — GN backbones are not exportable as BN
            raise ValueError(
                f"unexpected backbone leaf {leaf_name} at {path} — export "
                "requires a frozen_bn-arch checkpoint (scale/bias affines)"
            )

    walk(backbone_params, ())
    return sd


def main(work_dir: str, out_fp: str):
    import torch

    from fgn_tpu.train.checkpoints import CheckpointManager

    ckpt = CheckpointManager(work_dir)
    result = ckpt.restore()
    if result is None:
        raise SystemExit(f"no checkpoint found in {work_dir}")
    step, restored = result
    backbone = restored["params"]["params"]["backbone"]
    sd = backbone_to_state_dict(backbone)
    torch.save(
        {"state_dict": {k: torch.from_numpy(v) for k, v in sd.items()}},
        out_fp,
    )
    print(
        f"exported {len(sd)} tensors from step {step} of {work_dir} "
        f"-> {out_fp}"
    )
    ckpt.close()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
