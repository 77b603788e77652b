"""Category-order-shuffle evaluation protocol.

The reference validates that episodic evaluation is invariant to the
order of the N sampled categories by re-running eval with shuffled
category order (reference README.md:122-139, relying on the
deterministic replay ids stored in each result). This tool:

  1. evaluates normally, storing per-episode replay ids;
  2. replays the SAME episodes with a permuted category order (support
     blocks permuted accordingly, episode cat ids remapped);
  3. re-evaluates and reports both metric sets — they should agree to
     within NMS tie-breaking noise.

    python tools/eval_cat_shuffle.py <config.py> [n_episodes]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from fgn_tpu.config import Config
from fgn_tpu.data.batching import collate_episodes
from fgn_tpu.data.fsisegeval import FSISEGEval
from fgn_tpu.data import rle as RLE
from fgn_tpu.data.fst_bindings import init_ds_class_by_config
from fgn_tpu.main import model_config_from_cfg, _init_params
from fgn_tpu.models.fgn import FGN
from fgn_tpu.ops.boxes import xyxy_to_yxyx
from fgn_tpu.train.checkpoints import CheckpointManager
from fgn_tpu.train.evaluator import _paste_batch


def _episode_to_result(ds, sample, out, b, h, w):
    valid = out["dt_valid"][b]
    return {
        "qry_img_shape": np.array([h, w, 3]),
        "qry_bboxes": sample["qry_bboxes"],
        "qry_cat_ids": sample["qry_cat_ids"],
        "qry_isegmaps_rle": RLE.encode_mask_results(sample["qry_isegmaps"]),
        "dt_scores": out["dt_scores"][b][valid],
        "dt_bboxes": xyxy_to_yxyx(out["dt_boxes"][b][valid]),
        "dt_cat_ids": out["dt_cats"][b][valid],
        "dt_isegmaps_rle": None,  # filled by caller
    }


def run(cfg_fp: str, n_episodes: int = 24, seed: int = 0):
    cfg = Config.from_file(cfg_fp)
    mcfg = model_config_from_cfg(cfg)
    model = FGN(cfg=mcfg)
    ds = init_ds_class_by_config(cfg.eval_ds_cfg0)
    max_gt = int(cfg.get("max_gt", 30))

    params, _ = _init_params(model, ds, 2, max_gt)
    restored = CheckpointManager(str(cfg.work_dir)).restore()
    assert restored, "no checkpoint"
    params = restored[1]["params"]
    eval_step = jax.jit(lambda p, b: model.apply(p, b, method=FGN.test_forward))

    import random

    random.seed(seed)
    episodes = [ds[i] for i in range(min(n_episodes, len(ds)))]
    rng = np.random.RandomState(seed)

    def evaluate(pass_episodes):
        results = []
        B = 4
        for i in range(0, len(pass_episodes), B):
            chunk = pass_episodes[i : i + B]
            batch, meta = collate_episodes(
                chunk, ds.mean, ds.std, max_gt=max_gt, keep_gt_masks=True,
                pad_to_batch=B,
            )
            out = jax.tree_util.tree_map(np.asarray, eval_step(params, batch))
            H, W = batch.qry_img.shape[1:3]
            masks = np.asarray(
                _paste_batch(
                    jax.numpy.asarray(out["dt_mask_logits"]),
                    jax.numpy.asarray(out["dt_boxes"]),
                    int(H), int(W), mcfg.mask_thr,
                )
            )
            for b, s in enumerate(chunk):
                res = _episode_to_result(ds, s, out, b, H, W)
                res["dt_isegmaps_rle"] = RLE.encode_mask_results(
                    masks[b][out["dt_valid"][b]]
                )
                results.append(res)
        metrics = {}
        for iou_type in ("bbox", "segm"):
            ev = FSISEGEval(results=results, n_ways=ds.n_ways, iou_type=iou_type)
            m = ev.run()
            metrics[f"{iou_type}_mAP"] = m["mAP"]
            metrics[f"{iou_type}_mAR"] = m["mAR"]
        return metrics

    base = evaluate(episodes)
    print("normal order:   ", {k: round(v, 4) for k, v in base.items()})

    # Replay with permuted category order.
    shuffled = []
    for s in episodes:
        N, K = ds.n_ways, ds.k_shots
        perm = rng.permutation(N)
        cats_perm = s["cats_ids_to_sample_real"][perm]
        spp_perm = s["spp_insts_ids"].reshape(N, K)[perm].reshape(-1)
        replay = ds.__getitem__(
            int(s["idx"]),
            _qry_child_idx=int(s["qry_child_idx"]),
            _cats_ids_to_sample_real=cats_perm,
            _spp_insts_ids=spp_perm,
        )
        shuffled.append(replay)
    shuf = evaluate(shuffled)
    print("shuffled order: ", {k: round(v, 4) for k, v in shuf.items()})
    for k in base:
        d = abs(base[k] - shuf[k])
        flag = "OK" if d < 0.05 else "MISMATCH"
        print(f"  {k}: Δ={d:.4f} {flag}")
    return base, shuf


if __name__ == "__main__":
    run(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 24)
