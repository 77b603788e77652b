"""Detector diagnostics on a trained checkpoint.

Reports the stage-wise health the reference tracked via its rpn_log_*
TB scalars (SURVEY.md §5.5): proposal recall at IoU 0.5, detection
score distribution, per-stage counts — and dumps detection/gt renders.

    python tools/diagnose_detector.py fgn_tpu/configs/fgn_train_mnistiseg_n1k1.py [n_batches]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from fgn_tpu.config import Config
from fgn_tpu.data.batching import EpisodeLoader
from fgn_tpu.data.fst_bindings import init_ds_class_by_config
from fgn_tpu.main import model_config_from_cfg, _init_params
from fgn_tpu.models.fgn import FGN
from fgn_tpu.ops.boxes import box_iou_np, yxyx_to_xyxy
from fgn_tpu.train.checkpoints import CheckpointManager


def main(cfg_fp: str, n_batches: int = 8):
    cfg = Config.from_file(cfg_fp)
    mcfg = model_config_from_cfg(cfg)
    model = FGN(cfg=mcfg)
    eval_ds = init_ds_class_by_config(cfg.eval_ds_cfg0)

    params, _ = _init_params(model, eval_ds, 2, int(cfg.get("max_gt", 30)))
    mngr = CheckpointManager(str(cfg.work_dir))
    restored = mngr.restore()
    assert restored is not None, "no checkpoint found"
    step, state = restored
    params = state["params"]
    print(f"loaded checkpoint step {step}")

    eval_step = jax.jit(lambda p, b: model.apply(p, b, method=FGN.test_forward))
    loader = EpisodeLoader(eval_ds, 2, max_gt=int(cfg.get("max_gt", 30)))

    prop_hits = prop_total = 0
    det_hits = det_total = 0
    det_right_cls = 0
    n_dets, scores_all = [], []
    for bi, (batch, meta) in enumerate(loader):
        if bi >= n_batches:
            break
        out = jax.tree_util.tree_map(np.asarray, eval_step(params, batch))
        B = batch.qry_img.shape[0]
        for b in range(B):
            gt = yxyx_to_xyxy(np.asarray(meta.qry_bboxes_yxyx[b]))
            gt_cats = np.asarray(meta.qry_cat_ids[b])
            if not len(gt):
                continue
            props = out["proposals"][b][np.asarray(out["prop_valid"][b])]
            if len(props):
                ious = box_iou_np(gt, props)
                prop_hits += int((ious.max(axis=1) > 0.5).sum())
            prop_total += len(gt)

            dv = np.asarray(out["dt_valid"][b])
            dets = out["dt_boxes"][b][dv]
            dcls = out["dt_cats"][b][dv]
            dscore = out["dt_scores"][b][dv]
            n_dets.append(len(dets))
            scores_all.extend(dscore.tolist())
            if len(dets):
                ious = box_iou_np(gt, dets)
                best = ious.argmax(axis=1)
                hit = ious.max(axis=1) > 0.5
                det_hits += int(hit.sum())
                det_right_cls += int(
                    (hit & (dcls[best] == gt_cats)).sum()
                )
            det_total += len(gt)

    print(f"proposal recall@0.5: {prop_hits}/{prop_total} = {prop_hits / max(prop_total,1):.3f}")
    print(f"detection recall@0.5 (any class): {det_hits}/{det_total} = {det_hits / max(det_total,1):.3f}")
    print(f"detection recall@0.5 (right class): {det_right_cls}/{det_total} = {det_right_cls / max(det_total,1):.3f}")
    print(f"dets/img: mean {np.mean(n_dets):.1f}; score dist p50/p90/max: "
          f"{np.percentile(scores_all, 50):.3f}/{np.percentile(scores_all, 90):.3f}/{np.max(scores_all):.3f}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 8)
