"""Episodic evaluation driver.

Rebuild of the reference's OptEvalHook + FGN.simple_test result plumbing
(subprojects/sp02_omniiseg_fgn_mmdet/main.py:259-345, fgn.py:188-303):

  * jitted inference producing fixed-size detections;
  * full-image masks pasted on HOST from the fetched mask logits (the
    device-paste + packed-mask fetch cost ~0.84 s/batch of tunnel
    time; the logits are ~40× smaller and only valid detections need
    pasting) — the device paste kernels below remain for callers that
    want masks on device;
  * per-episode result dicts (same keys as the reference) flushed to
    pickle chunks of ``chunk_size``;
  * FSISEGEval over both bbox and segm, metric tags in the reference's
    TB scheme ``{ds}_{subset}_FT_{mode}/{metric}_{cats}[_{scenario}]``.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fgn_tpu.data import rle as RLE
from fgn_tpu.data.batching import EpisodeLoader
from fgn_tpu.data.fsisegeval import FSISEGEval
from fgn_tpu.ops.mask_paste import paste_masks, paste_masks_np
from fgn_tpu.ops.boxes import xyxy_to_yxyx
from fgn_tpu.train.train_step import unpack_eval_out


def _sigmoid_np(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))
from fgn_tpu.utils.io import create_empty_dir_unsafe, write_pkl_unsafe


@partial(jax.jit, static_argnums=(2, 3, 4))
def _paste_batch(mask_logits, boxes, H: int, W: int, thr: float):
    """(B, D, m, m) logits + (B, D, 4) XYXY → (B, D, H, W) bool."""
    B, D = mask_logits.shape[:2]
    probs = jax.nn.sigmoid(mask_logits.reshape(B * D, *mask_logits.shape[2:]))
    out = paste_masks(probs, boxes.reshape(B * D, 4), H, W, threshold=thr)
    return out.reshape(B, D, H, W)


@partial(jax.jit, static_argnums=(2, 3, 4))
def _paste_batch_packed(mask_logits, boxes, H: int, W: int, thr: float):
    """Like _paste_batch but bit-packed along W — full-image masks are
    the dominant device→host transfer (B·D·H·W bools); packing cuts the
    tunnel traffic 8×. Unpack with np.unpackbits(…, count=W)."""
    out = _paste_batch(mask_logits, boxes, H, W, thr)
    return jnp.packbits(out, axis=-1)


class Evaluator:
    def __init__(
        self,
        model,
        ds,
        batch_size: int,
        eval_step,
        work_dir: str,
        max_gt: int = 30,
        mask_thr: float = 0.5,
        chunk_size: int = 1000,
        pad_hw=None,
        tag: Optional[str] = None,
        n_plots: int = 5,
        cache_episodes: bool = True,
    ):
        self.model = model
        self.ds = ds
        self.batch_size = batch_size
        self.eval_step = eval_step
        self.work_dir = work_dir
        self.max_gt = max_gt
        self.mask_thr = mask_thr
        self.chunk_size = chunk_size
        self.pad_hw = pad_hw
        self.n_plots = n_plots
        # Collated eval batches are reused across eval passes: episode
        # construction is ~half the eval wall time on this single-core
        # host. Deviation from the reference (which re-samples supports
        # every pass): supports are FIXED after the first pass, which
        # also removes support-sampling variance from the epoch curves.
        self.cache_episodes = cache_episodes
        self._episode_cache = None
        # gt-mask RLE per cached (meta, sample): the gt encode is pure
        # per-episode host work repeated identically on every cached
        # eval pass. Keyed by id(meta) — only safe while the metas are
        # kept alive by _episode_cache, so guarded by _reuse_gt_rle.
        self._gt_rle: Dict = {}
        self._reuse_gt_rle = False
        # Reference tag scheme (main.py:323-333).
        self.tag = tag or (
            f"{ds.sampling_origin_ds}_{ds.sampling_origin_ds_subset}"
            f"_FT_{ds.finetune}"
        )
        self.cats_suffix = (
            f"{ds.sampling_cats.rstrip('_')}_{ds.sampling_scenario}"
        )

    def run_fresh(self, params) -> Dict[str, float]:
        """One pass with freshly sampled episodes/supports, leaving the
        cache untouched. The reference protocol re-samples supports on
        EVERY eval pass; with ``cache_episodes`` the epoch curves use a
        single fixed draw (a documented speed tradeoff), so the final
        reported number comes from this fresh-draw pass instead."""
        cache, self._episode_cache = self._episode_cache, None
        keep, self.cache_episodes = self.cache_episodes, False
        try:
            return self.run(params)
        finally:
            self.cache_episodes, self._episode_cache = keep, cache

    def run(self, params) -> Dict[str, float]:
        caching = False
        if self._episode_cache is not None:
            loader = self._episode_cache
        else:
            loader = EpisodeLoader(
                self.ds, self.batch_size, max_gt=self.max_gt,
                pad_hw=self.pad_hw, drop_last=False, keep_gt_masks=True,
            )
            # Stream-and-cache (round 5): the cache used to be built
            # with list(loader) BEFORE any device work — a pure serial
            # episode-construction phase (~10.5 ms/img on this 1-core
            # host) followed by a fetch-bound device loop. Accumulating
            # batches as the loop consumes the loader's prefetch thread
            # overlaps construction with device compute + fetch waits
            # (the GIL is released during both), merging the two phases.
            caching = self.cache_episodes
            if caching:
                accum: List = []
                self._gt_rle = {}
        # First (caching) pass may already populate the gt-RLE cache:
        # the metas it keys on are kept alive by the accumulated cache.
        self._reuse_gt_rle = caching or loader is self._episode_cache
        # Per-evaluator subdir: multiple eval hooks in one run must not
        # clobber each other's chunks between metric passes.
        results_dir = os.path.join(
            self.work_dir, "results_pkl",
            f"{self.tag.replace('/', '_')}_{self.cats_suffix}",
        )
        create_empty_dir_unsafe(results_dir)

        results: List[dict] = []
        n_flushed = 0

        def flush():
            nonlocal results, n_flushed
            if results:
                write_pkl_unsafe(
                    os.path.join(results_dir, f"chunk_{n_flushed:05}.pkl"),
                    results,
                )
                n_flushed += 1
                results = []

        t_host = t_fetch = 0.0
        t_wall = time.monotonic()

        def process(pending):
            """Host side of one batch (runs while the device computes
            the NEXT batch — the dispatch below is async). Full-image
            masks are pasted HERE, on the host, from the (tiny) mask
            logits: fetching device-pasted masks cost ~0.84 s/batch of
            tunnel time (11.5 MB packed at ~15 MB/s device→host), while
            only the few valid detections ever need pasting."""
            nonlocal t_host, t_fetch
            out_dev, batch, meta = pending
            t0 = time.monotonic()
            out = jax.tree_util.tree_map(np.asarray, out_dev)
            out = unpack_eval_out(out)
            t_fetch += time.monotonic() - t0
            t0 = time.monotonic()
            H, W = batch.qry_img.shape[1:3]
            B = meta.n_real if meta.n_real > 0 else batch.qry_img.shape[0]
            for b in range(B):
                valid = out["dt_valid"][b]
                dt_boxes = out["dt_boxes"][b][valid]
                h, w = batch.img_hw[b]
                probs = _sigmoid_np(
                    out["dt_mask_logits"][b][valid].astype(np.float32)
                )
                # Fused native paste+threshold+RLE at the REAL image
                # size (identical to padded-canvas paste + crop: boxes
                # only ever cover image pixels); falls back to the
                # two-step numpy paste when the native lib is absent.
                dt_rle = RLE.paste_encode_results(
                    probs, dt_boxes, int(h), int(w), self.mask_thr
                )
                if dt_rle is None:
                    masks_b = paste_masks_np(
                        probs, dt_boxes, int(H), int(W), self.mask_thr
                    )
                    dt_rle = RLE.encode_mask_results(
                        masks_b[:, : int(h), : int(w)]
                    )
                gt_key = (id(meta), b)
                gt_rle = (
                    self._gt_rle.get(gt_key) if self._reuse_gt_rle else None
                )
                if gt_rle is None:
                    gt_rle = RLE.encode_mask_results(meta.qry_isegmaps[b])
                    if self._reuse_gt_rle:
                        self._gt_rle[gt_key] = gt_rle
                res = {
                    "idx": int(meta.idx[b]),
                    "qry_child_idx": int(meta.qry_child_idx[b]),
                    "cats_ids_to_sample_real": meta.cats_ids_to_sample_real[b],
                    "spp_insts_ids": meta.spp_insts_ids[b],
                    "qry_img_shape": np.array([h, w, 3], np.int32),
                    "qry_bboxes": meta.qry_bboxes_yxyx[b],
                    "qry_cat_ids": meta.qry_cat_ids[b],
                    "qry_cat_ids_real": meta.qry_cat_ids_real[b],
                    "qry_isegmaps_rle": gt_rle,
                    "dt_scores": out["dt_scores"][b][valid],
                    "dt_bboxes": xyxy_to_yxyx(dt_boxes),
                    "dt_cat_ids": out["dt_cats"][b][valid],
                    "dt_isegmaps_rle": dt_rle,
                }
                results.append(res)
                if len(results) >= self.chunk_size:
                    flush()
            t_host += time.monotonic() - t0

        # Double-buffered loop: batch i's host work overlaps batch
        # i+1's device work (eval_step dispatch is async).
        pending = None
        n_batches = 0
        dbg = {"step": 0.0, "fetch": 0.0}
        for batch, meta in loader:
            if caching:
                accum.append((batch, meta))
            sync = 1 <= n_batches <= 3  # skip batch 0 (compile)
            t0 = time.monotonic()
            out = self.eval_step(params, batch)
            if sync:
                jax.block_until_ready(out)
                dbg["step"] += time.monotonic() - t0
                t0 = time.monotonic()
                jax.tree_util.tree_map(np.asarray, out)
                dbg["fetch"] += time.monotonic() - t0
            n_batches += 1
            # Start device→host copies NOW: they overlap the next
            # batch's device compute, and the later np.asarray finds the
            # data already on host (the per-leaf synchronous fetch paid
            # one ~44 ms tunnel RTT per output leaf otherwise).
            try:
                for leaf in jax.tree_util.tree_leaves(out):
                    leaf.copy_to_host_async()
            except Exception:
                pass
            if pending is not None:
                process(pending)
            pending = (out, batch, meta)
        if pending is not None:
            process(pending)
        flush()
        if caching:
            self._episode_cache = accum
        print(
            f"eval [{self.tag}]: {n_batches} batches in "
            f"{time.monotonic() - t_wall:.1f}s "
            f"(device-fetch {t_fetch:.1f}s, host {t_host:.1f}s; "
            f"sync x3: step {dbg['step']:.2f}s fetch {dbg['fetch']:.2f}s)"
        )

        # Render a few episodes (gt | detections), like the reference's
        # 5-episode replot during evaluate (base_fst.py:1547-1577).
        if self.n_plots:
            try:
                first_chunk = sorted(os.listdir(results_dir))[0]
                from fgn_tpu.utils.io import read_pkl

                sample_results = read_pkl(
                    os.path.join(results_dir, first_chunk)
                )[: self.n_plots]
                vis_dir = os.path.join(self.work_dir, "eval_vis")
                for i, res in enumerate(sample_results):
                    self.ds.visualize_result(res, vis_dir, f"Result {i:03}.png")
            except Exception:
                pass  # rendering is best-effort

        metrics: Dict[str, float] = {}
        for iou_type, short in (("bbox", "bbox"), ("segm", "isegm")):
            ev = FSISEGEval(
                results_pkl_dir_fp=results_dir,
                n_ways=self.ds.n_ways,
                iou_type=iou_type,
            )
            out_m = ev.run()
            metrics[f"{self.tag}/{short}_mAP_{self.cats_suffix}"] = out_m["mAP"]
            metrics[f"{self.tag}/{short}_mAR_{self.cats_suffix}"] = out_m["mAR"]
        return metrics
