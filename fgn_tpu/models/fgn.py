"""FGN — Fully Guided Network for few-shot instance segmentation, in JAX.

TPU-native rebuild of the reference detector
(subprojects/sp02_omniiseg_fgn_mmdet/{fgn,fgn_ag_rpn_head,fgn_roi_head}.py)
as ONE flax module with two jittable entry points:

  * ``train_forward(batch, rng) -> losses`` — everything the reference
    splits across FGN.forward_train, the mmdet assigner/sampler stack and
    the per-head loss calls (fgn.py:125-185, fgn_roi_head.py:451-529);
  * ``test_forward(batch) -> detections`` — the reference's
    simple_test path (fgn.py:188-303, fgn_roi_head.py:531-719) to a
    FIXED number of detections per image.

Architecture (semantics matched to the reference, layout is NHWC and all
shapes static):

  * backbone: ResNet-50-C4, stride 16, 1024 ch (models/resnet.py);
  * AG-RPN (fgn_ag_rpn_head.py:26-113): support feature vectors (mean
    over K shots and space) channel-gate the query map per way; one
    shared RPN conv head scores all N gated maps; training losses are
    computed per (image, way) against class-filtered gt and divided by
    N; at merge time each anchor position keeps the way with the top
    objectness (argmax merge);
  * relation-guided box head (fgn_roi_head.py:253-326): RoI features
    (RoIAlign 7×7 → shared res5) are compared against per-class support
    maps. The reference concatenates (ROI, spp) to 2048 ch and applies a
    1×1 conv; conv distributes over concat, so here it is two 1×1 convs
    (``rel_conv_roi`` + ``rel_conv_spp``) whose outputs add — the support
    half is computed once per class instead of once per (ROI, class).
    Per (ROI, way) (bg, fg) logits merge into an (N+1)-way score by
    fg-argmax (count_modified_cls_bbox, fgn_roi_head.py:302-326); bbox
    regression is per way;
  * class-agnostic mask head with support gating
    (fgn_roi_head.py:360-382,512-522,707-718): RoI features multiplied by
    the detected/assigned class's mask-pooled support vector, 4 convs +
    deconv → 14×14 logits, evaluated at label 0 (single mask channel).

Conventions: boxes are XYXY inside the model (the YXYX→XYXY flip happens
at the batch boundary, data/batching.py — reference fgn.py:101-106).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from fgn_tpu.models.losses import (
    accuracy_balanced,
    sigmoid_bce,
    smooth_l1,
    softmax_ce,
)
from fgn_tpu.models.resnet import ResNetC4, SharedRes5
from fgn_tpu.ops.anchors import anchor_inside_flags, generate_anchors
from fgn_tpu.ops.assign import max_iou_assign
from fgn_tpu.ops.boxes import delta_decode, delta_encode
from fgn_tpu.ops.nms import batched_nms, nms_padded
from fgn_tpu.ops.roi_align import roi_align
from fgn_tpu.ops.sample import random_sample_pos_neg


def _mask_to_float(m):
    """Mask inputs arrive float (0..1) or uint8 (0..255, the compact
    host->device wire format — batching.py quantizes to cut tunnel
    traffic); normalize to float 0..1 on device."""
    f = m.astype(jnp.float32)
    return f / 255.0 if m.dtype == jnp.uint8 else f


@dataclasses.dataclass(frozen=True)
class FGNConfig:
    """Model + train/test hyperparameters.

    Values mirror the reference config (fgn_r50_c4_densecl.py) with two
    documented deviations: ``rpn_*_nms_pre`` is a static top-k (4096 —
    covers the ~13.5k anchors of 480px inputs; raise for COCO-scale
    800×1333 maps, see fgn_tpu/configs/fgn_train_coco2voc.py), and
    RoIAlign uses static sampling_ratio 2 instead of adaptive 0.
    """

    n_ways: int = 3
    k_shots: int = 3
    guidance: bool = True  # False = plain Faster/Mask R-CNN (sp01 mode)
    backbone_norm: str = "gn"
    # res5 norm ablation (reference GN-vs-BN table, MNISTISEG_N3_K3
    # notebook: GN 0.965 vs BN 0.919). "bn" here is the frozen-stat
    # affine from make_norm — the mmdet norm_eval analog.
    res5_norm: str = "gn"
    backbone_frozen: bool = False
    deep_stem: bool = False
    avg_down: bool = False
    feat_channels: int = 1024
    stride: int = 16
    anchor_scales: Tuple[float, ...] = (2, 4, 8, 16, 32)
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    # train_cfg (reference fgn_r50_c4_densecl.py:131-173)
    rpn_pos_iou: float = 0.5
    rpn_neg_iou: float = 0.3
    rpn_min_pos_iou: float = 0.3
    rpn_num_samples: int = 64
    rpn_pos_fraction: float = 0.5
    rpn_train_nms_pre: int = 4096
    rpn_train_max_per_img: int = 2000
    rpn_nms_iou: float = 0.7
    rpn_min_bbox_size: float = 0.0
    rcnn_pos_iou: float = 0.5
    rcnn_neg_iou: float = 0.5
    rcnn_min_pos_iou: float = 0.5
    rcnn_num_samples: int = 128
    rcnn_pos_fraction: float = 0.25
    mask_size: int = 14
    # test_cfg (reference :174-186)
    rpn_test_nms_pre: int = 4096
    rpn_test_max_per_img: int = 300
    rcnn_score_thr: float = 0.05
    rcnn_nms_iou: float = 0.5
    rcnn_max_per_img: int = 100
    mask_thr: float = 0.5
    rcnn_bbox_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    compute_dtype: str = "float32"
    # Rematerialization (jax.checkpoint via nn.remat) over the named
    # blocks — comma-set of {"backbone", "res5", "relation", "mask"},
    # "" = off. The train step is BANDWIDTH-bound at 89% of its
    # bytes-roofline (reports/perf_profile.md): recomputing activations
    # in the backward pass trades idle MXU flops for HBM traffic, and
    # shrinks peak HBM (the relation head materializes a
    # (B,R,N,7,7,1024) tensor — the N3K1 b10 crash site). Numerically
    # identical to remat off (same ops, same order — proven in
    # tests/test_remat.py); no effect on test_forward graphs.
    remat: str = ""
    # None = auto: Pallas RoIAlign on TPU, gather formulation elsewhere.
    use_pallas_roi_align: Optional[bool] = None
    # None = auto: fused Pallas NMS keep-mask kernel on TPU (exact
    # parity with the blocked XLA sweep, tests/test_nms_pallas.py),
    # XLA sweep elsewhere.
    use_pallas_nms: Optional[bool] = None

    @property
    def num_anchors(self) -> int:
        return len(self.anchor_scales) * len(self.anchor_ratios)


def _compute_dtype(cfg: FGNConfig):
    return jnp.dtype(cfg.compute_dtype)


def _on_tpu() -> bool:
    dd = jax.config.jax_default_device
    if dd is not None:
        return getattr(dd, "platform", "") in ("tpu", "axon")
    return jax.default_backend() in ("tpu", "axon")


def _auto_pallas(cfg: FGNConfig) -> bool:
    if cfg.use_pallas_roi_align is not None:
        return cfg.use_pallas_roi_align
    return _on_tpu()


def _nms_alive_fn(cfg: FGNConfig):
    """alive_fn for nms_padded/batched_nms: the fused Pallas keep-mask
    kernel (opt-in via use_pallas_nms until idle-chip timing lands;
    None → blocked XLA sweep)."""
    if not cfg.use_pallas_nms:
        return None
    from fgn_tpu.ops.nms_pallas import greedy_alive_pallas

    return greedy_alive_pallas


class FGN(nn.Module):
    cfg: FGNConfig

    def setup(self):
        c = self.cfg
        dt = _compute_dtype(c)
        A = c.num_anchors
        remats = set(filter(None, c.remat.split(",")))
        # nn.remat(cls) keeps the submodule's param paths — checkpoints
        # are interchangeable between remat on/off.
        bb_cls = ResNetC4 if "backbone" not in remats else nn.remat(ResNetC4)
        r5_cls = SharedRes5 if "res5" not in remats else nn.remat(SharedRes5)
        self.backbone = bb_cls(
            norm=c.backbone_norm, frozen=c.backbone_frozen,
            deep_stem=c.deep_stem, avg_down=c.avg_down, dtype=dt,
        )
        # AG-RPN: one shared conv head over all gated maps
        # (reference AGRPNHead = RPNHead with num_convs=1, 1024 ch).
        self.rpn_conv = nn.Conv(c.feat_channels, (3, 3), dtype=dt)
        self.rpn_cls = nn.Conv(A, (1, 1), dtype=dt)
        self.rpn_reg = nn.Conv(A * 4, (1, 1), dtype=dt)
        # RoI tower
        self.shared5 = r5_cls(norm=c.res5_norm, dtype=dt)
        self.rel_conv_roi = nn.Conv(1024, (1, 1), dtype=dt)
        # bias only on the roi half: conv(concat) has a single bias
        self.rel_conv_spp = nn.Conv(1024, (1, 1), use_bias=False, dtype=dt)
        self.rel_gn = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=dt)
        # FGNBBoxHead: with_avg_pool → GAP then linear (bg, fg) / 4 deltas
        self.fc_cls = nn.Dense(2, dtype=dt)
        self.fc_reg = nn.Dense(4, dtype=dt)
        # FCNMaskHead: 4 convs 1024→256, deconv ×2, 1-ch logits
        self.mask_convs_0 = nn.Conv(256, (3, 3), dtype=dt)
        self.mask_convs_1 = nn.Conv(256, (3, 3), dtype=dt)
        self.mask_convs_2 = nn.Conv(256, (3, 3), dtype=dt)
        self.mask_convs_3 = nn.Conv(256, (3, 3), dtype=dt)
        self.mask_deconv = nn.ConvTranspose(256, (2, 2), strides=(2, 2), dtype=dt)
        self.mask_logits = nn.Conv(1, (1, 1), dtype=dt)

    # -- shared plumbing ----------------------------------------------------

    def _normalize(self, img, batch):
        dt = _compute_dtype(self.cfg)
        x = img.astype(jnp.float32)
        x = (x - batch.norm_mean.astype(jnp.float32)) / batch.norm_std.astype(
            jnp.float32
        )
        return x.astype(dt)

    def _extract(self, batch):
        """→ qry_fmap (B,h,w,C); spp_fmaps (B,N,K,hs,ws,C) or None."""
        c = self.cfg
        qry = self.backbone(self._normalize(batch.qry_img, batch))
        if not c.guidance:
            return qry, None
        B, NK, S1, S2, _ = batch.spp_imgs.shape
        spp = self.backbone(
            self._normalize(batch.spp_imgs.reshape(B * NK, S1, S2, 3), batch)
        )
        hs, ws, C = spp.shape[1:]
        return qry, spp.reshape(B, c.n_ways, c.k_shots, hs, ws, C)

    def _rpn_forward(self, qry_fmap, spp_fmaps):
        """AG-RPN conv pass → cls (B,N,h,w,A), reg (B,N,h,w,A,4).

        Channel attention per way (fgn_ag_rpn_head.py:37-46); with
        guidance off the query map goes in unmodified (single way)."""
        c = self.cfg
        B, h, w, C = qry_fmap.shape
        A = c.num_anchors
        if c.guidance:
            vecs = spp_fmaps.mean(axis=(2, 3, 4))  # (B, N, C)
            mod = qry_fmap[:, None] * vecs[:, :, None, None, :]
            n = c.n_ways
        else:
            assert c.n_ways == 1, "guidance=False is the single-way mode"
            mod = qry_fmap[:, None]
            n = 1
        x = mod.reshape(B * n, h, w, C)
        x = nn.relu(self.rpn_conv(x))
        cls = self.rpn_cls(x).reshape(B, n, h, w, A)
        reg = self.rpn_reg(x).reshape(B, n, h, w, A, 4)
        return cls, reg

    @staticmethod
    def _merge_ways(cls, reg):
        """Per anchor position keep the way with the top objectness
        (fgn_ag_rpn_head.py:87-108). cls (B,N,h,w,A) → (B,h,w,A)."""
        # max == value at argmax, and a one-hot contraction replaces the
        # take_along_axis gather: TPU gathers run element-by-element on
        # the scalar core (1.3 ms/step here in the round-4 profile);
        # both forms are bit-exact (1.0/0.0 weights, adding zeros).
        merged_cls = jnp.max(cls, axis=1)
        top = jnp.argmax(cls, axis=1)  # (B, h, w, A)
        onehot = jax.nn.one_hot(top, cls.shape[1], axis=1, dtype=reg.dtype)
        merged_reg = jnp.einsum("bnhwa,bnhwac->bhwac", onehot, reg)
        return merged_cls, merged_reg

    def get_proposals(self, cls_score, bbox_pred, img_hw, nms_pre: int,
                      max_per_img: int):
        """Merged RPN maps → padded proposals.

        cls_score (B,h,w,A) logits, bbox_pred (B,h,w,A,4), img_hw (B,2).
        Returns (boxes (B,M,4) XYXY, scores (B,M), valid (B,M)).

        Degenerate decoded boxes (zero width/height after clipping — IoU
        0 with everything, so NMS cannot suppress them) are dropped
        before NMS, like mmdet's min_bbox_size filter
        (fgn_r50_c4_densecl.py:155,181)."""
        c = self.cfg
        B, h, w, A = cls_score.shape
        anchors = generate_anchors(
            h, w, c.stride, c.anchor_scales, c.anchor_ratios
        )  # (h*w*A, 4) — location-major, matching the conv layout
        M = anchors.shape[0]
        scores_all = jax.nn.sigmoid(
            cls_score.reshape(B, M).astype(jnp.float32)
        )
        deltas_all = bbox_pred.reshape(B, M, 4).astype(jnp.float32)
        k = min(nms_pre, M)

        def one(scores, deltas, hw):
            top_s, idx = jax.lax.top_k(scores, k)
            boxes = delta_decode(
                anchors[idx], deltas[idx], max_shape=(hw[0], hw[1])
            )
            ws = boxes[:, 2] - boxes[:, 0]
            hs = boxes[:, 3] - boxes[:, 1]
            valid = (ws > c.rpn_min_bbox_size) & (hs > c.rpn_min_bbox_size)
            out_boxes, out_scores, _, out_valid = nms_padded(
                boxes, top_s, valid, c.rpn_nms_iou, max_per_img,
                alive_fn=_nms_alive_fn(c),
            )
            return out_boxes, out_scores, out_valid

        return jax.vmap(one)(scores_all, deltas_all, img_hw)

    # -- support pooling ------------------------------------------------------

    def _count_spp(self, spp_fmaps, spp_boxes, spp_masks):
        """Support maps + mask-pooled vectors (fgn_roi_head.py:419-449).

        spp_fmaps (B,N,K,hs,ws,C); spp_boxes (B,NK,4) XYXY in crop px;
        spp_masks (B,NK,S,S). → (spp_maps (B,N,7,7,C),
        spp_vecs_mask (B,N,C))."""
        c = self.cfg
        B, N, K, hs, ws, C = spp_fmaps.shape
        NK = N * K
        S = spp_masks.shape[-1]
        rois = spp_boxes.reshape(B * NK, 1, 4).astype(jnp.float32)
        masks_aligned = roi_align(
            _mask_to_float(spp_masks).reshape(B * NK, S, S, 1),
            rois, 7, spatial_scale=1.0,
        )  # (B*NK, 1, 7, 7, 1)
        fmaps_aligned = self._roi_align_fmap(
            spp_fmaps.reshape(B * NK, hs, ws, C), rois, 1.0 / c.stride
        )  # (B*NK, 1, 7, 7, C)
        feats = self.shared5(
            fmaps_aligned.reshape(B * NK, 7, 7, C)
        )  # (B*NK, 7, 7, C)
        feats = feats.reshape(B, N, K, 7, 7, C)
        spp_maps = feats.mean(axis=2)  # (B, N, 7, 7, C)
        weighted = feats * masks_aligned.reshape(B, N, K, 7, 7, 1).astype(
            feats.dtype
        )
        spp_vecs_mask = weighted.mean(axis=(2, 3, 4))  # (B, N, C)
        return spp_maps, spp_vecs_mask

    def _roi_align_fmap(self, fmap, rois, scale):
        """RoIAlign on backbone features: Pallas two-matmul kernel on TPU,
        gather formulation elsewhere (identical numerics)."""
        if _auto_pallas(self.cfg) and fmap.shape[-1] % 128 == 0:
            from fgn_tpu.ops.roi_align_pallas import roi_align_pallas

            # kernel takes the fmap in its native dtype (bf16 on TPU):
            # halves the fmap DMA, computes in f32 in-VMEM, stores
            # out in fmap.dtype (same single rounding the old
            # f32-out + astype pair performed)
            out = roi_align_pallas(fmap, rois, 7, spatial_scale=scale)
            return out.astype(fmap.dtype)
        return roi_align(fmap, rois, 7, spatial_scale=scale)

    def _bbox_feats(self, qry_fmap, rois):
        """(B,R,4) rois → (B,R,7,7,C) shared-res5 features."""
        c = self.cfg
        B, R = rois.shape[:2]
        C = qry_fmap.shape[-1]
        feats = self._roi_align_fmap(
            qry_fmap, rois.astype(jnp.float32), 1.0 / c.stride
        )  # (B, R, 7, 7, C)
        feats = self.shared5(feats.reshape(B * R, 7, 7, C))
        return feats.reshape(B, R, 7, 7, C)

    def _relation(self, bbox_feats, spp_maps):
        if "relation" in self.cfg.remat:
            # Remat the (B,R,N,7,7,1024) materialization: it is the
            # biggest live tensor of the backward pass (and the N3K1
            # b10 HBM crash site, reports/hbm_budget.md).
            return nn.remat(FGN._relation_impl)(self, bbox_feats, spp_maps)
        return self._relation_impl(bbox_feats, spp_maps)

    def _relation_impl(self, bbox_feats, spp_maps):
        """Relation head → (cls_final (B,R,N+1), reg (B,R,N,4)).

        Math-equivalent restructuring of concat→1×1conv (see module
        docstring); GN normalizes each (ROI, way) instance over
        (7, 7, channels/32) exactly like torch GroupNorm."""
        c = self.cfg
        B, R = bbox_feats.shape[:2]
        N = c.n_ways
        r_roi = self.rel_conv_roi(bbox_feats)  # (B, R, 7, 7, 1024)
        if c.guidance:
            r_spp = self.rel_conv_spp(spp_maps)  # (B, N, 7, 7, 1024)
            x = r_roi[:, :, None] + r_spp[:, None]  # (B, R, N, 7, 7, 1024)
        else:
            x = r_roi[:, :, None]
        x = self.rel_gn(x.reshape(B * R * N, 7, 7, 1024))
        x = nn.relu(x)
        pooled = x.mean(axis=(1, 2)).reshape(B, R, N, 1024)
        cls = self.fc_cls(pooled)  # (B, R, N, 2) = (bg, fg) per way
        reg = self.fc_reg(pooled)  # (B, R, N, 4)
        # fg-argmax merge (fgn_roi_head.py:302-326)
        fg = cls[..., 1]  # (B, R, N)
        top = jnp.argmax(fg, axis=-1)  # (B, R)
        onehot = jax.nn.one_hot(top, N, dtype=cls.dtype)  # (B, R, N)
        bg = jnp.sum(cls[..., 0] * onehot, axis=-1, keepdims=True)
        cls_final = jnp.concatenate([fg, bg], axis=-1)  # (B, R, N+1)
        return cls_final, reg

    def _mask_head(self, feats):
        if "mask" in self.cfg.remat:
            return nn.remat(FGN._mask_head_impl)(self, feats)
        return self._mask_head_impl(feats)

    def _mask_head_impl(self, feats):
        """(P, 7, 7, 1024) gated RoI feats → (P, 14, 14) logits."""
        x = feats
        for conv in (self.mask_convs_0, self.mask_convs_1,
                     self.mask_convs_2, self.mask_convs_3):
            x = nn.relu(conv(x))
        x = nn.relu(self.mask_deconv(x))
        return self.mask_logits(x)[..., 0]

    # -- training -------------------------------------------------------------

    def _rpn_loss(self, cls, reg, batch, rng):
        """Per-(image, way) anchor losses / N (fgn_ag_rpn_head.py:57-79).

        Note (documented deviation): the reference averages each way's
        loss by its own mmdet avg_factor then sums/N; here the sum over
        all (image, way) pairs is divided by the global sampled count,
        then /N — same scale, marginally different per-way weighting."""
        c = self.cfg
        B, N, h, w, A = cls.shape
        M = h * w * A
        anchors = generate_anchors(
            h, w, c.stride, c.anchor_scales, c.anchor_ratios
        )
        cls_flat = cls.reshape(B, N, M).astype(jnp.float32)
        reg_flat = reg.reshape(B, N, M, 4).astype(jnp.float32)
        keys = jax.random.split(rng, B * N).reshape(B, N, 2)

        def one(way_cls, way_reg, gt_boxes, gt_way_valid, hw, key):
            inside = anchor_inside_flags(anchors, hw[0], hw[1], 0)
            assign = max_iou_assign(
                anchors, gt_boxes, gt_way_valid,
                c.rpn_pos_iou, c.rpn_neg_iou, c.rpn_min_pos_iou,
                match_low_quality=True, box_valid=inside,
            )
            s = random_sample_pos_neg(
                key, assign.pos_mask, assign.neg_mask,
                c.rpn_num_samples, c.rpn_pos_fraction,
            )
            logits = way_cls[s.inds]
            labels = s.is_pos.astype(jnp.float32)
            lw = s.valid.astype(jnp.float32)
            gt_idx = jnp.clip(assign.assigned_gt_inds[s.inds] - 1, 0, None)
            targets = delta_encode(anchors[s.inds], gt_boxes[gt_idx])
            deltas = way_reg[s.inds]
            bw = (s.is_pos & s.valid).astype(jnp.float32)[:, None]
            n_samp = jnp.sum(lw)
            cls_sum = sigmoid_bce(logits, labels, lw, 1.0)
            box_sum = smooth_l1(deltas, targets, bw, 1.0)
            n_pos = jnp.sum((s.is_pos & s.valid).astype(jnp.int32))
            n_neg = jnp.sum((~s.is_pos & s.valid).astype(jnp.int32))
            n_inside = jnp.sum(inside.astype(jnp.int32))
            return cls_sum, box_sum, n_samp, n_pos, n_neg, n_inside

        def per_img(img_cls, img_reg, gt_boxes, gt_cats, gt_valid, hw, img_keys):
            def per_way(n, way_cls, way_reg, key):
                way_valid = gt_valid & (gt_cats == n)
                return one(way_cls, way_reg, gt_boxes, way_valid, hw, key)

            return jax.vmap(per_way)(
                jnp.arange(N), img_cls, img_reg, img_keys
            )

        cls_sum, box_sum, n_samp, n_pos, n_neg, n_inside = jax.vmap(
            lambda a, b, c_, d, e, f, g: per_img(a, b, c_, d, e, f, g)
        )(cls_flat, reg_flat, batch.qry_boxes, batch.qry_cats,
          batch.qry_valid, batch.img_hw, keys)

        total = jnp.maximum(jnp.sum(n_samp), 1.0)
        losses = {
            "loss_rpn_cls": jnp.sum(cls_sum) / total / N,
            "loss_rpn_bbox": jnp.sum(box_sum) / total / N,
        }
        # RPN diagnostics — the reference's rpn_log_* scalars
        # (main.py:186-199): sampled pos/neg counts per way + valid
        # (inside-image) anchor count.
        for n in range(N):
            losses[f"rpn_log_pos_way{n}"] = jnp.mean(
                n_pos[:, n].astype(jnp.float32)
            )
            losses[f"rpn_log_neg_way{n}"] = jnp.mean(
                n_neg[:, n].astype(jnp.float32)
            )
        losses["rpn_log_valid_anchors"] = jnp.mean(
            n_inside.astype(jnp.float32)
        )
        return losses

    def train_forward(self, batch, rng) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        B = batch.qry_img.shape[0]
        N = c.n_ways
        rng_rpn, rng_rcnn = jax.random.split(rng)

        qry_fmap, spp_fmaps = self._extract(batch)
        rpn_cls, rpn_reg = self._rpn_forward(qry_fmap, spp_fmaps)
        losses = self._rpn_loss(rpn_cls, rpn_reg, batch, rng_rpn)

        merged_cls, merged_reg = self._merge_ways(rpn_cls, rpn_reg)
        # Proposals are inputs to the second stage, not a gradient path
        # (mmdet generates them under no_grad).
        props, prop_scores, prop_valid = jax.lax.stop_gradient(
            self.get_proposals(
                merged_cls, merged_reg, batch.img_hw,
                c.rpn_train_nms_pre, c.rpn_train_max_per_img,
            )
        )

        # -- RCNN assignment + sampling (add_gt_as_proposals=True:
        #    gt boxes prepended as always-positive candidates, like
        #    mmdet RandomSampler.sample) ---------------------------------
        G = batch.qry_boxes.shape[1]
        R = c.rcnn_num_samples
        cand_boxes = jnp.concatenate(
            [batch.qry_boxes.astype(jnp.float32), props], axis=1
        )  # (B, G+P, 4)
        keys = jax.random.split(rng_rcnn, B)

        def sample_one(props_i, prop_valid_i, cand_i, gt_boxes, gt_cats,
                       gt_valid, key):
            assign = max_iou_assign(
                props_i, gt_boxes, gt_valid,
                c.rcnn_pos_iou, c.rcnn_neg_iou, c.rcnn_min_pos_iou,
                match_low_quality=True, box_valid=None,
            )
            gt_self = jnp.where(
                gt_valid, jnp.arange(G, dtype=jnp.int32) + 1, -1
            )
            assigned = jnp.concatenate([gt_self, assign.assigned_gt_inds])
            cand_valid = jnp.concatenate([gt_valid, prop_valid_i])
            pos_mask = (assigned > 0) & cand_valid
            neg_mask = (assigned == 0) & cand_valid
            s = random_sample_pos_neg(
                key, pos_mask, neg_mask, R, c.rcnn_pos_fraction
            )
            rois = cand_i[s.inds]
            a = assigned[s.inds]
            gt_idx = jnp.clip(a - 1, 0, None)
            labels = jnp.where(s.is_pos, gt_cats[gt_idx], N)
            tgt_boxes = gt_boxes[gt_idx]
            return rois, labels, gt_idx, s.is_pos & s.valid, s.valid, tgt_boxes

        # Mark padded proposals as unusable by the assigner: give them
        # a box far outside so IoU = 0 → negative; then exclude via valid.
        props_for_assign = jnp.where(
            prop_valid[..., None], props, -1e4
        )
        rois, labels, gt_idx, is_pos, is_valid, tgt_boxes = jax.vmap(
            sample_one
        )(props_for_assign, prop_valid, cand_boxes,
          batch.qry_boxes.astype(jnp.float32),
          batch.qry_cats, batch.qry_valid, keys)

        # -- support pooling + relation head -----------------------------
        spp_maps = spp_vecs_mask = None
        if c.guidance:
            spp_maps, spp_vecs_mask = self._count_spp(
                spp_fmaps, batch.spp_boxes, batch.spp_masks
            )
        bbox_feats = self._bbox_feats(qry_fmap, rois)
        cls_final, reg_ways = self._relation(bbox_feats, spp_maps)

        lw = is_valid.astype(jnp.float32)
        n_valid = jnp.maximum(jnp.sum(lw), 1.0)
        losses["loss_cls"] = softmax_ce(
            cls_final.reshape(B * R, N + 1), labels.reshape(B * R),
            lw.reshape(B * R), n_valid,
        )
        way = jnp.clip(labels, 0, N - 1)
        way_oh = jax.nn.one_hot(way, N, dtype=reg_ways.dtype)  # (B, R, N)
        pred_deltas = jnp.einsum(
            "brn,brnd->brd", way_oh, reg_ways
        )  # (B, R, 4) — one-hot contraction instead of a scalar-core gather
        targets = delta_encode(
            rois, tgt_boxes, stds=c.rcnn_bbox_stds
        )
        bw = is_pos.astype(jnp.float32)[..., None]
        losses["loss_bbox"] = smooth_l1(
            pred_deltas, targets, bw, float(B * R)
        )
        acc, bal = accuracy_balanced(
            cls_final.reshape(B * R, N + 1), labels.reshape(B * R),
            lw.reshape(B * R), N + 1,
        )
        losses["acc"] = acc
        losses["acc_balanced"] = bal

        # -- mask branch (positives live in the first P_max slots) --------
        P_max = max(int(R * c.rcnn_pos_fraction), 1)
        pos_feats = bbox_feats[:, :P_max]
        pos_labels = way[:, :P_max]
        if c.guidance:
            lab_oh = jax.nn.one_hot(
                pos_labels, N, dtype=spp_vecs_mask.dtype
            )  # (B, P_max, N)
            gate = jnp.einsum(
                "bpn,bnc->bpc", lab_oh, spp_vecs_mask
            )  # (B, P_max, C)
            pos_feats = pos_feats * gate[:, :, None, None, :].astype(
                pos_feats.dtype
            )
        mask_logits = self._mask_head(
            pos_feats.reshape(B * P_max, 7, 7, -1)
        ).reshape(B, P_max, c.mask_size, c.mask_size)

        # targets: RoIAlign the (downsampled) gt masks at the pos rois
        mh, mw = batch.qry_masks.shape[2:]
        Himg = batch.qry_img.shape[1]
        mask_fmap = _mask_to_float(batch.qry_masks).transpose(0, 2, 3, 1)
        aligned = roi_align(
            mask_fmap, rois[:, :P_max].astype(jnp.float32), c.mask_size,
            spatial_scale=float(mh) / float(Himg),
        )  # (B, P_max, m, m, G)
        gt_oh = jax.nn.one_hot(
            gt_idx[:, :P_max], aligned.shape[-1], dtype=aligned.dtype
        )  # (B, P_max, G)
        tgt = jnp.einsum("bpxyg,bpg->bpxy", aligned, gt_oh)
        tgt = (tgt >= 0.5).astype(jnp.float32)
        mw_ = is_pos[:, :P_max].astype(jnp.float32)[..., None, None]
        n_pos_px = jnp.maximum(
            jnp.sum(is_pos[:, :P_max].astype(jnp.float32)), 1.0
        ) * (c.mask_size ** 2)
        losses["loss_mask"] = sigmoid_bce(mask_logits, tgt, mw_, n_pos_px)
        return losses

    # -- inference ------------------------------------------------------------

    def test_forward(self, batch) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        B = batch.qry_img.shape[0]
        N = c.n_ways

        qry_fmap, spp_fmaps = self._extract(batch)
        rpn_cls, rpn_reg = self._rpn_forward(qry_fmap, spp_fmaps)
        merged_cls, merged_reg = self._merge_ways(rpn_cls, rpn_reg)
        props, prop_scores, prop_valid = self.get_proposals(
            merged_cls, merged_reg, batch.img_hw,
            c.rpn_test_nms_pre, c.rpn_test_max_per_img,
        )
        P = props.shape[1]

        spp_maps = spp_vecs_mask = None
        if c.guidance:
            spp_maps, spp_vecs_mask = self._count_spp(
                spp_fmaps, batch.spp_boxes, batch.spp_masks
            )
        bbox_feats = self._bbox_feats(qry_fmap, props)
        cls_final, reg_ways = self._relation(bbox_feats, spp_maps)
        probs = jax.nn.softmax(cls_final.astype(jnp.float32), axis=-1)
        scores = probs[..., :N]  # (B, P, N)

        boxes = jax.vmap(
            lambda p, d, hw: delta_decode(
                p[:, None, :], d, stds=c.rcnn_bbox_stds,
                max_shape=(hw[0], hw[1]),
            )
        )(props, reg_ways.astype(jnp.float32), batch.img_hw)  # (B, P, N, 4)

        flat_scores = scores.reshape(B, P * N)
        flat_boxes = boxes.reshape(B, P * N, 4)
        flat_cls = jnp.tile(jnp.arange(N, dtype=jnp.int32)[None], (B, P))
        flat_cls = flat_cls.reshape(B, P * N)
        flat_valid = (
            jnp.repeat(prop_valid, N, axis=1)
            & (flat_scores > c.rcnn_score_thr)
        )

        def nms_one(bx, sc, cl, vl):
            return batched_nms(
                bx, sc, cl, vl, c.rcnn_nms_iou, c.rcnn_max_per_img,
                alive_fn=_nms_alive_fn(c),
            )

        dt_boxes, dt_scores, dt_cats, _, dt_valid = jax.vmap(nms_one)(
            flat_boxes, flat_scores, flat_cls, flat_valid
        )

        # mask branch on detections: gate by the detected class's support
        # vector, evaluate the single class-agnostic mask channel
        # (fgn_roi_head.py:675-719).
        det_feats = self._bbox_feats(qry_fmap, dt_boxes)
        if c.guidance:
            cat_oh = jax.nn.one_hot(dt_cats, N, dtype=spp_vecs_mask.dtype)
            gate = jnp.einsum("bmn,bnc->bmc", cat_oh, spp_vecs_mask)
            det_feats = det_feats * gate[:, :, None, None, :].astype(
                det_feats.dtype
            )
        M = dt_boxes.shape[1]
        dt_mask_logits = self._mask_head(
            det_feats.reshape(B * M, 7, 7, -1)
        ).reshape(B, M, c.mask_size, c.mask_size)

        return {
            "proposals": props,
            "prop_scores": prop_scores,
            "prop_valid": prop_valid,
            "dt_boxes": dt_boxes,
            "dt_scores": dt_scores,
            "dt_cats": dt_cats,
            "dt_valid": dt_valid,
            "dt_mask_logits": dt_mask_logits.astype(jnp.float32),
        }
