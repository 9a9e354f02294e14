"""Res5 ROI heads variant: the backbone's stage-4 is the per-ROI feature
extractor (single-stage heads, no FPN).

ref: Detic/detic/modeling/roi_heads/res5_roi_heads.py:20-172
(CustomRes5ROIHeads): proposals pool 14x14 C4 (stride-16) features, run them
through res5 (shared with the backbone -> 7x7x2048), spatial-mean, and feed
one DeticFastRCNNOutputLayers. Paired here with a single-level CenterNet
proposal head on C4 (the reference pairs it with whatever proposal generator
the config selects).

Select via roi.head_type="res5" (build_res5_detector).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import DetectorConfig
from ..ops.nms import multiclass_nms
from ..ops.roi_align import multilevel_roi_align
from ..structures import Detections, clip_boxes
from .centernet import CenterNetHead, decode_proposals
from .resnet import ResNet50
from .roi_heads import ZeroShotPredictor, apply_deltas


class Res5Outputs(NamedTuple):
    detections: Detections
    proposals: Detections
    logits: jax.Array       # [R, C+1]
    clip_feats: jax.Array   # [R, 512] region embeddings (ADD_FEATURE_TO_PROP)


class Res5Detector(nn.Module):
    """ResNet50-C4 + CenterNet proposals + Res5 box heads."""
    cfg: DetectorConfig
    pooler_resolution: int = 14      # detectron2 Res5ROIHeads pools 14 -> 7
    c4_stride: int = 16

    def setup(self):
        dtype = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" \
            else jnp.float32
        self.backbone = ResNet50(depths=self.cfg.backbone.depths,
                                 dtype=dtype, name="backbone")
        self.centernet = CenterNetHead(
            num_levels=1, in_channels=1024,
            num_box_convs=self.cfg.centernet.num_box_convs,
            prior_prob=self.cfg.centernet.prior_prob,
            dtype=dtype, name="centernet")
        # out_channels = RES2_OUT_CHANNELS * 2^3 = 2048
        # (res5_roi_heads.py:33-41)
        self.predictor = ZeroShotPredictor(self.cfg.roi.zs_weight_dim,
                                           self.cfg.roi.norm_temperature,
                                           dtype=dtype, name="box_predictor")

    def _normalize(self, image):
        mean = jnp.asarray(self.cfg.input.pixel_mean, jnp.float32)
        std = jnp.asarray(self.cfg.input.pixel_std, jnp.float32)
        return (image - mean) / std

    def _roi_features(self, c4, boxes):
        """_shared_roi_transform (detectron2 Res5ROIHeads): pool 14x14 from
        C4, run res5, mean over space -> [R, 2048]."""
        pooled = multilevel_roi_align(
            (c4,), boxes, strides=(self.c4_stride,),
            output_size=self.pooler_resolution,
            sampling_ratio=self.cfg.roi.sampling_ratio)
        feats = self.backbone.res5(pooled)              # [R, 7, 7, 2048]
        return jnp.mean(feats.astype(jnp.float32), axis=(1, 2))

    def _proposals(self, c4, training: bool):
        ccfg = dataclasses.replace(self.cfg.centernet, strides=(self.c4_stride,))
        agn_hms, regs = self.centernet((c4,))
        return decode_proposals(agn_hms, regs, ccfg, training=training), \
            (agn_hms, regs)

    def frame_step(self, image: jax.Array, zs_weight: jax.Array
                   ) -> Res5Outputs:
        cfg = self.cfg
        h, w = cfg.input.height, cfg.input.width
        _, c4 = self.backbone.stem_to_c4(self._normalize(image))
        proposals, _ = self._proposals(c4, training=False)

        x = self._roi_features(c4, proposals.boxes)
        logits, deltas, clip_feats = self.predictor(x, zs_weight)
        boxes = clip_boxes(apply_deltas(
            deltas, proposals.boxes,
            cfg.roi.cascade_bbox_reg_weights[0]), h, w)
        # sigmoid or softmax per USE_SIGMOID_CE (predict_probs,
        # detic_fast_rcnn.py:334-338)
        scores = (jax.nn.sigmoid(logits) if cfg.roi.use_sigmoid_ce
                  else jax.nn.softmax(logits, axis=-1))
        if cfg.roi.mult_proposal_score:
            scores = jnp.sqrt(scores *
                              jnp.maximum(proposals.scores[:, None], 0.0))
        detections, _ = multiclass_nms(
            boxes, scores, proposals.valid, cfg.roi.score_thresh_test,
            cfg.roi.nms_thresh_test, cfg.roi.detections_per_image)
        return Res5Outputs(detections=detections, proposals=proposals,
                           logits=logits, clip_feats=clip_feats)

    def frame_train(self, image: jax.Array, zs_weight: jax.Array, gt,
                    sample_rng: "jax.Array | None" = None,
                    fed_freq_weight: "jax.Array | None" = None) -> dict:
        """Single-stage training losses (CenterNet + box head at IoU 0.5).

        Honors cfg.roi.use_sigmoid_ce / use_fed_loss exactly like the
        cascade path (detic_fast_rcnn.py:201-266 applies to the Res5 heads'
        shared DeticFastRCNNOutputLayers too)."""
        from .losses import (add_gt_to_proposals, centernet_targets,
                             centernet_losses, match_proposals,
                             sample_proposals, stage_losses)
        cfg = self.cfg
        h, w = cfg.input.height, cfg.input.width
        # single C4 level: its size-of-interest range must cover EVERY box
        # (the 5-level (0,80)... ladder would leave large objects with no
        # positive locations at all on the lone level)
        ccfg = dataclasses.replace(cfg.centernet, strides=(self.c4_stride,),
                                   sizes_of_interest=((0, 10000000),))
        _, c4 = self.backbone.stem_to_c4(self._normalize(image))
        agn_hms, regs = self.centernet((c4,))
        targets = centernet_targets(gt, ((c4.shape[0], c4.shape[1]),), ccfg)
        agn_flat = jnp.concatenate([x.reshape(-1) for x in agn_hms])
        reg_flat = jnp.concatenate([x.reshape(-1, 4) for x in regs])
        num_pos = jnp.sum(targets.pos_count.astype(jnp.float32))
        # per-frame local normalization (world-size-1 semantics); the
        # flagship batch step defers to batch-global counts
        # (parallel/train_step.py, ref centernet.py:258-265) — the Res5
        # variant has no batched trainer of its own
        losses = centernet_losses(agn_flat, reg_flat, targets, ccfg, num_pos)

        proposals = decode_proposals(agn_hms, regs, ccfg, training=True)
        proposals = add_gt_to_proposals(proposals, gt)
        boxes = jax.lax.stop_gradient(proposals.boxes)
        valid = proposals.valid
        # label_and_sample_proposals subsampling applies to the Res5 heads
        # too (res5_roi_heads.py inherits StandardROIHeads._sample_proposals:
        # batch_size_per_image=512, positive_fraction=0.25) — pooling all
        # ~2000 post-NMS train proposals through res5 (14x14x1024 each)
        # would be both unfaithful and an activation-memory blowup
        bsz = cfg.roi.batch_size_per_image
        if bsz and boxes.shape[0] > bsz:
            m0 = match_proposals(boxes, valid, gt, 0.5, cfg.roi.num_classes)
            fg = (m0.gt_classes < cfg.roi.num_classes) & m0.valid
            idx, keep = sample_proposals(
                valid, fg, bsz, cfg.roi.positive_fraction,
                sample_rng if sample_rng is not None
                else jax.random.PRNGKey(0))
            boxes = jnp.take(boxes, idx, axis=0)
            valid = jnp.take(valid, idx) & keep
        matched = match_proposals(boxes, valid, gt, 0.5,
                                  cfg.roi.num_classes)
        x = self._roi_features(c4, boxes)
        logits, deltas, _ = self.predictor(x, zs_weight)
        class_weight = None
        if cfg.roi.use_fed_loss and fed_freq_weight is not None:
            from .losses import fed_loss_class_weight
            class_weight = fed_loss_class_weight(
                matched.gt_classes, matched.valid, fed_freq_weight,
                cfg.roi.fed_loss_num_cat, cfg.roi.num_classes,
                jax.random.fold_in(
                    sample_rng if sample_rng is not None
                    else jax.random.PRNGKey(0), 101))
        if cfg.roi.ignore_zero_cats and fed_freq_weight is not None:
            # ref: detic_fast_rcnn.py:225-228 / :244-251 (softmax if/elif)
            zw = (fed_freq_weight[:cfg.roi.num_classes] > 1e-4) \
                .astype(jnp.float32)
            if not cfg.roi.use_sigmoid_ce or class_weight is None:
                class_weight = zw
            else:
                class_weight = class_weight * zw
        sl = stage_losses(logits, deltas, matched,
                          cfg.roi.cascade_bbox_reg_weights[0],
                          cfg.roi.num_classes,
                          class_weight=class_weight,
                          use_sigmoid_ce=cfg.roi.use_sigmoid_ce)
        losses.update(sl)
        return losses

    def __call__(self, image: jax.Array, zs_weight: jax.Array) -> Res5Outputs:
        return self.frame_step(image, zs_weight)


def build_res5_detector(cfg: Optional[DetectorConfig] = None,
                        rng: Optional[jax.Array] = None
                        ) -> Tuple[Res5Detector, Any]:
    """Init on a miniature (resolution-independent params), like
    build_detector."""
    cfg = cfg or DetectorConfig()
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    model = Res5Detector(cfg)
    icfg = cfg.replace(
        input=dataclasses.replace(cfg.input, height=64, width=96),
        centernet=dataclasses.replace(cfg.centernet, pre_nms_topk_test=16,
                                      post_nms_topk_test=8),
        roi=dataclasses.replace(cfg.roi, detections_per_image=4),
    )
    init_model = Res5Detector(icfg)
    h, w = icfg.input.height, icfg.input.width
    params = init_model.init(
        rng, jnp.zeros((h, w, 3), jnp.float32),
        jnp.zeros((icfg.roi.zs_weight_dim, icfg.roi.num_classes + 1),
                  jnp.float32))
    return model, params
