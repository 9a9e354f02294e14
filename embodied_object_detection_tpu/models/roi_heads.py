"""Cascade R-CNN ROI heads with CLIP zero-shot classifier + mask head.

ref: Detic/detic/modeling/roi_heads/detic_roi_heads.py (DeticCascadeROIHeads),
detic_fast_rcnn.py (DeticFastRCNNOutputLayers), zero_shot_classifier.py
(ZeroShotClassifier), detectron2 FastRCNNConvFCHead / MaskRCNNConvUpsampleHead.

TPU-first notes:
  * the frozen CLIP class-embedding matrix `zs_weight` [512, C+1] is an
    *input*, not a parameter — runtime vocabulary swap (reset_cls_test,
    detic/modeling/utils.py:32-50) is just passing a different array
  * all 3 cascade stages run on fixed-capacity padded proposals; detectron2's
    per-stage Instances rebuilding disappears
  * ROI pooling is ops.roi_align.multilevel_roi_align over p3-p5
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import ROIHeadsConfig
from ..ops.roi_align import multilevel_roi_align
from ..structures import Detections, clip_boxes
from .layers import c2_msra_init, c2_xavier_init, torch_linear_init


def apply_deltas(deltas: jax.Array, boxes: jax.Array,
                 weights: Tuple[float, ...],
                 scale_clamp: float = math.log(1000.0 / 16)) -> jax.Array:
    """Box2BoxTransform.apply_deltas (detectron2) — dx,dy,dw,dh to XYXY."""
    widths = boxes[:, 2] - boxes[:, 0]
    heights = boxes[:, 3] - boxes[:, 1]
    ctr_x = boxes[:, 0] + 0.5 * widths
    ctr_y = boxes[:, 1] + 0.5 * heights
    wx, wy, ww, wh = weights
    dx = deltas[:, 0] / wx
    dy = deltas[:, 1] / wy
    dw = jnp.minimum(deltas[:, 2] / ww, scale_clamp)
    dh = jnp.minimum(deltas[:, 3] / wh, scale_clamp)
    pred_ctr_x = dx * widths + ctr_x
    pred_ctr_y = dy * heights + ctr_y
    pred_w = jnp.exp(dw) * widths
    pred_h = jnp.exp(dh) * heights
    return jnp.stack([pred_ctr_x - 0.5 * pred_w, pred_ctr_y - 0.5 * pred_h,
                      pred_ctr_x + 0.5 * pred_w, pred_ctr_y + 0.5 * pred_h],
                     axis=-1)


def get_deltas(src: jax.Array, target: jax.Array,
               weights: Tuple[float, ...]) -> jax.Array:
    """Box2BoxTransform.get_deltas — regression targets."""
    src_w = src[:, 2] - src[:, 0]
    src_h = src[:, 3] - src[:, 1]
    src_cx = src[:, 0] + 0.5 * src_w
    src_cy = src[:, 1] + 0.5 * src_h
    t_w = target[:, 2] - target[:, 0]
    t_h = target[:, 3] - target[:, 1]
    t_cx = target[:, 0] + 0.5 * t_w
    t_cy = target[:, 1] + 0.5 * t_h
    wx, wy, ww, wh = weights
    eps = 1e-8
    return jnp.stack([
        wx * (t_cx - src_cx) / jnp.maximum(src_w, eps),
        wy * (t_cy - src_cy) / jnp.maximum(src_h, eps),
        ww * jnp.log(jnp.maximum(t_w, eps) / jnp.maximum(src_w, eps)),
        wh * jnp.log(jnp.maximum(t_h, eps) / jnp.maximum(src_h, eps)),
    ], axis=-1)


class BoxHead(nn.Module):
    """FastRCNNConvFCHead with 2 FC layers (ref: yaml NUM_FC: 2, FC_DIM 1024)."""
    fc_dim: int = 1024
    num_fc: int = 2
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], -1).astype(self.dtype)
        for i in range(self.num_fc):
            # c2_xavier_fill on every fc (FastRCNNConvFCHead)
            x = nn.Dense(self.fc_dim, dtype=self.dtype,
                         kernel_init=c2_xavier_init, name=f"fc{i + 1}")(x)
            x = nn.relu(x)
        return x


class ZeroShotPredictor(nn.Module):
    """DeticFastRCNNOutputLayers with USE_ZEROSHOT_CLS.

    ref: zero_shot_classifier.py:71-108 + detic_fast_rcnn.py:104-116.
    Outputs (logits [R, C+1], deltas [R, 4], clip_feats [R, 512]):
      clip_feats = 50 * l2norm(linear(x))       (the 512-d region embedding)
      logits     = clip_feats @ zs_weight        (zs_weight column-normalized,
                                                  bg column zero)
      deltas     = 2-layer MLP (cls-agnostic)
    """
    zs_dim: int = 512
    norm_temperature: float = 50.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, zs_weight: jax.Array):
        # cls_score.linear keeps the torch nn.Linear default init
        # (zero_shot_classifier.py never re-initializes it)
        feat = nn.Dense(self.zs_dim, dtype=jnp.float32,
                        kernel_init=torch_linear_init, name="cls_linear")(
            x.astype(jnp.float32))
        norm = jnp.linalg.norm(feat, axis=-1, keepdims=True)
        feat_n = self.norm_temperature * feat / jnp.maximum(norm, 1e-12)
        logits = jnp.dot(feat_n, zs_weight.astype(jnp.float32),
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)

        # bbox_pred[0] c2_xavier, bbox_pred[-1] normal(0.001)
        # (detic_fast_rcnn.py:114-116)
        d = nn.Dense(x.shape[-1], dtype=jnp.float32,
                     kernel_init=c2_xavier_init, name="bbox_fc1")(
            x.astype(jnp.float32))
        d = nn.relu(d)
        deltas = nn.Dense(4, dtype=jnp.float32,
                          kernel_init=nn.initializers.normal(0.001),
                          name="bbox_fc2")(d)
        return logits, deltas, feat_n


class MaskHead(nn.Module):
    """MaskRCNNConvUpsampleHead, class-agnostic (ref: yaml ROI_MASK_HEAD:
    NUM_CONV 4, CLS_AGNOSTIC_MASK True). 14x14 pooled -> 28x28 logits."""
    channels: int = 256
    num_convs: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        for i in range(self.num_convs):
            # c2_msra_fill (MaskRCNNConvUpsampleHead convs)
            x = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                        kernel_init=c2_msra_init, name=f"mask_fcn{i + 1}")(x)
            x = nn.relu(x)
        # 2x2 stride-2 deconv, written as an einsum + pixel-shuffle: with
        # kernel==stride there is no overlap, so
        # y[2i+a, 2j+b, d] = sum_c x[i, j, c] W[a, b, c, d] — exactly torch
        # ConvTranspose2d semantics, with no kernel-flip ambiguity (keeps the
        # torch->jax weight conversion a pure transpose).
        w_dc = self.param("deconv_kernel", c2_msra_init,
                          (2, 2, self.channels, self.channels))
        b_dc = self.param("deconv_bias", nn.initializers.zeros,
                          (self.channels,))
        r, hh, ww, c = x.shape
        y = jnp.einsum("rhwc,abcd->rhawbd", x.astype(jnp.float32),
                       w_dc.astype(jnp.float32))
        x = (y.reshape(r, hh * 2, ww * 2, self.channels) + b_dc).astype(self.dtype)
        x = nn.relu(x)
        # predictor init normal(0.001) (detectron2 MaskRCNNConvUpsampleHead)
        logits = nn.Conv(1, (1, 1), dtype=jnp.float32,
                         kernel_init=nn.initializers.normal(0.001),
                         name="predictor")(
            x.astype(jnp.float32))
        return logits[..., 0]                       # [R, 28, 28]


class SoftmaxPropHead(nn.Module):
    """WITH_SOFTMAX_PROP score head for WSDDN-style MIL
    (ref: detic_fast_rcnn.py:118-125: Linear -> ReLU -> Linear(C+1))."""
    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(x.shape[-1], dtype=jnp.float32,
                     kernel_init=c2_xavier_init, name="fc1")(
            x.astype(jnp.float32))
        y = nn.relu(y)
        return nn.Dense(self.num_classes + 1, dtype=jnp.float32,
                        kernel_init=nn.initializers.normal(0.001),
                        name="fc2")(y)


class StageOutput(NamedTuple):
    logits: jax.Array        # [R, C+1]
    deltas: jax.Array        # [R, 4]
    clip_feats: jax.Array    # [R, 512]
    boxes: jax.Array         # [R, 4] input proposal boxes of this stage


class CascadeOutputs(NamedTuple):
    stages: Tuple[StageOutput, ...]  # per-stage logits/deltas/feats/boxes;
                                     # the memory write reads stages[0]
    final_boxes: jax.Array   # [R, 4] stage-3 regressed, clipped
    mean_scores: jax.Array   # [R, C+1] mean sigmoid over stages


class CascadeROIHeads(nn.Module):
    """3-stage cascade box heads (ref: detic_roi_heads.py:88-259)."""
    cfg: ROIHeadsConfig
    dtype: Any = jnp.bfloat16

    def setup(self):
        n = len(self.cfg.cascade_ious)
        self.box_heads = [BoxHead(self.cfg.fc_dim, self.cfg.num_fc,
                                  dtype=self.dtype, name=f"box_head{k}")
                          for k in range(n)]
        self.predictors = [ZeroShotPredictor(self.cfg.zs_weight_dim,
                                             self.cfg.norm_temperature,
                                             dtype=self.dtype,
                                             name=f"box_predictor{k}")
                           for k in range(n)]
        self.mask_head = MaskHead(self.cfg.mask_channels,
                                  self.cfg.mask_num_convs, dtype=self.dtype,
                                  name="mask_head")

    def _pool(self, features, boxes, resolution):
        return multilevel_roi_align(
            features, boxes, strides=tuple(self.cfg.strides),
            output_size=resolution, sampling_ratio=self.cfg.sampling_ratio,
            canonical_box_size=self.cfg.canonical_box_size,
            canonical_level=self.cfg.canonical_level,
            impl=getattr(self.cfg, "align_impl", "v2"))

    def run_cascade(self, features: Sequence[jax.Array], proposals: Detections,
                    zs_weight: jax.Array, image_hw: Tuple[int, int]
                    ) -> CascadeOutputs:
        """Run all cascade stages (shared by train/eval).

        Stage-0 proposals enter UNCLIPPED (the reference pools from and
        regresses deltas against the raw CenterNet boxes); stage k>0
        proposals are the previous stage's regressed boxes, clipped to the
        image (ref: _create_proposals_from_boxes, detic_roi_heads.py:306-323).
        """
        h, w = image_hw
        boxes = proposals.boxes
        stages = []
        for k in range(len(self.box_heads)):
            pooled = self._pool(features, boxes, self.cfg.pooler_resolution)
            x = self.box_heads[k](pooled)
            logits, deltas, clip_feats = self.predictors[k](x, zs_weight)
            stages.append(StageOutput(logits=logits, deltas=deltas,
                                      clip_feats=clip_feats, boxes=boxes))
            boxes = apply_deltas(deltas, boxes,
                                 self.cfg.cascade_bbox_reg_weights[k])
            boxes = clip_boxes(boxes, h, w)

        # inference score = mean of per-stage class probabilities
        # (ref: detic_roi_heads.py:164-168); the per-stage probability is
        # sigmoid or softmax per USE_SIGMOID_CE (predict_probs,
        # detic_fast_rcnn.py:334-338)
        prob = (jax.nn.sigmoid if self.cfg.use_sigmoid_ce
                else lambda l: jax.nn.softmax(l, axis=-1))
        mean_scores = sum(prob(s.logits) for s in stages) / len(stages)
        return CascadeOutputs(stages=tuple(stages), final_boxes=boxes,
                              mean_scores=mean_scores)

    def mask_logits(self, features: Sequence[jax.Array],
                    boxes: jax.Array) -> jax.Array:
        """Mask head on given boxes (ref: forward_mask_memory,
        detic_roi_heads.py:261-268). Returns [R, 28, 28] logits."""
        pooled = self._pool(features, boxes, self.cfg.mask_pooler_resolution)
        return self.mask_head(pooled)

    def __call__(self, features, proposals, zs_weight, image_hw):
        return self.run_cascade(features, proposals, zs_weight, image_hw)
