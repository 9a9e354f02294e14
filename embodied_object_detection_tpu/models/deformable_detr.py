"""Deformable-DETR meta-architecture (the reference's alternative detector).

ref: Detic/detic/modeling/meta_arch/d2_deformable_detr.py (DeformableDetr
wrapper) + third_party/Deformable-DETR/models/{deformable_transformer.py,
deformable_detr.py, matcher.py, position_encoding.py}. Defaults mirror
detic/config.py:160-180: hidden 256, 8 heads, 6 enc + 6 dec layers, FFN 2048,
4 feature levels, focal alpha 0.25, cost/loss weights cls 2 / L1 5 / giou 2.

TPU-first: the CUDA ms_deform_attn kernel is ops/ms_deform_attn.py (pure
gather-interpolate, autodiff backward); all sequence lengths are static
(fixed image size => fixed per-level token counts); the Hungarian assignment
runs on host via scipy between jitted cost-matrix and loss computations —
matching is O(queries x gt) tiny and inherently sequential.
"""

from __future__ import annotations

import math
from typing import Any, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config import DetectorConfig
from ..ops.ms_deform_attn import ms_deform_attn
from ..structures import Detections, GroundTruth, giou_xyxy


def position_embedding_sine(h: int, w: int, dim: int = 256,
                            temperature: float = 10000.0) -> jnp.ndarray:
    """[H, W, dim] sine position embedding (ref: position_encoding.py,
    normalize=True)."""
    scale = 2 * math.pi
    ys = (jnp.arange(h, dtype=jnp.float32) + 1.0) / h * scale
    xs = (jnp.arange(w, dtype=jnp.float32) + 1.0) / w * scale
    half = dim // 2
    dim_t = temperature ** (2 * (jnp.arange(half) // 2) / half)
    pos_x = xs[None, :, None] / dim_t
    pos_y = ys[:, None, None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])],
                      axis=-1).reshape(1, w, half)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])],
                      axis=-1).reshape(h, 1, half)
    pos_x = jnp.broadcast_to(pos_x, (h, w, half))
    pos_y = jnp.broadcast_to(pos_y, (h, w, half))
    return jnp.concatenate([pos_y, pos_x], axis=-1)


class MSDeformAttnLayer(nn.Module):
    """Multi-scale deformable attention module (query side).

    ref: models/ops/modules/ms_deform_attn.py: per (head, level, point)
    sampling offsets + attention weights predicted from the query, applied to
    value projections of the flattened features.
    """
    dim: int = 256
    heads: int = 8
    levels: int = 4
    points: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, ref_points, value, spatial_shapes):
        # query [Q, C]; ref_points [Q, 2] in [0,1]; value [S, C]
        q, c = query.shape
        m, l, p = self.heads, self.levels, self.points
        d = c // m
        v = nn.Dense(c, name="value_proj")(value).reshape(-1, m, d)
        offsets = nn.Dense(m * l * p * 2, name="sampling_offsets",
                           kernel_init=nn.initializers.zeros)(query)
        offsets = offsets.reshape(q, m, l, p, 2)
        attn = nn.Dense(m * l * p, name="attention_weights",
                        kernel_init=nn.initializers.zeros)(query)
        attn = jax.nn.softmax(attn.reshape(q, m, l * p), axis=-1)
        attn = attn.reshape(q, m, l, p)

        if ref_points.shape[-1] == 4:
            # two-stage / box-refine 4-d reference: offsets scale with the
            # reference box size (ref: deformable_transformer.py decoder
            # `offsets / n_points * reference_points[..., 2:] * 0.5`)
            r = ref_points[:, None, None, None, :]
            locs = r[..., :2] + offsets / p * r[..., 2:] * 0.5
        else:
            shapes_wh = jnp.asarray([[wd, ht] for ht, wd in spatial_shapes],
                                    jnp.float32)                 # [L, 2]
            locs = ref_points[:, None, None, None, :] + \
                offsets / shapes_wh[None, None, :, None, :]
        out = ms_deform_attn(v, tuple(spatial_shapes), locs, attn)
        return nn.Dense(c, name="output_proj")(out)


class EncoderLayer(nn.Module):
    dim: int = 256
    heads: int = 8
    levels: int = 4
    ffn: int = 2048

    @nn.compact
    def __call__(self, src, pos, ref_points, spatial_shapes):
        q = src + pos
        attn = MSDeformAttnLayer(self.dim, self.heads, self.levels,
                                 name="self_attn")(q, ref_points, src,
                                                   spatial_shapes)
        src = nn.LayerNorm(name="norm1")(src + attn)
        y = nn.Dense(self.ffn, name="linear1")(src)
        y = nn.relu(y)
        y = nn.Dense(self.dim, name="linear2")(y)
        return nn.LayerNorm(name="norm2")(src + y)


class DecoderLayer(nn.Module):
    dim: int = 256
    heads: int = 8
    levels: int = 4
    ffn: int = 2048

    @nn.compact
    def __call__(self, tgt, query_pos, ref_points, memory, spatial_shapes):
        # q = k = tgt+pos but value = tgt (DeformableTransformerDecoderLayer
        # self_attn(q, k, value=tgt) — the positional term must NOT leak
        # into the attention values)
        qk = (tgt + query_pos)[None]
        sa = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, name="self_attn")(
                inputs_q=qk, inputs_k=qk, inputs_v=tgt[None])[0]
        tgt = nn.LayerNorm(name="norm1")(tgt + sa)
        ca = MSDeformAttnLayer(self.dim, self.heads, self.levels,
                               name="cross_attn")(tgt + query_pos, ref_points,
                                                  memory, spatial_shapes)
        tgt = nn.LayerNorm(name="norm2")(tgt + ca)
        y = nn.Dense(self.ffn, name="linear1")(tgt)
        y = nn.relu(y)
        y = nn.Dense(self.dim, name="linear2")(y)
        return nn.LayerNorm(name="norm3")(tgt + y)


class DETROutputs(NamedTuple):
    logits: jax.Array        # [layers, Q, C]
    boxes_cxcywh: jax.Array  # [layers, Q, 4] normalized
    # two-stage encoder proposals (ref: deformable_detr.py:186-188
    # out['enc_outputs']); None in single-stage mode
    enc_logits: Optional[jax.Array] = None        # [S, C]
    enc_boxes_cxcywh: Optional[jax.Array] = None  # [S, 4]


def inverse_sigmoid(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    return jnp.log(jnp.clip(x, eps) / jnp.clip(1 - x, eps))


def proposal_pos_embed(unact: jax.Array, dim: int = 512,
                       temperature: float = 10000.0) -> jax.Array:
    """[Q, 4] unactivated proposal coords -> [Q, dim] sine embedding
    (ref: deformable_transformer.py get_proposal_pos_embed)."""
    q = unact.shape[0]
    num_pos_feats = dim // 4
    dim_t = temperature ** (2 * (jnp.arange(num_pos_feats) // 2) /
                            num_pos_feats)
    p = jax.nn.sigmoid(unact) * (2 * math.pi)
    pos = p[:, :, None] / dim_t                              # [Q, 4, F]
    pos = jnp.stack([jnp.sin(pos[..., 0::2]), jnp.cos(pos[..., 1::2])],
                    axis=-1)                                 # [Q, 4, F/2, 2]
    return pos.reshape(q, dim)


def encoder_output_proposals(shapes: Sequence[Tuple[int, int]]
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-token initial proposals for the two-stage first stage.

    ref: deformable_transformer.py gen_encoder_output_proposals — grid
    centers (i+0.5)/H with wh = 0.05 * 2^lvl; tokens whose proposal leaves
    (0.01, 0.99) are invalid. With fixed shapes (no padding) valid ratios
    are 1. Returns (unactivated proposals [S, 4], valid [S])."""
    props = []
    for lvl, (h, w) in enumerate(shapes):
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        wh = jnp.full((h, w), 0.05 * (2.0 ** lvl), jnp.float32)
        props.append(jnp.stack([gx, gy, wh, wh], -1).reshape(-1, 4))
    proposals = jnp.concatenate(props, 0)                    # [S, 4]
    valid = jnp.all((proposals > 0.01) & (proposals < 0.99), -1)
    unact = inverse_sigmoid(proposals)
    # invalid tokens get a saturating logit (the reference fills +inf; a
    # large finite value keeps sigmoid == 1.0 in f32 without inf*0 NaNs)
    unact = jnp.where(valid[:, None], unact, 1e4)
    return unact, valid


class DeformableDETR(nn.Module):
    """Single-image Deformable-DETR head over FPN features p3-p6.

    num_classes classifies via a plain linear head, or CLIP-space zs_weight
    when `use_zeroshot` (the Detic open-vocabulary DETR,
    d2_deformable_detr.py:163-177).
    """
    num_classes: int = 20
    hidden_dim: int = 256
    heads: int = 8
    enc_layers: int = 6
    dec_layers: int = 6
    ffn: int = 2048
    num_queries: int = 100
    levels: int = 4
    points: int = 4
    use_zeroshot: bool = False
    zs_dim: int = 512
    norm_temperature: float = 50.0
    with_box_refine: bool = False
    # TWO_STAGE (ref: d2_deformable_detr.py:124, deformable_transformer.py
    # :157-184): encoder tokens propose boxes; top-k token proposals seed the
    # decoder queries + 4-d reference points; the extra (dec_layers-th)
    # class/bbox head scores the encoder stage.
    two_stage: bool = False
    # trailing features already projected to hidden_dim by the caller (the
    # detector's stride-2 extra level carries its own conv+GN, matching the
    # reference's single Conv2d(3,s2)+GN input_proj for extra levels —
    # deformable_detr.py input_proj extra-level branch); 0 = project all
    pre_projected: int = 0

    @nn.compact
    def __call__(self, features: Sequence[jax.Array],
                 zs_weight: Optional[jax.Array] = None) -> DETROutputs:
        from .layers import GroupNorm
        c = self.hidden_dim
        shapes = tuple((f.shape[0], f.shape[1]) for f in features)
        srcs, poss, refs = [], [], []
        n_proj = len(features) - self.pre_projected
        for i, f in enumerate(features):
            if i < n_proj:
                s = nn.Conv(c, (1, 1),
                            name=f"input_proj{i}")(f.astype(jnp.float32))
                s = GroupNorm(num_groups=32, name=f"input_gn{i}")(s)
            else:
                s = f.astype(jnp.float32)
            h, w = shapes[i]
            pos = position_embedding_sine(h, w, c) + \
                self.param(f"level_embed{i}", nn.initializers.normal(1.0), (c,))
            srcs.append(s.reshape(-1, c))
            poss.append(pos.reshape(-1, c))
            ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
            xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
            gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
            refs.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1))
        src = jnp.concatenate(srcs, 0)
        pos = jnp.concatenate(poss, 0)
        enc_ref = jnp.concatenate(refs, 0)

        for i in range(self.enc_layers):
            src = EncoderLayer(c, self.heads, self.levels, self.ffn,
                               name=f"encoder{i}")(src, pos, enc_ref, shapes)

        # prediction heads: shared across decoder layers (per-layer clones
        # only under box refine); two_stage adds one more head for the
        # encoder stage — shared with the decoder head unless refining
        # (ref: deformable_detr.py:96-106 num_pred / _get_clones)
        n_heads = (self.dec_layers + (1 if self.two_stage else 0)) \
            if self.with_box_refine else 1
        if self.use_zeroshot:
            cls_heads = [nn.Dense(self.zs_dim, name=f"cls_embed{k}")
                         for k in range(n_heads)]
        else:
            cls_heads = [nn.Dense(self.num_classes, name=f"class_embed{k}")
                         for k in range(n_heads)]
        bbox_heads = [[nn.Dense(c, name=f"bbox_embed{k}_0"),
                       nn.Dense(c, name=f"bbox_embed{k}_1"),
                       nn.Dense(4, name=f"bbox_embed{k}_out")]
                      for k in range(n_heads)]

        def apply_cls(k, x):
            if self.use_zeroshot:
                assert zs_weight is not None
                emb = cls_heads[k](x)
                emb = self.norm_temperature * emb / jnp.maximum(
                    jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
                # fp32 zs_weight logits (CLAUDE.md matmul rule; mirrors
                # ZeroShotPredictor roi_heads.py:108-110)
                return jnp.dot(emb, zs_weight[:, :self.num_classes],
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)
            return cls_heads[k](x)

        def apply_bbox(k, x):
            d = x
            for fc in bbox_heads[k][:2]:
                d = nn.relu(fc(d))
            return bbox_heads[k][2](d)

        enc_logits = enc_boxes = None
        query_valid = None
        if self.two_stage:
            # encoder tokens -> proposals; top-k seed the decoder
            # (ref: deformable_transformer.py:157-172)
            prop_unact, prop_valid = encoder_output_proposals(shapes)
            out_mem = jnp.where(prop_valid[:, None], src, 0.0)
            out_mem = nn.LayerNorm(name="enc_output_norm")(
                nn.Dense(c, name="enc_output")(out_mem))
            k_enc = self.dec_layers if self.with_box_refine else 0
            enc_logits = apply_cls(k_enc, out_mem)               # [S, C]
            enc_unact = apply_bbox(k_enc, out_mem) + prop_unact  # [S, 4]
            enc_boxes = jax.nn.sigmoid(enc_unact)

            # shape-robust to num_queries > token count on miniature inputs:
            # clamp k, repeat the tail index, and remember which query slots
            # are padding so their logits can be suppressed below —
            # otherwise the duplicates survive detr_inference's plain top-k
            # as extra valid detections
            kq = min(self.num_queries, enc_logits.shape[0])
            _, topk_idx = jax.lax.top_k(enc_logits[:, 0], kq)
            if kq < self.num_queries:
                topk_idx = jnp.pad(topk_idx, (0, self.num_queries - kq),
                                   mode="edge")
                query_valid = jnp.arange(self.num_queries) < kq
            topk_unact = jax.lax.stop_gradient(enc_unact[topk_idx])  # [Q, 4]
            ref = jax.nn.sigmoid(topk_unact)
            pos_trans = nn.Dense(2 * c, name="pos_trans")(
                proposal_pos_embed(topk_unact, 2 * c))
            pos_trans = nn.LayerNorm(name="pos_trans_norm")(pos_trans)
            query_pos, tgt = pos_trans[:, :c], pos_trans[:, c:]
        else:
            query_embed = self.param("query_embed",
                                     nn.initializers.normal(1.0),
                                     (self.num_queries, 2 * c))
            query_pos, tgt = query_embed[:, :c], query_embed[:, c:]
            ref = jax.nn.sigmoid(
                nn.Dense(2, name="reference_points")(query_pos))  # [Q, 2]

        all_logits, all_boxes = [], []
        for i in range(self.dec_layers):
            tgt = DecoderLayer(c, self.heads, self.levels, self.ffn,
                               name=f"decoder{i}")(tgt, query_pos, ref, src,
                                                   shapes)
            k = i if self.with_box_refine else 0
            logits = apply_cls(k, tgt)
            delta = apply_bbox(k, tgt)
            # boxes = sigmoid(delta + inverse_sigmoid(ref)); 2-d refs update
            # only cx,cy (ref: deformable_detr.py forward tmp[..., :2] += ref)
            inv_ref = inverse_sigmoid(ref)
            if ref.shape[-1] == 2:
                inv_ref = jnp.pad(inv_ref, ((0, 0), (0, 2)))
            boxes = jax.nn.sigmoid(delta + inv_ref)
            if query_valid is not None:
                # padded duplicate queries: drive sigmoid scores to ~0 so
                # they can't match GT in training or rank in inference
                logits = jnp.where(query_valid[:, None], logits, -1e4)
            all_logits.append(logits)
            all_boxes.append(boxes)
            if self.with_box_refine:
                # the reference upgrades refs to the full detached 4-d box
                # after every layer regardless of two_stage
                # (deformable_transformer.py new_reference_points)
                ref = jax.lax.stop_gradient(boxes)
        return DETROutputs(logits=jnp.stack(all_logits),
                           boxes_cxcywh=jnp.stack(all_boxes),
                           enc_logits=enc_logits,
                           enc_boxes_cxcywh=enc_boxes)


class DeformableDetrDetector(nn.Module):
    """End-to-end single-frame DETR detector: ResNet50 C3-C5 + an extra
    stride-2 level, then the deformable transformer.

    ref: d2_deformable_detr.py DeformableDetr (MaskedBackbone + Joiner +
    DeformableDETR). Classes via plain linear or CLIP zs_weight.
    """
    cfg: DetectorConfig
    num_queries: int = 100
    use_zeroshot: bool = False
    with_box_refine: bool = False
    two_stage: bool = False

    def setup(self):
        from .resnet import ResNet50
        self.backbone = ResNet50(depths=self.cfg.backbone.depths,
                                 dtype=jnp.float32, name="backbone")
        from .layers import GroupNorm
        self.detr = DeformableDETR(
            num_classes=self.cfg.roi.num_classes,
            num_queries=self.num_queries,
            use_zeroshot=self.use_zeroshot,
            with_box_refine=self.with_box_refine,
            two_stage=self.two_stage, pre_projected=1, name="detr")
        # extra level: a SINGLE stride-2 3x3 conv + GN on C5 is that level's
        # whole input_proj (ref: deformable_detr.py input_proj extra-level
        # branch builds Conv2d(k=3,s=2)+GroupNorm, nothing more); the DETR
        # trunk is told it is pre-projected so no second 1x1 is stacked on
        self.extra_level = nn.Conv(self.detr.hidden_dim, (3, 3),
                                   strides=(2, 2), padding=1,
                                   dtype=jnp.float32, name="extra_level")
        self.extra_gn = GroupNorm(num_groups=32, name="extra_gn")

    def _normalize(self, image):
        mean = jnp.asarray(self.cfg.input.pixel_mean, jnp.float32)
        std = jnp.asarray(self.cfg.input.pixel_std, jnp.float32)
        return (image - mean) / std

    def __call__(self, image: jax.Array,
                 zs_weight: Optional[jax.Array] = None) -> DETROutputs:
        c3, c4, c5 = self.backbone(self._normalize(image))
        c6 = self.extra_gn(self.extra_level(c5.astype(jnp.float32)))
        return self.detr((c3, c4, c5, c6), zs_weight)


def detr_train_step_host_matched(model: "DeformableDetrDetector", params,
                                 image: jax.Array, gt: GroundTruth,
                                 image_hw: Tuple[int, int],
                                 zs_weight=None):
    """One DETR training step body: forward, host Hungarian per decoder
    layer, then the differentiable loss with the assignment fixed (the
    standard DETR two-phase structure — the matcher is no-grad in the
    reference too, matcher.py @torch.no_grad)."""
    q = model.num_queries
    g = gt.boxes.shape[0]

    # single forward: take the vjp so the backward pass can reuse this
    # primal instead of re-running the whole trunk inside value_and_grad
    # (the matcher is no-grad, so matching on the primal outputs and then
    # pulling the loss cotangent back through vjp is exact)
    out, pullback = jax.vjp(
        lambda p: model.apply(p, image, zs_weight), params)

    def pad_match(logits, boxes, targets):
        cost = matcher_cost_matrix(logits, boxes, targets, image_hw)
        qi, gi = hungarian_match(np.asarray(cost), np.asarray(targets.valid))
        mq = np.zeros(g, np.int64)
        mg = np.zeros(g, np.int64)
        mv = np.zeros(g, bool)
        mq[: len(qi)] = qi
        mg[: len(gi)] = gi
        mv[: len(qi)] = True
        return jnp.asarray(mq), jnp.asarray(mg), jnp.asarray(mv)

    matches = [pad_match(out.logits[i], out.boxes_cxcywh[i], gt)
               for i in range(out.logits.shape[0])]
    # two-stage: the encoder stage is matched against class-agnostic
    # "binary" targets — every GT label is 0 (ref: deformable_detr.py:375-389
    # bin_targets)
    bin_gt = gt._replace(classes=jnp.zeros_like(gt.classes))
    enc_match = None
    if out.enc_logits is not None:
        enc_match = pad_match(out.enc_logits, out.enc_boxes_cxcywh, bin_gt)

    def loss_fn(o):
        total = 0.0
        aux = {}
        for layer, (mq, mg, mv) in enumerate(matches):
            l = detr_losses(o.logits[layer], o.boxes_cxcywh[layer], gt,
                            mq, mg, mv, image_hw, model.cfg.roi.num_classes)
            for k, v in l.items():
                aux[f"{k}_l{layer}"] = v
                total = total + v
        if enc_match is not None:
            mq, mg, mv = enc_match
            l = detr_losses(o.enc_logits, o.enc_boxes_cxcywh, bin_gt,
                            mq, mg, mv, image_hw, model.cfg.roi.num_classes)
            for k, v in l.items():
                aux[f"{k}_enc"] = v
                total = total + v
        return total, aux

    (total, aux), out_grad = jax.value_and_grad(
        loss_fn, has_aux=True)(out)
    (grads,) = pullback(out_grad)
    return (total, aux), grads


# =========================================================================
# Matching + losses (SetCriterion / HungarianMatcher)
# =========================================================================

def boxes_cxcywh_to_xyxy(b: jax.Array) -> jax.Array:
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)




def matcher_cost_matrix(logits: jax.Array, boxes_cxcywh: jax.Array,
                        gt: GroundTruth, image_hw: Tuple[int, int],
                        cls_weight: float = 2.0, l1_weight: float = 5.0,
                        giou_weight: float = 2.0,
                        focal_alpha: float = 0.25) -> jax.Array:
    """[Q, G] Hungarian cost (ref: models/matcher.py — focal-style class cost
    + L1 on normalized cxcywh + giou)."""
    h, w = image_hw
    prob = jax.nn.sigmoid(logits)                        # [Q, C]
    gt_cls = gt.classes
    p = prob[:, gt_cls]                                  # [Q, G]
    pos_cost = focal_alpha * ((1 - p) ** 2) * (-jnp.log(p + 1e-8))
    neg_cost = (1 - focal_alpha) * (p ** 2) * (-jnp.log(1 - p + 1e-8))
    cost_cls = pos_cost - neg_cost

    scale = jnp.asarray([w, h, w, h], jnp.float32)
    gt_xyxy = gt.boxes / scale
    gt_cxcywh = jnp.stack([
        (gt_xyxy[:, 0] + gt_xyxy[:, 2]) / 2, (gt_xyxy[:, 1] + gt_xyxy[:, 3]) / 2,
        gt_xyxy[:, 2] - gt_xyxy[:, 0], gt_xyxy[:, 3] - gt_xyxy[:, 1]], -1)
    cost_l1 = jnp.sum(jnp.abs(boxes_cxcywh[:, None] - gt_cxcywh[None]), -1)
    cost_giou = -giou_xyxy(boxes_cxcywh_to_xyxy(boxes_cxcywh)[:, None],
                            gt_xyxy[None])
    cost = cls_weight * cost_cls + l1_weight * cost_l1 + giou_weight * cost_giou
    return jnp.where(gt.valid[None, :], cost, 1e9)


def hungarian_match(cost: np.ndarray, gt_valid: np.ndarray
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side assignment. Returns (query_idx, gt_idx) over valid GT."""
    from scipy.optimize import linear_sum_assignment
    g = int(gt_valid.sum())
    if g == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    q_idx, g_idx = linear_sum_assignment(cost[:, :g])
    return q_idx, g_idx


def detr_losses(logits: jax.Array, boxes_cxcywh: jax.Array, gt: GroundTruth,
                match_q: jax.Array, match_g: jax.Array, match_valid: jax.Array,
                image_hw: Tuple[int, int], num_classes: int,
                cls_weight: float = 2.0, l1_weight: float = 5.0,
                giou_weight: float = 2.0, focal_alpha: float = 0.25) -> dict:
    """SetCriterion losses for one decoder layer with a precomputed
    (padded) assignment (ref: deformable_detr.py SetCriterion +
    d2_deformable_detr.py CustomSetCriterion.loss_labels)."""
    q = logits.shape[0]
    h, w = image_hw
    num_boxes = jnp.maximum(jnp.sum(match_valid.astype(jnp.float32)), 1.0)

    # padded (invalid) assignment rows scatter into a dummy slot q
    tgt = jnp.full((q + 1,), num_classes, jnp.int32)
    tgt = tgt.at[jnp.where(match_valid, match_q, q)].set(
        gt.classes[match_g])[:q]
    onehot = jax.nn.one_hot(tgt, num_classes + 1)[:, :num_classes]
    p = jax.nn.sigmoid(logits)
    ce = -(onehot * jnp.log(p + 1e-8) + (1 - onehot) * jnp.log(1 - p + 1e-8))
    p_t = p * onehot + (1 - p) * (1 - onehot)
    focal = ce * ((1 - p_t) ** 2)
    alpha_t = focal_alpha * onehot + (1 - focal_alpha) * (1 - onehot)
    loss_ce = jnp.sum(alpha_t * focal) / num_boxes

    scale = jnp.asarray([w, h, w, h], jnp.float32)
    gt_xyxy = gt.boxes[match_g] / scale
    gt_cxcywh = jnp.stack([
        (gt_xyxy[:, 0] + gt_xyxy[:, 2]) / 2, (gt_xyxy[:, 1] + gt_xyxy[:, 3]) / 2,
        gt_xyxy[:, 2] - gt_xyxy[:, 0], gt_xyxy[:, 3] - gt_xyxy[:, 1]], -1)
    pred = boxes_cxcywh[match_q]
    l1 = jnp.sum(jnp.where(match_valid[:, None],
                           jnp.abs(pred - gt_cxcywh), 0.0)) / num_boxes
    giou = giou_xyxy(boxes_cxcywh_to_xyxy(pred), boxes_cxcywh_to_xyxy(gt_cxcywh))
    loss_giou = jnp.sum(jnp.where(match_valid, 1 - giou, 0.0)) / num_boxes
    return {"loss_ce": cls_weight * loss_ce, "loss_bbox": l1_weight * l1,
            "loss_giou": giou_weight * loss_giou}


def detr_inference(logits: jax.Array, boxes_cxcywh: jax.Array,
                   image_hw: Tuple[int, int], topk: int = 100) -> Detections:
    """ref: d2_deformable_detr.py post-processing — top-k over the flattened
    (query, class) sigmoid scores; boxes shared across classes."""
    h, w = image_hw
    q, c = logits.shape
    scores = jax.nn.sigmoid(logits).reshape(-1)
    top_scores, idx = jax.lax.top_k(scores, min(topk, q * c))
    q_idx = idx // c
    cls = (idx % c).astype(jnp.int32)
    boxes = boxes_cxcywh_to_xyxy(boxes_cxcywh[q_idx]) * \
        jnp.asarray([w, h, w, h], jnp.float32)
    return Detections(boxes=boxes, scores=top_scores, classes=cls,
                      valid=jnp.ones_like(top_scores, bool))
