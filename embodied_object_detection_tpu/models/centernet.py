"""CenterNet proposal generator (ONLY_PROPOSAL + WITH_AGN_HM mode).

ref: third_party/CenterNet2/centernet/modeling/dense_heads/centernet.py and
centernet_head.py. The head is a shared 4-conv tower + per-level scale; decode
replaces the reference's per-image Python candidate filtering
(predict_single_level, centernet.py:651-716) and kthvalue top-k
(nms_and_topK, :719-745) with fixed-shape masked top-k per level + padded NMS.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import CenterNetConfig
from ..ops.nms import nms_padded, topk_padded
from ..structures import Detections
from .layers import GroupNorm


class Scale(nn.Module):
    """Per-level learnable scalar (ref: centernet_head.py:13-19)."""
    @nn.compact
    def __call__(self, x):
        s = self.param("scale", nn.initializers.ones, (1,))
        return x * s.astype(x.dtype)


class CenterNetHead(nn.Module):
    """Shared bbox tower -> (agn heatmap logits, ltrb regression) per level.

    ref: centernet_head.py:21-162. In only_proposal mode the cls tower is
    empty and `cls_logits` is absent; the bbox tower is 4x [3x3 conv 256 +
    GN(32) + ReLU]; `bbox_pred` is a 3x3 conv -> 4 with bias init 8.0 and the
    output ReLU'd after the per-level Scale; `agn_hm` is a 3x3 conv -> 1 with
    focal bias init -log((1-p)/p).
    """
    num_levels: int = 5
    in_channels: int = 256
    num_box_convs: int = 4
    prior_prob: float = 0.01
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, features: Sequence[jax.Array]
                 ) -> Tuple[List[jax.Array], List[jax.Array]]:
        # tower convs init normal(std=0.01), bias 0 (centernet_head.py:92-97)
        convs = [nn.Conv(self.in_channels, (3, 3), padding=1, dtype=self.dtype,
                         kernel_init=nn.initializers.normal(0.01),
                         name=f"bbox_tower_conv{i}")
                 for i in range(self.num_box_convs)]
        norms = [GroupNorm(num_groups=32, name=f"bbox_tower_gn{i}")
                 for i in range(self.num_box_convs)]
        bias_init = -math.log((1 - self.prior_prob) / self.prior_prob)
        agn_hm = nn.Conv(1, (3, 3), padding=1, dtype=jnp.float32,
                         bias_init=nn.initializers.constant(bias_init),
                         kernel_init=nn.initializers.normal(0.01),
                         name="agn_hm")
        bbox_pred = nn.Conv(4, (3, 3), padding=1, dtype=jnp.float32,
                            bias_init=nn.initializers.constant(8.0),
                            kernel_init=nn.initializers.normal(0.01),
                            name="bbox_pred")
        scales = [Scale(name=f"scale{i}") for i in range(self.num_levels)]

        agn_hms, regs = [], []
        for lvl, feat in enumerate(features):
            x = feat
            for conv, norm in zip(convs, norms):
                x = conv(x)
                x = norm(x.astype(jnp.float32)).astype(self.dtype)
                x = nn.relu(x)
            agn_hms.append(agn_hm(x.astype(jnp.float32)))       # [H, W, 1]
            reg = bbox_pred(x.astype(jnp.float32))              # [H, W, 4]
            regs.append(nn.relu(scales[lvl](reg)))
        return agn_hms, regs


def level_grids(shapes: Sequence[Tuple[int, int]], strides: Sequence[int]
                ) -> List[jnp.ndarray]:
    """Per-level [H*W, 2] grid center coordinates.

    ref: centernet.py:321-339 (compute_grids): grid = index*stride + stride//2.
    """
    grids = []
    for (h, w), s in zip(shapes, strides):
        xs = jnp.arange(w, dtype=jnp.float32) * s + s // 2
        ys = jnp.arange(h, dtype=jnp.float32) * s + s // 2
        gx = jnp.broadcast_to(xs[None, :], (h, w))
        gy = jnp.broadcast_to(ys[:, None], (h, w))
        grids.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1))
    return grids


def decode_proposals(agn_hms: Sequence[jax.Array], regs: Sequence[jax.Array],
                     cfg: CenterNetConfig, training: bool = False) -> Detections:
    """Heatmaps + regressions -> top-k NMS'd proposals (fixed shape).

    ref: CenterNet.inference (centernet.py:603-632) + predict_single_level
    (:651-716) + nms_and_topK (:719-745), only_proposal branch:
      * scores = sigmoid(agn heatmap); candidates score > INFERENCE_TH
      * per-level top `pre_nms_topk`
      * boxes = grid -/+ relu(reg) * stride, clamped to >= 0.01 extent
      * final score = sqrt(score) (with_agn_hm)
      * class-agnostic NMS at 0.9, keep top `post_nms_topk`

    Known micro-divergence (fixed shapes): the reference's post-NMS filter
    keeps scores >= kthvalue (:736-741), so EXACT score ties at the cut
    can keep more than post_nms_topk proposals; the padded top-k here
    keeps exactly post_nms_topk. Ties require bit-equal sigmoid outputs —
    duplicate heatmap plateaus — and surface at most on the cut boundary.
    """
    pre_topk = cfg.pre_nms_topk_train if training else cfg.pre_nms_topk_test
    post_topk = cfg.post_nms_topk_train if training else cfg.post_nms_topk_test
    nms_thresh = cfg.nms_thresh_train if training else cfg.nms_thresh_test

    shapes = [(hm.shape[0], hm.shape[1]) for hm in agn_hms]
    grids = level_grids(shapes, cfg.strides)

    all_boxes, all_scores, all_valid = [], [], []
    for hm, reg, grid, stride in zip(agn_hms, regs, grids, cfg.strides):
        scores = jax.nn.sigmoid(hm.reshape(-1).astype(jnp.float32))     # [HW]
        reg = reg.reshape(-1, 4).astype(jnp.float32) * stride
        k = min(pre_topk, scores.shape[0])
        top_scores, top_idx = jax.lax.top_k(scores, k)
        valid = top_scores > cfg.score_thresh
        g = grid[top_idx]
        r = reg[top_idx]
        x1 = g[:, 0] - r[:, 0]
        y1 = g[:, 1] - r[:, 1]
        x2 = jnp.maximum(g[:, 0] + r[:, 2], x1 + 0.01)
        y2 = jnp.maximum(g[:, 1] + r[:, 3], y1 + 0.01)
        all_boxes.append(jnp.stack([x1, y1, x2, y2], axis=-1))
        all_scores.append(jnp.sqrt(top_scores))
        all_valid.append(valid)

    boxes = jnp.concatenate(all_boxes, axis=0)
    scores = jnp.concatenate(all_scores, axis=0)
    valid = jnp.concatenate(all_valid, axis=0)
    cap = cfg.nms_candidate_cap
    if cap:
        # the cap is a pure NMS-cost optimization (ARCHITECTURE divergence
        # #2) — it must never truncate below the requested output size
        # (post_nms_topk_train=2000 > the 1024 default cap at train time)
        cap = max(cap, post_topk)
    if cap and cap < boxes.shape[0]:
        key = jnp.where(valid, scores, -1e10)
        _, keep = jax.lax.top_k(key, cap)
        boxes, scores, valid = boxes[keep], scores[keep], valid[keep]
    if cfg.not_nms:
        # ref: CENTERNET.NOT_NMS — skip suppression, keep raw top-k
        # (topk_padded tolerates post_topk > candidate count, padding
        # with valid=False rows)
        key = jnp.where(valid, scores, -1e10)
        top_scores, out_valid, (top_boxes,) = topk_padded(
            key, post_topk, boxes)
        return Detections(boxes=jnp.where(out_valid[:, None], top_boxes, 0.0),
                          scores=jnp.where(out_valid, top_scores, 0.0),
                          classes=jnp.zeros((post_topk,), jnp.int32),
                          valid=out_valid)
    return nms_padded(boxes, scores, valid, nms_thresh, post_topk,
                      ml_nms_semantics=True)
