"""Training losses: CenterNet heatmap/regression + cascade R-CNN stages.

ref: third_party/CenterNet2/centernet/modeling/dense_heads/centernet.py
(_get_ground_truth :342-440, _get_label_inds :443-491, losses :241-318),
layers/heatmap_focal_loss.py, layers/iou_loss.py, and
detic/modeling/roi_heads/detic_fast_rcnn.py (losses :157-300).

All formulations are masked fixed-shape re-expressions of the reference's
dynamic-shape indexing: ground-truth boxes are padded to [G] with a valid
mask, FPN locations are a fixed [M], and every gather/select becomes a
where/argmin over the [M, G] interaction matrix.
"""

from __future__ import annotations

import math
from typing import List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import CenterNetConfig, ROIHeadsConfig
from ..structures import Detections, GroundTruth, giou_xyxy, pairwise_iou
from .centernet import level_grids
from .roi_heads import apply_deltas, get_deltas

INF = 1e8


# =========================================================================
# CenterNet ground truth assignment (only_proposal mode)
# =========================================================================

class CenterNetTargets(NamedTuple):
    agn_heatmap: jax.Array     # [M] gaussian-ish heatmap
    reg_targets: jax.Array     # [M, 4] ltrb in stride units; -INF where invalid
    pos_count: jax.Array       # [M] int32 — peak-positive multiplicity
                               # (two GTs sharing a cell count twice:
                               # _get_label_inds concatenates one index
                               # per cared (gt,level) pair with no
                               # unique(), centernet.py:483-491)


def centernet_targets(gt: GroundTruth, shapes: Sequence[Tuple[int, int]],
                      cfg: CenterNetConfig) -> CenterNetTargets:
    """ref: CenterNet._get_ground_truth (centernet.py:342-440) +
    _get_label_inds (:443-491), agnostic branch."""
    grids_per_level = level_grids(shapes, cfg.strides)
    grids = jnp.concatenate(grids_per_level, axis=0)              # [M, 2]
    m = grids.shape[0]
    num_loc = [h * w for h, w in shapes]
    strides = jnp.concatenate([jnp.full((n,), s, jnp.float32)
                               for n, s in zip(num_loc, cfg.strides)])
    size_ranges = jnp.concatenate([
        jnp.tile(jnp.asarray(r, jnp.float32)[None, :], (n, 1))
        for n, r in zip(num_loc, cfg.sizes_of_interest)])          # [M, 2]

    boxes = gt.boxes                                               # [G, 4]
    g = boxes.shape[0]
    valid = gt.valid
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * \
           jnp.maximum(boxes[:, 3] - boxes[:, 1], 0)

    l = grids[:, 0:1] - boxes[None, :, 0]                          # [M, G]
    t = grids[:, 1:2] - boxes[None, :, 1]
    r = boxes[None, :, 2] - grids[:, 0:1]
    b = boxes[None, :, 3] - grids[:, 1:2]
    reg = jnp.stack([l, t, r, b], axis=-1)                         # [M, G, 4]

    centers = (boxes[:, :2] + boxes[:, 2:]) / 2                    # [G, 2]
    s_m = strides[:, None, None]                                   # [M, 1, 1]
    centers_discret = (jnp.floor(centers[None] / s_m) * s_m + s_m / 2)  # [M,G,2]

    is_peak = jnp.sum((grids[:, None, :] - centers_discret) ** 2, -1) == 0
    is_in_boxes = jnp.min(reg, axis=-1) > 0
    dist_xy = jnp.abs(grids[:, None, :] - centers_discret)
    is_center3x3 = (dist_xy[..., 0] <= strides[:, None]) & \
                   (dist_xy[..., 1] <= strides[:, None]) & is_in_boxes
    crit = jnp.sqrt(jnp.sum((reg[..., :2] + reg[..., 2:]) ** 2, -1)) / 2
    is_cared = (crit >= size_ranges[:, 0:1]) & (crit <= size_ranges[:, 1:2])
    reg_mask = is_center3x3 & is_cared & valid[None, :]

    dist2 = jnp.sum((grids[:, None, :] - centers[None]) ** 2, -1)  # [M, G]
    dist2 = jnp.where(is_peak, 0.0, dist2)
    delta = (1 - cfg.hm_min_overlap) / (1 + cfg.hm_min_overlap)
    radius2 = jnp.maximum(delta ** 2 * 2 * area, cfg.min_radius ** 2)
    wdist2 = dist2 / jnp.maximum(radius2[None, :], 1e-12)          # [M, G]
    wdist2 = jnp.where(valid[None, :], wdist2, INF)

    # regression target: nearest (weighted) center among reg_mask'd gts
    wd_reg = jnp.where(reg_mask, wdist2, INF)
    min_idx = jnp.argmin(wd_reg, axis=1)                            # [M]
    min_dist = jnp.min(wd_reg, axis=1)
    reg_targets = jnp.take_along_axis(
        reg, min_idx[:, None, None].repeat(4, -1), axis=1)[:, 0, :]
    reg_targets = jnp.where((min_dist < INF)[:, None], reg_targets, -INF)
    # normalize by per-location stride (ref: centernet.py:435-436)
    reg_targets = jnp.where(reg_targets <= -INF / 2, reg_targets,
                            reg_targets / strides[:, None])

    # agnostic heatmap: exp(-min wdist2) zeroed below 1e-4
    # (ref: _create_agn_heatmaps_from_dist, centernet.py:559-570)
    hm = jnp.exp(-jnp.min(wdist2, axis=1))
    hm = jnp.where(hm < 1e-4, 0.0, hm)
    hm = jnp.where(jnp.any(valid), hm, jnp.zeros_like(hm))

    # peak positives (ref: _get_label_inds): per gt x level, the discretized
    # center cell, if the box diag/2 falls in the level size range.
    level_bases = []
    base = 0
    for n in num_loc:
        level_bases.append(base)
        base += n
    diag = jnp.sqrt(jnp.sum((boxes[:, 2:] - boxes[:, :2]) ** 2, -1)) / 2  # [G]
    pos_count = jnp.zeros((m,), jnp.int32)
    for lvl, ((h, w), stride, rng_) in enumerate(
            zip(shapes, cfg.strides, cfg.sizes_of_interest)):
        cx = (centers[:, 0] / stride).astype(jnp.int32)
        cy = (centers[:, 1] / stride).astype(jnp.int32)
        inside = (cx >= 0) & (cx < w) & (cy >= 0) & (cy < h)
        cared = (diag >= rng_[0]) & (diag <= rng_[1]) & valid & inside
        flat = level_bases[lvl] + jnp.clip(cy, 0, h - 1) * w + jnp.clip(cx, 0, w - 1)
        pos_count = pos_count.at[flat].add(cared.astype(jnp.int32))
    return CenterNetTargets(agn_heatmap=hm, reg_targets=reg_targets,
                            pos_count=pos_count)


def binary_heatmap_focal_loss(logits: jax.Array, targets: jax.Array,
                              pos_count: jax.Array, cfg: CenterNetConfig
                              ) -> Tuple[jax.Array, jax.Array]:
    """ref: layers/heatmap_focal_loss.py:51-85 (binary variant).

    Returns (pos_loss_sum, neg_loss_sum) — the caller normalizes by the
    cross-device positive count (centernet.py:258-281)."""
    pred = jnp.clip(jax.nn.sigmoid(logits), cfg.sigmoid_clamp,
                    1 - cfg.sigmoid_clamp)
    neg_weights = jnp.power(1 - targets, cfg.hm_focal_beta)
    pos_loss = jnp.log(pred) * jnp.power(1 - pred, cfg.loss_gamma)
    # duplicates contribute once per (gt,level) assignment — weight by
    # multiplicity, matching pred[pos_inds] gathering repeated indices
    pos_loss = jnp.sum(pos_loss * pos_count.astype(pos_loss.dtype))
    neg_loss = jnp.log(1 - pred) * jnp.power(pred, cfg.loss_gamma) * neg_weights
    if cfg.ignore_high_fp > 0:
        neg_loss = neg_loss * (pred < cfg.ignore_high_fp)
    neg_loss = jnp.sum(neg_loss)
    if cfg.hm_focal_alpha >= 0:
        pos_loss = cfg.hm_focal_alpha * pos_loss
        neg_loss = (1 - cfg.hm_focal_alpha) * neg_loss
    return -pos_loss, -neg_loss


class MorePos(NamedTuple):
    """Extra positive assignment (ref: centernet.py:748-878 _add_more_pos /
    _get_c33_inds). pos_inds are flat heatmap locations over all levels;
    invalid slots carry pos_valid=False (the reference's variable-length
    pos_inds list, padded to G*L*9)."""
    pos_inds: jax.Array    # [G*L*9] int32
    pos_valid: jax.Array   # [G*L*9] bool
    labels: jax.Array      # [G*L*9] int32 gt class (for the class branch)


def add_more_pos(reg_pred_flat: jax.Array, gt: GroundTruth,
                 shapes: Sequence[Tuple[int, int]],
                 cfg: CenterNetConfig) -> MorePos:
    """MORE_POS: mark center-3x3 cells whose (no-grad) regression loss is
    below min(kth-smallest, more_pos_thresh) as positives.

    ref: centernet.py:748-878. Fixed-shape re-expression: the per-image
    python loop and concatenations become masked [G, L, 9] tensors.
    """
    k9 = 9
    levels = len(cfg.strides)
    g = gt.boxes.shape[0]
    boxes = gt.boxes
    strides = jnp.asarray(cfg.strides, jnp.float32)               # [L]
    hs = jnp.asarray([h for h, _ in shapes], jnp.int32)
    ws = jnp.asarray([w for _, w in shapes], jnp.int32)
    num_loc = [h * w for h, w in shapes]
    m = sum(num_loc)
    bases = []
    base = 0
    for n in num_loc:
        bases.append(base)
        base += n
    bases = jnp.asarray(bases, jnp.int32)                          # [L]

    centers = (boxes[:, :2] + boxes[:, 2:]) / 2                    # [G, 2]
    centers_inds = jnp.floor(centers[:, None, :] /
                             strides[None, :, None])               # [G, L, 2]
    center_grids = centers_inds * strides[None, :, None] + \
        jnp.floor(strides / 2)[None, :, None]                      # [G, L, 2]
    l = center_grids[..., 0] - boxes[:, None, 0]
    t = center_grids[..., 1] - boxes[:, None, 1]
    r = boxes[:, None, 2] - center_grids[..., 0]
    b = boxes[:, None, 3] - center_grids[..., 1]
    reg = jnp.stack([l, t, r, b], -1) / strides[None, :, None]     # [G, L, 4]

    # level mask: center-reg nonnegative AND the box's FPN level
    # (assign_fpn_level: diag/2 in the level size range)
    diag = jnp.sqrt(jnp.sum((boxes[:, 2:] - boxes[:, :2]) ** 2, -1)) / 2
    ranges = jnp.asarray(cfg.sizes_of_interest, jnp.float32)       # [L, 2]
    level_mask = (jnp.min(reg, -1) >= 0) & \
        (diag[:, None] >= ranges[None, :, 0]) & \
        (diag[:, None] <= ranges[None, :, 1]) & gt.valid[:, None]  # [G, L]

    dx = jnp.asarray([-1, 0, 1, -1, 0, 1, -1, 0, 1], jnp.float32)
    dy = jnp.asarray([-1, -1, -1, 0, 0, 0, 1, 1, 1], jnp.float32)
    ci = centers_inds.astype(jnp.int32)
    nx = ci[..., 0:1] + dx.astype(jnp.int32)                       # [G, L, 9]
    ny = ci[..., 1:2] + dy.astype(jnp.int32)
    in_bounds = (nx >= 0) & (nx < ws[None, :, None]) & \
                (ny >= 0) & (ny < hs[None, :, None])
    c33_ind = bases[None, :, None] + ny * ws[None, :, None] + nx   # [G, L, 9]

    # shifted ltrb targets for each neighbor (stride units):
    # l+dx, t+dy, r-dx, b-dy (ref: c33_reg index surgery, centernet.py:852-860)
    shift = jnp.stack([dx, dy, -dx, -dy], -1)                      # [9, 4]
    c33_reg = reg[:, :, None, :] + shift[None, None]               # [G, L, 9, 4]
    c33_mask = in_bounds & (jnp.min(c33_reg, -1) >= 0)

    pred = jax.lax.stop_gradient(
        reg_pred_flat[jnp.clip(c33_ind, 0, m - 1)])                # [G, L, 9, 4]
    loss = giou_loss_ltrb(pred.reshape(-1, 4),
                          jnp.maximum(c33_reg, 0.0).reshape(-1, 4))
    loss = loss.reshape(g, levels, k9)
    loss = jnp.where(c33_mask, loss, INF)
    # the true center (k=4) costs 0 wherever the level is assigned
    loss = loss.at[:, :, 4].set(jnp.where(level_mask, 0.0, loss[:, :, 4]))

    flat_loss = loss.reshape(g, levels * k9)
    kth = jnp.sort(flat_loss, axis=1)[:, cfg.more_pos_topk - 1]    # [G]
    thresh = jnp.minimum(kth, cfg.more_pos_thresh)
    new_pos = (loss < thresh[:, None, None]) & gt.valid[:, None, None]

    return MorePos(
        pos_inds=jnp.clip(c33_ind, 0, m - 1).reshape(-1).astype(jnp.int32),
        pos_valid=new_pos.reshape(-1),
        labels=jnp.broadcast_to(gt.classes[:, None, None],
                                (g, levels, k9)).reshape(-1))


def binary_heatmap_focal_loss_indexed(logits: jax.Array, targets: jax.Array,
                                      pos_inds: jax.Array, pos_valid: jax.Array,
                                      cfg: CenterNetConfig
                                      ) -> Tuple[jax.Array, jax.Array]:
    """Index-based positive term (the reference's `pred[pos_inds]` gather,
    heatmap_focal_loss.py:70-73) — duplicate indices contribute repeated
    terms, unlike the mask form. Negative term is identical."""
    pred = jnp.clip(jax.nn.sigmoid(logits), cfg.sigmoid_clamp,
                    1 - cfg.sigmoid_clamp)
    neg_weights = jnp.power(1 - targets, cfg.hm_focal_beta)
    pos_pred = pred[pos_inds]
    pos_loss = jnp.log(pos_pred) * jnp.power(1 - pos_pred, cfg.loss_gamma)
    pos_loss = jnp.sum(jnp.where(pos_valid, pos_loss, 0.0))
    neg_loss = jnp.log(1 - pred) * jnp.power(pred, cfg.loss_gamma) * neg_weights
    if cfg.ignore_high_fp > 0:
        neg_loss = neg_loss * (pred < cfg.ignore_high_fp)
    neg_loss = jnp.sum(neg_loss)
    if cfg.hm_focal_alpha >= 0:
        pos_loss = cfg.hm_focal_alpha * pos_loss
        neg_loss = (1 - cfg.hm_focal_alpha) * neg_loss
    return -pos_loss, -neg_loss


def giou_loss_ltrb(pred: jax.Array, target: jax.Array) -> jax.Array:
    """gIoU on ltrb distances (ref: layers/iou_loss.py:5-63, 'giou')."""
    pl, pt, pr, pb = pred[:, 0], pred[:, 1], pred[:, 2], pred[:, 3]
    tl, tt, tr, tb = target[:, 0], target[:, 1], target[:, 2], target[:, 3]
    t_area = (tl + tr) * (tt + tb)
    p_area = (pl + pr) * (pt + pb)
    w_i = jnp.minimum(pl, tl) + jnp.minimum(pr, tr)
    h_i = jnp.minimum(pb, tb) + jnp.minimum(pt, tt)
    gw_i = jnp.maximum(pl, tl) + jnp.maximum(pr, tr)
    gh_i = jnp.maximum(pb, tb) + jnp.maximum(pt, tt)
    ac_union = gw_i * gh_i
    inter = w_i * h_i
    union = t_area + p_area - inter
    ious = (inter + 1.0) / (union + 1.0)
    gious = ious - (ac_union - union) / jnp.maximum(ac_union, 1e-12)
    return 1 - gious


class CenterNetRawLosses(NamedTuple):
    """Unnormalized weighted loss sums + the counts the reference divides by.

    ref: centernet.py:257-299 — `num_pos_avg` is the cross-GPU mean positive
    count (reduce_sum / num_gpus, :258-265) and `reg_norm` the cross-GPU mean
    regression-location count (:291-293, NOT_NORM_REG branch). Keeping the
    sums raw lets the batch step normalize by the batch-GLOBAL means, which
    is the TPU-native analog of the reference's per-frame NCCL reduce_sum."""
    pos: jax.Array       # pos_weight * focal pos sum
    neg: jax.Array       # neg_weight * focal neg sum
    loc: jax.Array       # reg_weight * gIoU sum
    num_pos: jax.Array   # local positive-location count
    reg_cnt: jax.Array   # local regression-location count


def centernet_raw_losses(agn_logits_flat: jax.Array, reg_pred_flat: jax.Array,
                         targets: CenterNetTargets, cfg: CenterNetConfig,
                         more_pos: "MorePos | None" = None
                         ) -> CenterNetRawLosses:
    """ref: CenterNet.losses (centernet.py:241-318), only_proposal branch —
    everything except the division by the cross-device-averaged counts.

    agn_logits_flat [M], reg_pred_flat [M, 4] (stride-normalized, relu'd).
    With `more_pos`, the positive set comes from the MORE_POS assignment
    (centernet.py:203-208) instead of targets.pos_count."""
    if more_pos is not None:
        pos_loss, neg_loss = binary_heatmap_focal_loss_indexed(
            agn_logits_flat, targets.agn_heatmap, more_pos.pos_inds,
            more_pos.pos_valid, cfg)
        num_pos = jnp.sum(more_pos.pos_valid.astype(jnp.float32))
    else:
        pos_loss, neg_loss = binary_heatmap_focal_loss(
            agn_logits_flat, targets.agn_heatmap, targets.pos_count, cfg)
        num_pos = jnp.sum(targets.pos_count.astype(jnp.float32))
    reg_valid = jnp.max(targets.reg_targets, axis=1) >= 0
    reg_cnt = jnp.sum(reg_valid.astype(jnp.float32))
    per_loc = giou_loss_ltrb(reg_pred_flat,
                             jnp.where(reg_valid[:, None],
                                       targets.reg_targets, 0.0))
    reg_loss = jnp.sum(jnp.where(reg_valid, per_loc, 0.0))
    return CenterNetRawLosses(pos=cfg.pos_weight * pos_loss,
                              neg=cfg.neg_weight * neg_loss,
                              loc=cfg.reg_weight * reg_loss,
                              num_pos=num_pos, reg_cnt=reg_cnt)


def centernet_normalize(raw: CenterNetRawLosses, num_pos_avg: jax.Array,
                        reg_norm: jax.Array) -> dict:
    """Divide raw sums by the (batch/cross-device-averaged) counts.

    ref: centernet.py:265 `num_pos_avg = max(total_num_pos / num_gpus, 1.0)`
    and :293 `reg_norm = max(reduce_sum(...) / num_gpus, 1)`."""
    num_pos_avg = jnp.maximum(num_pos_avg, 1.0)
    reg_norm = jnp.maximum(reg_norm, 1.0)
    return {
        "loss_centernet_agn_pos": raw.pos / num_pos_avg,
        "loss_centernet_agn_neg": raw.neg / num_pos_avg,
        "loss_centernet_loc": raw.loc / reg_norm,
    }


def centernet_losses(agn_logits_flat: jax.Array, reg_pred_flat: jax.Array,
                     targets: CenterNetTargets, cfg: CenterNetConfig,
                     num_pos_avg: jax.Array,
                     more_pos: "MorePos | None" = None) -> dict:
    """ref: CenterNet.losses (centernet.py:241-318), only_proposal branch.

    agn_logits_flat [M], reg_pred_flat [M, 4] (stride-normalized, relu'd),
    num_pos_avg: cross-device-averaged positive count (pass the local count
    on one device — or use centernet_raw_losses + centernet_normalize at the
    batch level for the reference's cross-device semantics). With `more_pos`,
    the positive set comes from the MORE_POS assignment (centernet.py:203-208)
    instead of targets.pos_count."""
    raw = centernet_raw_losses(agn_logits_flat, reg_pred_flat, targets, cfg,
                               more_pos=more_pos)
    return centernet_normalize(raw, num_pos_avg, raw.reg_cnt)


# =========================================================================
# Cascade R-CNN stage losses
# =========================================================================

class MatchedProposals(NamedTuple):
    boxes: jax.Array        # [R, 4]
    gt_boxes: jax.Array     # [R, 4] matched gt (or proposal itself for bg)
    gt_classes: jax.Array   # [R] in [0, C]; C == background
    valid: jax.Array        # [R]


def match_proposals(boxes: jax.Array, valid: jax.Array, gt: GroundTruth,
                    iou_threshold: float, num_classes: int) -> MatchedProposals:
    """detectron2 Matcher with a single threshold, labels (0, 1) — fg iff
    max IoU >= threshold (ref: CascadeROIHeads._match_and_label_boxes)."""
    iou = pairwise_iou(boxes, gt.boxes)                     # [R, G]
    iou = jnp.where(gt.valid[None, :], iou, -1.0)
    best = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)
    fg = best_iou >= iou_threshold
    g_boxes = gt.boxes[best]
    g_classes = jnp.where(fg, gt.classes[best], num_classes)
    # background rows regress nothing; keep proposal box as dummy target
    g_boxes = jnp.where(fg[:, None], g_boxes, boxes)
    return MatchedProposals(boxes=boxes, gt_boxes=g_boxes,
                            gt_classes=jnp.where(valid, g_classes, num_classes),
                            valid=valid)


def add_gt_to_proposals(proposals: Detections, gt: GroundTruth) -> Detections:
    """ref: detectron2 add_ground_truth_to_proposals via
    label_and_sample_proposals (detic_roi_heads.py:236-238) — GT boxes are
    appended with near-1 objectness (logit ~23; after the sqrt-score
    convention the reference's memory write filters them with score < 1,
    custom_rcnn.py:837-844 — we give them score exactly 1)."""
    boxes = jnp.concatenate([proposals.boxes, gt.boxes], axis=0)
    scores = jnp.concatenate([proposals.scores,
                              jnp.where(gt.valid, 1.0, 0.0)], axis=0)
    classes = jnp.concatenate(
        [proposals.classes, jnp.zeros_like(gt.classes)], axis=0)
    valid = jnp.concatenate([proposals.valid, gt.valid], axis=0)
    return Detections(boxes=boxes, scores=scores, classes=classes, valid=valid)


def sample_proposals(valid: jax.Array, fg: jax.Array, batch_size: int,
                     positive_fraction: float, rng: jax.Array):
    """detectron2 `subsample_labels` as fixed-shape masked top-k.

    ref: ROIHeads.label_and_sample_proposals -> subsample_labels
    (detectron2 roi_heads.py / sampling.py): sample up to
    batch_size*positive_fraction foreground rows uniformly, fill the
    rest of `batch_size` with uniform background rows. Returns
    (idx [batch_size], keep_valid [batch_size]) selecting rows of the
    padded proposal set; keep_valid masks slots that had no candidate.
    """
    n = valid.shape[0]
    num_pos_cap = int(batch_size * positive_fraction)
    r = jax.random.uniform(rng, (n,))
    pos = fg & valid
    # pick <=num_pos_cap positives uniformly
    pos_key = jnp.where(pos, r, -1.0)
    _, pos_idx = jax.lax.top_k(pos_key, min(num_pos_cap, n))
    pos_sel = jnp.zeros((n,), bool).at[pos_idx].set(True) & pos
    # positives rank above every negative; negatives fill the remainder
    neg_key = jnp.where(valid & ~pos, r, -1.0)
    final_key = jnp.where(pos_sel, 2.0 + r, neg_key)
    _, idx = jax.lax.top_k(final_key, min(batch_size, n))
    # >= 0: a negative whose uniform key is exactly 0.0 is still a sampled
    # row (invalid slots sit at -1.0); a strict > would drop it, training
    # on batch_size-1 rows where subsample_labels never drops an index
    keep_valid = jnp.take(final_key, idx) >= 0.0
    return idx, keep_valid


def fed_loss_class_weight(gt_classes: jax.Array, valid: jax.Array,
                          freq_weight: jax.Array, num_sample_cats: int,
                          num_classes: int, rng: jax.Array) -> jax.Array:
    """Federated-loss class mask: appeared GT classes + frequency-weighted
    random extras, fixed shape.

    ref: get_fed_loss_inds (detic/modeling/utils.py:16-29). `gt_classes` are
    the matched-proposal classes in [0, C] (C = background), so — exactly as
    in the reference's torch.unique over them — an appearing background class
    consumes one of the `num_sample_cats` slots but is excluded from the
    returned foreground mask. torch.multinomial without replacement over the
    frequency weights (appeared classes zeroed) is realized as a Gumbel
    top-k over log-frequencies — the Gumbel-max trick makes the two sampling
    distributions identical. If #appeared >= num_sample_cats no extras are
    drawn (the reference's `if len(appeared) < num_sample_cats` branch).
    Returns a [C] 0/1 weight.
    """
    c = num_classes
    # scatter True at every valid row's class (bg rows land on index c;
    # invalid rows are routed out of range and dropped)
    appeared_full = jnp.zeros((c + 1,), bool).at[
        jnp.where(valid, gt_classes, 2 * (c + 1))].set(True, mode="drop")
    appeared = appeared_full[:c]
    n_app = jnp.sum(appeared_full.astype(jnp.int32))
    k_extra = jnp.clip(num_sample_cats - n_app, 0, c)

    # zero-frequency classes get -inf keys: torch.multinomial assigns them
    # probability exactly 0 (and errors if asked for more samples than
    # positive-weight entries — we degrade to "all eligible" instead, with
    # a loud static check at train-build time in engine/train.py)
    logw = jnp.where(freq_weight[:c] > 0,
                     jnp.log(jnp.maximum(freq_weight[:c], 1e-20)), -jnp.inf)
    gumbel = -jnp.log(-jnp.log(
        jax.random.uniform(rng, (c,), minval=1e-10, maxval=1.0)))
    # extras drawn only among non-appeared, positive-frequency classes
    key = jnp.where(appeared, -jnp.inf, logw + gumbel)
    sorted_desc = -jnp.sort(-key)
    cut = sorted_desc[jnp.clip(k_extra - 1, 0, c - 1)]
    extras = (key >= cut) & (k_extra > 0) & jnp.isfinite(key)
    return (appeared | extras).astype(jnp.float32)


def image_label_loss(logits: jax.Array, boxes: jax.Array, valid: jax.Array,
                     labels: jax.Array, labels_valid: jax.Array,
                     num_classes: int, variant: str = "max_size",
                     image_loss_weight: float = 0.1,
                     prop_logits: "jax.Array | None" = None) -> jax.Array:
    """Weak supervision from image-level labels (vanilla-Detic co-training).

    ref: DeticFastRCNNOutputLayers.image_label_losses + the selection
    variants (detic_fast_rcnn.py:342-434, 509-581). For each image label,
    pick one proposal and apply BCE on its full class row:
      max_size:  the largest proposal (ref :567-581, Detic's headline choice)
      max_score: the proposal scoring highest for that label (:524-531)
      first:     proposal 0 (:547-554)
      image:     the whole-image box appended last (:557-564)
      min_loss:  the proposal whose (no-grad) full-row BCE is smallest
                 (:534-545)
      wsddn/wsod: WSDDN MIL — sigmoid(scores) * softmax-over-proposals of a
                 second `prop_logits` head, summed over proposals, BCE on the
                 image-level score (:509-522; requires prop_logits from the
                 WITH_SOFTMAX_PROP head, detic_fast_rcnn.py:118-125)
    Returns the scalar weighted loss (loss / num_labels * weight as in
    :400,418,432).
    """
    c = num_classes
    r = logits.shape[0]
    areas = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * \
        jnp.maximum(boxes[:, 3] - boxes[:, 1], 0)
    areas = jnp.where(valid, areas, -1.0)

    if variant in ("wsddn", "wsod"):
        assert prop_logits is not None, "wsddn needs the softmax-prop head"
        # softmax over *proposals* per class; padded rows masked out
        pl = jnp.where(valid[:, None], prop_logits, -1e10)
        final = jax.nn.sigmoid(logits) * jax.nn.softmax(pl, axis=0)
        # the reference clamps to 1-1e-10, which is exactly 1.0 in f32 (its
        # torch BCE additionally clamps the logs); use an f32-representable
        # upper bound instead
        img_score = jnp.clip(jnp.sum(jnp.where(valid[:, None], final, 0.0),
                                     axis=0), 1e-10, 1 - 1e-7)    # [C+1]

        def per_label_wsddn(label, lvalid):
            target = jax.nn.one_hot(label, c + 1)
            # F.binary_cross_entropy default reduction: mean over C+1
            bce = -(target * jnp.log(img_score) +
                    (1 - target) * jnp.log(1 - img_score))
            return jnp.where(lvalid, jnp.mean(bce), 0.0)

        losses = jax.vmap(per_label_wsddn)(labels, labels_valid)
        n = jnp.maximum(jnp.sum(labels_valid.astype(jnp.float32)), 1.0)
        return jnp.sum(losses) / n * image_loss_weight

    def per_label(label, lvalid):
        target = jax.nn.one_hot(label, c + 1)
        if variant == "max_size":
            # ref :572 — argmax of sizes excluding the appended image box
            ind = jnp.argmax(areas.at[r - 1].set(-1.0))
        elif variant == "max_score":
            score_col = jnp.where(valid, logits[:, label], -1e10)
            ind = jnp.argmax(score_col)
        elif variant == "first":
            ind = 0
        elif variant == "image":
            ind = r - 1
        elif variant == "min_loss":
            # ref :534-545 — no-grad full-row BCE per proposal, take argmin
            t_all = jnp.broadcast_to(target[None], logits.shape)
            bce_all = jnp.maximum(logits, 0) - logits * t_all + \
                jnp.log1p(jnp.exp(-jnp.abs(logits)))
            row_loss = jnp.where(valid, jnp.sum(bce_all, axis=1), 1e10)
            ind = jnp.argmin(jax.lax.stop_gradient(row_loss))
        else:
            raise ValueError(variant)
        row = logits[ind]
        bce = jnp.maximum(row, 0) - row * target + \
            jnp.log1p(jnp.exp(-jnp.abs(row)))
        return jnp.where(lvalid, jnp.sum(bce), 0.0)

    losses = jax.vmap(per_label)(labels, labels_valid)
    n = jnp.maximum(jnp.sum(labels_valid.astype(jnp.float32)), 1.0)
    return jnp.sum(losses) / n * image_loss_weight


def caption_loss(region_embeddings: jax.Array, caption_features: jax.Array,
                 image_index: int, norm_temperature: float = 50.0,
                 neg_cap_weight: float = 1.0,
                 caption_valid: "jax.Array | None" = None) -> jax.Array:
    """Region-caption contrastive loss (Detic caption co-training).

    ref: DeticFastRCNNOutputLayers._caption_loss (detic_fast_rcnn.py:469-506):
    the image-level box's CLIP-space embedding is scored against every
    caption embedding in the (possibly cross-device all-gathered) batch; BCE
    with the own-caption as the positive, negatives down-weighted by
    neg_cap_weight.

    region_embeddings: [R, D] (the image box is the LAST row, ref
    :477 `caption_score[-1:]`); caption_features: [B, D] text-encoder
    outputs; image_index: this image's position in the caption batch.
    caption_valid [B] masks divisibility-padding rows out of the negative
    set (the reference all-gathers only real captions,
    custom_rcnn.py:294-307; a repeated-sample pad would otherwise become
    a hard negative against its own duplicate).
    """
    emb = region_embeddings[-1]
    emb = norm_temperature * emb / jnp.maximum(jnp.linalg.norm(emb), 1e-12)
    # fp32 like every zs_weight-style CLIP-space contraction (the
    # reference computes caption scores in fp32; see roi_heads.py:108)
    scores = jnp.dot(caption_features, emb,
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)     # [B]
    b = scores.shape[0]
    target = jax.nn.one_hot(image_index, b)
    bce = jnp.maximum(scores, 0) - scores * target + \
        jnp.log1p(jnp.exp(-jnp.abs(scores)))
    valid = jnp.ones((b,)) if caption_valid is None \
        else caption_valid.astype(bce.dtype)
    pos = jnp.sum(bce * target)
    neg = jnp.sum(bce * (1 - target) * valid)
    return pos + neg_cap_weight * neg


def softmax_cross_entropy_loss(logits: jax.Array, gt_classes: jax.Array,
                               valid: jax.Array, num_classes: int) -> jax.Array:
    """The USE_SIGMOID_CE=False variant (ref: detic_fast_rcnn.py:236-266,
    plain branch): mean softmax CE over C+1 classes incl. background."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, gt_classes[:, None], axis=1)[:, 0]
    n = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    return -jnp.sum(jnp.where(valid, picked, 0.0)) / n


def stage_losses(logits: jax.Array, deltas: jax.Array,
                 matched: MatchedProposals, reg_weights: Tuple[float, ...],
                 num_classes: int,
                 class_weight: "jax.Array | None" = None,
                 use_sigmoid_ce: bool = True) -> dict:
    """ref: DeticFastRCNNOutputLayers.losses (detic_fast_rcnn.py:157-300),
    cls-agnostic gIoU box regression.

    use_sigmoid_ce=True (USE_SIGMOID_CE, the Detic default):
      loss_cls = sum(BCE(logits[:, :C], onehot) * class_weight) / B
      with `class_weight` a [C] 0/1 federated-loss mask
      (detic_fast_rcnn.py:201-233).
    use_sigmoid_ce=False (plain softmax branch, :236-266):
      torch F.cross_entropy over C+1 incl. background with optional per-class
      weights [C] (background weight fixed to 1, :258-262) and torch's
      weighted-mean reduction sum(w[y_i]*ce_i)/sum(w[y_i]).

    loss_box_reg = sum(giou(apply_deltas(fg), gt_fg)) / B
    (B = number of valid proposals)."""
    c = num_classes
    b = jnp.maximum(jnp.sum(matched.valid.astype(jnp.float32)), 1.0)
    if use_sigmoid_ce:
        onehot = jax.nn.one_hot(matched.gt_classes, c + 1)[:, :c]
        logit_fg = logits[:, :c]
        bce = jnp.maximum(logit_fg, 0) - logit_fg * onehot + \
            jnp.log1p(jnp.exp(-jnp.abs(logit_fg)))
        if class_weight is not None:
            # federated loss: only sampled classes contribute
            # (ref: detic_fast_rcnn.py:214-224)
            bce = bce * class_weight[None, :]
        loss_cls = jnp.sum(jnp.where(matched.valid[:, None], bce, 0.0)) / b
    else:
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        picked = jnp.take_along_axis(
            logp, matched.gt_classes[:, None], axis=1)[:, 0]
        if class_weight is not None:
            cw = jnp.concatenate([class_weight,
                                  jnp.ones((1,), class_weight.dtype)])
            row_w = cw[matched.gt_classes]
        else:
            row_w = jnp.ones_like(picked)
        row_w = row_w * matched.valid.astype(row_w.dtype)
        loss_cls = -jnp.sum(picked * row_w) / jnp.maximum(jnp.sum(row_w), 1.0)

    fg = (matched.gt_classes < c) & matched.valid
    pred_boxes = apply_deltas(deltas, matched.boxes, reg_weights)
    # giou on xyxy (ref: fvcore giou_loss via box_reg_loss :293-297)
    giou = giou_xyxy(pred_boxes, matched.gt_boxes)
    loss_box = jnp.sum(jnp.where(fg, 1 - giou, 0.0)) / b
    return {"loss_cls": loss_cls, "loss_box_reg": loss_box}
