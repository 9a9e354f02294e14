"""Device-side padded NMS.

TPU-native replacement for the CUDA `batched_nms` the reference leans on
(ref: third_party/CenterNet2/centernet/modeling/layers/ml_nms.py:4-31 and
detectron2 fast_rcnn_inference). CUDA NMS is a serial greedy scan; here we
compute the *same greedy fixpoint* with data-parallel Jacobi iterations over a
static [N, N] IoU mask:

    keep[j] = valid[j] and no kept i with score_i > score_j and IoU(i,j) > t

The suppression relation is a DAG (strictly ordered by score), so iterating
    active <- valid & ~any(active_i & mask[i, j])
converges to the unique greedy solution in at most `depth(DAG)` steps; we run a
`lax.while_loop` with change detection. Everything is fixed-shape: inputs are
padded with valid=False rows, outputs are top-k padded Detections.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..structures import Detections, pairwise_iou

NEG_INF = -1e10


def topk_padded(kept_scores: jax.Array, topk: int, *rows: jax.Array
                 ) -> Tuple[jax.Array, jax.Array, Tuple[jax.Array, ...]]:
    """top_k that tolerates topk > N: pads candidates with NEG_INF rows so
    the output is always exactly [topk] with valid=False padding.

    A config (e.g. post_nms_topk_test=256 on a 64x96 miniature with only 129
    FPN locations) must never be able to crash a core op on shape grounds.
    Returns (top_scores, out_valid, per-row-array gathered outputs).
    """
    n = kept_scores.shape[0]
    pad = max(0, topk - n)
    if pad:
        kept_scores = jnp.pad(kept_scores, (0, pad), constant_values=NEG_INF)
        rows = tuple(
            jnp.pad(r, [(0, pad)] + [(0, 0)] * (r.ndim - 1)) for r in rows)
    top_scores, top_idx = jax.lax.top_k(kept_scores, topk)
    out_valid = top_scores > NEG_INF / 2
    return top_scores, out_valid, tuple(r[top_idx] for r in rows)


def _greedy_keep(iou_mask: jax.Array, valid: jax.Array, max_iters: int) -> jax.Array:
    """Fixpoint of greedy suppression. iou_mask[i, j] True iff i (higher score,
    i < j in sorted order) suppresses j. Returns keep mask [N]."""

    def cond(state):
        active, prev, it = state
        return jnp.logical_and(it < max_iters, jnp.any(active != prev))

    def body(state):
        active, _, it = state
        suppressed = jnp.any(iou_mask & active[:, None], axis=0)
        return (valid & ~suppressed, active, it + 1)

    init = (valid, jnp.zeros_like(valid), jnp.int32(0))
    active, _, _ = jax.lax.while_loop(cond, body, init)
    return active


def _nms_core(boxes, scores, valid, classes, iou_threshold, max_iters,
              ml_nms_semantics=False):
    # greedy suppression-DAG depth is bounded by the candidate count, so
    # max_iters <= 0 (the default) means "run to convergence": the
    # while_loop exits as soon as the mask stops changing, so the bound
    # costs nothing on typical scenes but guarantees the greedy fixpoint
    # even for long suppression chains (> 64 deep).
    """Sort by score desc, run greedy NMS. Returns (order, keep, sorted arrays)."""
    n = boxes.shape[0]
    scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-scores)
    boxes_s = boxes[order]
    scores_s = scores[order]
    valid_s = valid[order]
    classes_s = classes[order]

    iou = pairwise_iou(boxes_s, boxes_s)
    same_class = classes_s[:, None] == classes_s[None, :]
    upper = jnp.triu(jnp.ones((n, n), bool), k=1)      # i < j strictly (i higher score)
    iou_mask = (iou > iou_threshold) & same_class & upper & valid_s[:, None] & valid_s[None, :]
    if ml_nms_semantics:
        # ml_nms treats nms_thresh <= 0 as "NMS disabled" (ml_nms.py:16-17
        # returns the boxlist untouched) — without this, thresh 0 would
        # suppress every overlapping pair, the exact opposite. detectron2's
        # batched_nms (fast_rcnn_inference) has NO such bypass, so this is
        # opt-in for the proposal-NMS path only.
        iou_mask = iou_mask & jnp.asarray(iou_threshold > 0)
    iters = max_iters if max_iters and max_iters > 0 else boxes.shape[0]
    keep = _greedy_keep(iou_mask, valid_s, iters)
    return order, keep, boxes_s, scores_s, classes_s


@partial(jax.jit, static_argnames=("topk", "max_iters", "ml_nms_semantics"))
def nms_padded(boxes: jax.Array, scores: jax.Array, valid: jax.Array,
               iou_threshold: float, topk: int,
               classes: Optional[jax.Array] = None,
               max_iters: int = 0,
               ml_nms_semantics: bool = False) -> Detections:
    """Greedy NMS over padded candidates; returns top-`topk` by score.

    If `classes` is given, suppression only happens within a class
    (ml_nms / batched_nms semantics). Padded rows have valid=False.
    `ml_nms_semantics=True` additionally disables suppression entirely when
    iou_threshold <= 0 (the ml_nms convention for proposal NMS).
    """
    n = boxes.shape[0]
    if classes is None:
        classes = jnp.zeros((n,), jnp.int32)
    _, keep, boxes_s, scores_s, classes_s = _nms_core(
        boxes, scores, valid, classes, iou_threshold, max_iters,
        ml_nms_semantics=ml_nms_semantics)

    kept_scores = jnp.where(keep, scores_s, NEG_INF)
    top_scores, out_valid, (top_boxes, top_classes) = topk_padded(
        kept_scores, topk, boxes_s, classes_s)
    return Detections(
        boxes=jnp.where(out_valid[:, None], top_boxes, 0.0),
        scores=jnp.where(out_valid, top_scores, 0.0),
        classes=jnp.where(out_valid, top_classes, 0).astype(jnp.int32),
        valid=out_valid,
    )


@partial(jax.jit, static_argnames=("topk", "max_iters"))
def class_aware_nms(boxes: jax.Array, scores: jax.Array, classes: jax.Array,
                    valid: jax.Array, iou_threshold: float, topk: int,
                    max_iters: int = 0) -> Detections:
    """Per-class NMS + global top-k (detectron2 `batched_nms` semantics)."""
    return nms_padded(boxes, scores, valid, iou_threshold, topk,
                      classes=classes, max_iters=max_iters)


@partial(jax.jit, static_argnames=("topk", "max_iters", "candidate_cap"))
def multiclass_nms(boxes: jax.Array, scores: jax.Array, valid: jax.Array,
                   score_thresh: float, iou_threshold: float, topk: int,
                   max_iters: int = 0, candidate_cap: int = 2048
                   ) -> Tuple[Detections, jax.Array]:
    """`fast_rcnn_inference` for class-agnostic boxes.

    ref: detectron2 fast_rcnn_inference as invoked from
    detic_roi_heads.py:214-221 and custom_rcnn.py:862-869:
      * scores [R, C+1]; drop the background column
      * flatten (box r, class c) pairs with score > score_thresh
      * per-class NMS at `iou_threshold`, keep global top-`topk`

    Returns (Detections[topk], kept_proposal_rows [topk] int32, -1 where
    invalid) — the row output mirrors the `proposal_indices` the reference
    uses to pick which proposals feed the memory write
    (custom_rcnn.py:875-879).
    """
    r = boxes.shape[0]
    c = scores.shape[1] - 1
    fg = scores[:, :c]                                  # [R, C]
    cand_valid = (fg > score_thresh) & valid[:, None]
    flat_scores = fg.reshape(-1)                        # [R*C]
    flat_valid = cand_valid.reshape(-1)
    flat_classes = jnp.tile(jnp.arange(c, dtype=jnp.int32)[None, :], (r, 1)).reshape(-1)
    flat_rows = jnp.repeat(jnp.arange(r, dtype=jnp.int32), c)
    flat_boxes = jnp.repeat(boxes, c, axis=0)           # class-agnostic boxes tiled

    # cap the NMS working set: the O(N^2) IoU matrix over all R*C
    # candidates is mostly wasted work. This IS a documented divergence
    # (ARCHITECTURE.md #2), not an exact identity: a below-cap candidate
    # that greedy-over-all would keep (because everything above it was
    # suppressed) is lost — negligible at cap=2048 vs topk<=300, and
    # candidate_cap=0 disables the cap for bit-exact suppression.
    if candidate_cap and candidate_cap < flat_boxes.shape[0]:
        key = jnp.where(flat_valid, flat_scores, NEG_INF)
        _, keep_idx = jax.lax.top_k(key, candidate_cap)
        flat_boxes = flat_boxes[keep_idx]
        flat_scores = flat_scores[keep_idx]
        flat_valid = flat_valid[keep_idx]
        flat_classes = flat_classes[keep_idx]
        flat_rows = flat_rows[keep_idx]

    order, keep, boxes_s, scores_s, classes_s = _nms_core(
        flat_boxes, flat_scores, flat_valid, flat_classes, iou_threshold, max_iters)
    rows_s = flat_rows[order]

    kept_scores = jnp.where(keep, scores_s, NEG_INF)
    top_scores, out_valid, (top_boxes, top_classes, top_rows) = topk_padded(
        kept_scores, topk, boxes_s, classes_s, rows_s)
    det = Detections(
        boxes=jnp.where(out_valid[:, None], top_boxes, 0.0),
        scores=jnp.where(out_valid, top_scores, 0.0),
        classes=jnp.where(out_valid, top_classes, 0).astype(jnp.int32),
        valid=out_valid,
    )
    kept_rows = jnp.where(out_valid, top_rows, -1)
    return det, kept_rows
