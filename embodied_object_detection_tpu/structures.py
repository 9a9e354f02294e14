"""Padded, fixed-shape detection containers (pytrees).

Replaces detectron2's ragged `Instances`/`Boxes` containers (used throughout the
reference, e.g. custom_rcnn.py / detic_roi_heads.py) with static-shape arrays plus
validity masks so that whole episodes compile to single XLA programs.

Conventions:
  * boxes are XYXY in absolute image pixels, float32, shape [..., N, 4]
  * a `valid` bool mask marks live rows; padded rows hold zeros and never
    contribute (scores forced to -inf / 0 where relevant)
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class Detections(NamedTuple):
    """A padded set of (proposal or final) detections for one image."""
    boxes: jax.Array          # [N, 4] xyxy
    scores: jax.Array         # [N]
    classes: jax.Array        # [N] int32 (0 for class-agnostic proposals)
    valid: jax.Array          # [N] bool

    @property
    def capacity(self) -> int:
        return self.boxes.shape[-2]

    def num_valid(self) -> jax.Array:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)


class GroundTruth(NamedTuple):
    """Padded ground-truth boxes for one frame (ref: loader.py:296 gt_boxes/gt_classes)."""
    boxes: jax.Array          # [G, 4] xyxy
    classes: jax.Array        # [G] int32
    valid: jax.Array          # [G] bool


class MemoryState(NamedTuple):
    """The recurrent spatial memory carry.

    Replaces the reference's mutable module state `self.semmap_features`,
    `self.observation_count`, `self.implicit_memory`, `self.observations`
    (custom_rcnn.py:470-477, 738-760) with an explicit pytree threaded through
    `jax.lax.scan` over frames.

    features:   [max_cells, 512] float32 — running *sum* of projected features
                per map cell (the reference's `implicit_memory`).
    obs_count:  [max_cells] float32 — per-cell observation counts
                (the reference's `observations`).
    """
    features: jax.Array
    obs_count: jax.Array

    @staticmethod
    def zeros(max_cells: int, dim: int = 512) -> "MemoryState":
        return MemoryState(
            features=jnp.zeros((max_cells, dim), jnp.float32),
            obs_count=jnp.zeros((max_cells,), jnp.float32),
        )


def pad_boxes(boxes: np.ndarray, classes: np.ndarray, capacity: int) -> GroundTruth:
    """Host-side: pad variable-length GT to fixed capacity."""
    boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
    classes = np.asarray(classes, np.int32).reshape(-1)
    n = min(len(boxes), capacity)
    out_b = np.zeros((capacity, 4), np.float32)
    out_c = np.zeros((capacity,), np.int32)
    out_v = np.zeros((capacity,), bool)
    out_b[:n] = boxes[:n]
    out_c[:n] = classes[:n]
    out_v[:n] = True
    return GroundTruth(boxes=out_b, classes=out_c, valid=out_v)


def area(boxes: jax.Array) -> jax.Array:
    """XYXY box areas, shape [..., N]."""
    return jnp.maximum(boxes[..., 2] - boxes[..., 0], 0) * \
           jnp.maximum(boxes[..., 3] - boxes[..., 1], 0)


def pairwise_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """IoU matrix between two XYXY box sets: [N, M]."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area(a)[:, None] + area(b)[None, :] - inter
    # denominator guard INSIDE the where: padded all-zero boxes give
    # union==0 on every training frame, and a bare inter/union would leak
    # 0/0=NaN cotangents through jnp.where's VJP if boxes ever carry grads
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def giou_xyxy(a: jax.Array, b: jax.Array) -> jax.Array:
    """Elementwise generalized IoU between broadcast XYXY box arrays
    (ref: fvcore giou_loss / DETR box_ops.generalized_box_iou). Shared by
    the cascade box-reg loss and the DETR matcher/criterion."""
    ix1 = jnp.maximum(a[..., 0], b[..., 0])
    iy1 = jnp.maximum(a[..., 1], b[..., 1])
    ix2 = jnp.minimum(a[..., 2], b[..., 2])
    iy2 = jnp.minimum(a[..., 3], b[..., 3])
    inter = jnp.maximum(ix2 - ix1, 0) * jnp.maximum(iy2 - iy1, 0)
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    union = area_a + area_b - inter
    iou = inter / jnp.maximum(union, 1e-7)
    cx1 = jnp.minimum(a[..., 0], b[..., 0])
    cy1 = jnp.minimum(a[..., 1], b[..., 1])
    cx2 = jnp.maximum(a[..., 2], b[..., 2])
    cy2 = jnp.maximum(a[..., 3], b[..., 3])
    area_c = (cx2 - cx1) * (cy2 - cy1)
    return iou - (area_c - union) / jnp.maximum(area_c, 1e-7)


def clip_boxes(boxes: jax.Array, height: int, width: int) -> jax.Array:
    """Clip XYXY boxes to image bounds (ref: Boxes.clip)."""
    x1 = jnp.clip(boxes[..., 0], 0, width)
    y1 = jnp.clip(boxes[..., 1], 0, height)
    x2 = jnp.clip(boxes[..., 2], 0, width)
    y2 = jnp.clip(boxes[..., 3], 0, height)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def nonempty(boxes: jax.Array, threshold: float = 0.0) -> jax.Array:
    """bool mask of boxes with positive extent (ref: Boxes.nonempty)."""
    return ((boxes[..., 2] - boxes[..., 0]) > threshold) & \
           ((boxes[..., 3] - boxes[..., 1]) > threshold)
