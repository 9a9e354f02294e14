"""Paste predicted instance masks into the full image plane.

TPU-native replacement for detectron2's `paste_masks_in_image` CUDA/cv2 path
(ref: custom_rcnn.py:880, detectron2 layers/mask_ops.py). Instead of cropping
and resizing per-box (dynamic shapes), every (detection, pixel) pair samples
the 28x28 mask logit bilinearly at its normalized in-box coordinate — one
dense gather the TPU vectorizes; pixels outside the box get 0.

Semantics match mask_ops._do_paste_mask(skip_empty=False):
    img_x = (x + 0.5 - x0) / (x1 - x0) * 2 - 1   (grid_sample align_corners=False)
sampled with zero padding outside [-1, 1].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _grid_sample_1img(mask: jax.Array, gx: jax.Array, gy: jax.Array) -> jax.Array:
    """align_corners=False bilinear grid sample with zero padding.

    mask: [M, M]; gx, gy: [...] in [-1, 1] normalized coords. Returns [...]."""
    m_h, m_w = mask.shape
    # unnormalize (align_corners=False): x = ((gx + 1) * W - 1) / 2
    x = ((gx + 1.0) * m_w - 1.0) / 2.0
    y = ((gy + 1.0) * m_h - 1.0) / 2.0
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = x - x0
    ly = y - y0

    def tap(yy, xx):
        inside = (xx >= 0) & (xx < m_w) & (yy >= 0) & (yy < m_h)
        v = mask[jnp.clip(yy, 0, m_h - 1).astype(jnp.int32),
                 jnp.clip(xx, 0, m_w - 1).astype(jnp.int32)]
        return jnp.where(inside, v, 0.0)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    return (v00 * (1 - ly) * (1 - lx) + v01 * (1 - ly) * lx +
            v10 * ly * (1 - lx) + v11 * ly * lx)


@partial(jax.jit, static_argnames=("height", "width", "threshold"))
def paste_masks(masks: jax.Array, boxes: jax.Array, height: int, width: int,
                threshold: float = 0.5) -> jax.Array:
    """masks [N, M, M] (probabilities), boxes [N, 4] xyxy -> [N, H, W] bool.

    threshold < 0 returns the float masks instead of booleans.
    """
    n = masks.shape[0]
    xs = jnp.arange(width, dtype=jnp.float32) + 0.5     # pixel centers
    ys = jnp.arange(height, dtype=jnp.float32) + 0.5

    def paste_one(mask, box):
        x0, y0, x1, y1 = box[0], box[1], box[2], box[3]
        w = jnp.maximum(x1 - x0, 1e-4)
        h = jnp.maximum(y1 - y0, 1e-4)
        gx = (xs - x0) / w * 2.0 - 1.0                  # [W]
        gy = (ys - y0) / h * 2.0 - 1.0                  # [H]
        gxx = jnp.broadcast_to(gx[None, :], (height, width))
        gyy = jnp.broadcast_to(gy[:, None], (height, width))
        return _grid_sample_1img(mask, gxx, gyy)

    out = jax.vmap(paste_one)(masks.astype(jnp.float32), boxes)
    if threshold >= 0:
        return out >= threshold
    return out
