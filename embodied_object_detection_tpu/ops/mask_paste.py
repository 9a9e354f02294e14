"""Paste predicted instance masks into the full image plane.

TPU-native replacement for detectron2's `paste_masks_in_image` CUDA/cv2 path
(ref: custom_rcnn.py:880, detectron2 layers/mask_ops.py). Bilinear
grid-sampling is *separable*: the pasted image for one detection is

    pasted = R_y @ mask @ R_x^T

where R_y [H, M] / R_x [W, M] hold the 1-D bilinear hat weights of every
image row/column against the mask grid. This turns the usual gather-based
grid sample (which lowers to 123M scalar gathers for 100 masks at 480x640 and
compiled to a 1.4s kernel) into two batched matmuls on the MXU (~2 GFLOP).

Semantics match mask_ops._do_paste_mask(skip_empty=False):
    img coord -> mask coord:  m = ((x + 0.5 - x0) / w * 2 - 1 + 1) * M/2 - 0.5
(grid_sample align_corners=False with zero padding; the hat function
max(0, 1 - |m - k|) reproduces both the interpolation weights and the
zero-padding at borders).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _hat_weights(src: jax.Array, m: int) -> jax.Array:
    """src: [..., P] continuous source coords -> [..., P, M] bilinear weights
    with implicit zero padding outside [0, M-1]."""
    taps = jnp.arange(m, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src[..., None] - taps))


@partial(jax.jit, static_argnames=("height", "width", "threshold", "x_stride",
                                   "pixel_major"))
def paste_masks(masks: jax.Array, boxes: jax.Array, height: int, width: int,
                threshold: float = 0.5, x_stride: int = 1,
                pixel_major: bool = False) -> jax.Array:
    """masks [N, M, M] (probabilities), boxes [N, 4] xyxy -> [N, H, W//x_stride].

    threshold >= 0 returns booleans (mask >= threshold); threshold < 0
    returns the float mask values. x_stride > 1 evaluates only every
    x_stride-th column (the legacy strided memory-write subsample).
    pixel_major=True emits [H, W//x_stride, N] instead — the layout the
    exact memory write's per-pixel compaction wants, produced free by
    flipping the einsum output order (no [N, P] -> [P, N] relayout
    downstream).
    """
    n, m, _ = masks.shape
    xs = jnp.arange(0, width, x_stride, dtype=jnp.float32) + 0.5  # pixel centers
    ys = jnp.arange(height, dtype=jnp.float32) + 0.5

    x0, y0, x1, y1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    bw = jnp.maximum(x1 - x0, 1e-4)[:, None]
    bh = jnp.maximum(y1 - y0, 1e-4)[:, None]
    # normalized [-1, 1] then unnormalized to mask grid (align_corners=False)
    gx = (xs[None, :] - x0[:, None]) / bw * 2.0 - 1.0   # [N, W]
    gy = (ys[None, :] - y0[:, None]) / bh * 2.0 - 1.0   # [N, H]
    sx = ((gx + 1.0) * m - 1.0) / 2.0
    sy = ((gy + 1.0) * m - 1.0) / 2.0

    rx = _hat_weights(sx, m)                            # [N, W, M]
    ry = _hat_weights(sy, m)                            # [N, H, M]

    # fp32 inputs AND accumulation: mask probabilities near the 0.5
    # threshold feed the memory write (one of CLAUDE.md's named fp32
    # sites) — bf16-rounded hat weights would flip boundary pixels on TPU
    tmp = jnp.einsum("nha,nab->nhb", ry, masks.astype(jnp.float32),
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
    out = jnp.einsum("nhb,nwb->hwn" if pixel_major else "nhb,nwb->nhw",
                     tmp, rx,
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
    if threshold >= 0:
        return out >= threshold
    return out
