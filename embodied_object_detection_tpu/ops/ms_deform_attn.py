"""Multi-scale deformable attention (MSDeformAttn core op).

ref: third_party/Deformable-DETR/models/ops — the reference's only
compiled-from-source native component (CUDA fwd/bwd in
src/cuda/ms_deform_attn_cuda.cu + ms_deform_im2col_cuda.cuh, with a
pure-torch fallback in functions/ms_deform_attn_func.py
(ms_deform_attn_core_pytorch)). Used by the Deformable-DETR alternative
meta-arch (detic/modeling/meta_arch/d2_deformable_detr.py), not the embodied
path.

TPU-native design: the CUDA kernel is a per-query gather-interpolate; here
every (query, head, level, point) bilinear sample is expressed as one batched
gather + weighted sum that XLA fuses — autodiff provides the backward pass
(the CUDA bwd kernel is hand-written col2im). Semantics match
ms_deform_attn_core_pytorch: sampling locations are in [0, 1] normalized per
level, grid_sample align_corners=False with zero padding.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

# Shared grid-sample-style zero-pad sampler (validity folded into the
# SCALAR tap weights — cheaper than masking gathered [..., C] vectors,
# same reasoning as roi_align.py's tap weighting).
from embodied_object_detection_tpu.ops.deform_conv import (
    bilinear_sample_zero_pad)


@partial(jax.jit, static_argnames=("spatial_shapes",))
def ms_deform_attn(value: jax.Array,
                   spatial_shapes: Tuple[Tuple[int, int], ...],
                   sampling_locations: jax.Array,
                   attention_weights: jax.Array) -> jax.Array:
    """value:              [S, M, D]   flattened multi-level features
                                        (S = sum H_l*W_l, M heads, D per-head)
    spatial_shapes:        static ((H_0, W_0), ...)
    sampling_locations:    [Q, M, L, P, 2] in [0, 1] (x, y), per level
    attention_weights:     [Q, M, L, P] (softmaxed over L*P)
    returns                [Q, M * D]

    ref: ms_deform_attn_core_pytorch (functions/ms_deform_attn_func.py) and
    the CUDA path's identical math.
    """
    q, m, l, p, _ = sampling_locations.shape
    d = value.shape[-1]
    outputs = []
    offset = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value[offset: offset + h * w]                # [HW, M, D]
        offset += h * w
        v = v.transpose(1, 0, 2).reshape(m, h, w, d)     # [M, H, W, D]
        loc = sampling_locations[:, :, lvl]              # [Q, M, P, 2]
        # grid_sample align_corners=False: unnormalized = loc * size - 0.5
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        sampled = jax.vmap(bilinear_sample_zero_pad,
                           in_axes=(0, 1, 1), out_axes=1)(
            v, y, x)                                     # [Q, M, P, D]
        outputs.append(sampled * attention_weights[:, :, lvl][..., None])
    out = sum(outputs).sum(axis=2)                       # [Q, M, D]
    return out.reshape(q, m * d)
