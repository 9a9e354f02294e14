"""Multilevel ROIAlign (ROIAlignV2 / `aligned=True` semantics) in pure XLA.

TPU-native replacement for the detectron2/torchvision CUDA ROIAlign used by
the box/mask poolers (ref: detic_roi_heads.py:332 box_pooler, :265 mask_pooler;
detectron2 ROIPooler with POOLER_TYPE ROIAlignV2).

Design: instead of per-level ragged dispatch (the CUDA pooler partitions ROIs
by level), all FPN levels are flattened into one [sum(H*W), C] table and every
ROI gathers its bilinear sample points from the flat table using offsets for
its assigned level — one big gather + einsum that XLA vectorizes, no dynamic
shapes. Level assignment follows detectron2's canonical rule
    level = floor(canonical_level + log2(sqrt(area) / canonical_box_size))
clamped to [min_level, max_level].

Sampling: `sampling_ratio` points per bin axis (the reference default of 0 =>
adaptive ceil(bin/size) is data-dependent; we use a fixed 2, which matches the
adaptive count for ROIs below 2x the pooled resolution at their level and is
the standard fixed-shape choice).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def assign_levels(boxes: jax.Array, min_level: int, max_level: int,
                  canonical_box_size: int = 224, canonical_level: int = 4) -> jax.Array:
    """detectron2 assign_boxes_to_levels. boxes [R,4] -> level ids [R] int32."""
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * \
           jnp.maximum(boxes[:, 3] - boxes[:, 1], 0)
    sqrt_area = jnp.sqrt(area)
    lvl = jnp.floor(canonical_level + jnp.log2(sqrt_area / canonical_box_size + 1e-8))
    return jnp.clip(lvl, min_level, max_level).astype(jnp.int32)


def _bilinear_flat(flat_table: jax.Array, x: jax.Array, y: jax.Array,
                   h: jax.Array, w: jax.Array, base: jax.Array,
                   cast_weights: bool = False) -> jax.Array:
    """Bilinear sample from a flattened level table.

    flat_table: [T, C]; x, y: [...] continuous coords in the level's grid;
    h, w: [...] level dims; base: [...] flat offset of the level's first row.
    Semantics match the detectron2/torchvision ROIAlign CUDA kernel
    (`bilinear_interpolate`): a sample strictly outside [-1, size] on either
    axis contributes exactly 0; otherwise coords are clamped into [0, size-1]
    before interpolation, so the bands (-1, 0) and (size-1, size] read the
    border pixel at FULL weight (no edge fade). This matters because stage-0
    cascade proposals are NOT clipped to the image (the reference regresses
    deltas from unclipped boxes).

    cast_weights=True (the `impl="v2"` path) casts tap weights to the
    feature dtype so the gather->weight->sum chain stays bf16 on TPU — no
    f32 convert + T(8,128)->T(2,128) relayout between gather and reduce
    (trace-guided: the f32 path cost ~2.4 ms/frame at 480x640 flagship
    shapes). Tap values/weights are bit-identical to v1 under f32 inputs;
    the downstream v2 window POOLING re-associates the 4-sample mean
    (strided adds x 1/s^2 vs reshape-mean), so end results agree to ~1 ulp,
    not bitwise (tests/test_roi_align.py::test_impl_variants_agree).

    Note: a pair-slab variant (one lax.gather of slice_sizes=(2, C)
    fetching both x-taps) was measured 25x SLOWER on v5e — TPU gathers
    only vectorize full single-row slices. Do not re-add.
    """
    hf = h.astype(x.dtype)
    wf = w.astype(x.dtype)
    # CUDA kernel early-exit: y < -1 || y > height || x < -1 || x > width -> 0
    valid = (x >= -1.0) & (x <= wf) & (y >= -1.0) & (y <= hf)
    # CUDA kernel clamp: if (y <= 0) y = 0 (and the >= size-1 branch below)
    x = jnp.clip(x, 0.0, wf - 1.0)
    y = jnp.clip(y, 0.0, hf - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = x - x0
    ly = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    # x_low >= width-1 -> x_high = x_low = width-1 with lx = 0 (x was clamped)
    x1i = jnp.minimum(x0i + 1, w - 1)
    y1i = jnp.minimum(y0i + 1, h - 1)

    # invalidity is folded into the *scalar* tap weights (cheap) rather than
    # masking the gathered [.., C] vectors
    okf = valid.astype(x.dtype)
    wdt = flat_table.dtype if cast_weights else None

    def tap(yi, xi, wgt):
        v = flat_table[(base + yi * w + xi).astype(jnp.int32)]
        if wdt is not None:
            wgt = wgt.astype(wdt)
        return v * wgt[..., None]

    return (tap(y0i, x0i, (1 - ly) * (1 - lx) * okf) +
            tap(y0i, x1i, (1 - ly) * lx * okf) +
            tap(y1i, x0i, ly * (1 - lx) * okf) +
            tap(y1i, x1i, ly * lx * okf))


def _bilinear_packed(flat4: jax.Array, x: jax.Array, y: jax.Array,
                     h: jax.Array, w: jax.Array, base: jax.Array) -> jax.Array:
    """Bilinear sample from a neighbor-packed [T, 4C] table (impl="v3"):
    ONE row gather per sample instead of _bilinear_flat's four. Tap
    weights and clamp semantics are identical to _bilinear_flat (see its
    docstring); the four weighted adds are written out explicitly in the
    same order, so under f32 inputs the result is bit-identical to v1.
    Weights are cast to the table dtype like cast_weights=True (the bf16
    TPU path)."""
    hf = h.astype(x.dtype)
    wf = w.astype(x.dtype)
    valid = (x >= -1.0) & (x <= wf) & (y >= -1.0) & (y <= hf)
    x = jnp.clip(x, 0.0, wf - 1.0)
    y = jnp.clip(y, 0.0, hf - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = x - x0
    ly = y - y0
    okf = valid.astype(x.dtype)

    c = flat4.shape[-1] // 4
    rows = flat4[(base + y0.astype(jnp.int32) * w +
                  x0.astype(jnp.int32)).astype(jnp.int32)]       # [..., 4C]
    wdt = flat4.dtype

    def wgt(v):
        return (v * okf).astype(wdt)[..., None]

    return (rows[..., 0 * c:1 * c] * wgt((1 - ly) * (1 - lx)) +
            rows[..., 1 * c:2 * c] * wgt((1 - ly) * lx) +
            rows[..., 2 * c:3 * c] * wgt(ly * (1 - lx)) +
            rows[..., 3 * c:4 * c] * wgt(ly * lx))


def _hat_rows(coords: jax.Array, size: int) -> jax.Array:
    """Dense bilinear tap weights along one axis with the CUDA ROIAlign
    clamp semantics (see _bilinear_flat): coords [..., P] -> [..., P, size]
    rows holding (1-l) at floor and l at floor+1 (clamped), zeroed where
    the coord falls outside [-1, size]. Exactly two nonzeros per row (one
    at the border), so contracting these rows against a feature axis IS
    the bilinear sample — as a matmul instead of a gather."""
    sf = float(size)
    valid = (coords >= -1.0) & (coords <= sf)
    c = jnp.clip(coords, 0.0, sf - 1.0)
    c0 = jnp.floor(c)
    l = c - c0
    c0i = c0.astype(jnp.int32)
    c1i = jnp.minimum(c0i + 1, size - 1)
    k = jnp.arange(size, dtype=jnp.int32)
    okf = valid.astype(jnp.float32)
    return ((k == c0i[..., None]) * ((1.0 - l) * okf)[..., None] +
            (k == c1i[..., None]) * (l * okf)[..., None])


def _roi_align_matmul(features: Sequence[jax.Array], boxes: jax.Array,
                      strides: Tuple[int, ...], output_size: int,
                      sampling_ratio: int, lvl_of_roi: jax.Array
                      ) -> jax.Array:
    """ROIAlignV2 as separable hat-weight matmuls (impl="v4") — NO gathers.

    The 2-D bilinear sample lattice of a ROI is the outer product of its
    per-axis sample coords, and the s x s window mean is separable too, so
        pooled = (Ry7 @ level @ Rx7^T)
    with Ry7 [out, H_l] = the s-window mean of the per-sample hat rows.
    Every ROI is contracted against every level and the assigned level's
    result selected — 3x the minimal FLOPs, but ~57 GFLOP/frame total at
    flagship shapes vs the gather path's ~680k 512-B row gathers at
    ~5.3 ns/row (trace r5: 3.6 ms/frame; matmuls of the same pooling are
    MXU work instead). Same trick as ops/mask_paste.py (its einsum
    replaced 123M scalar gathers). Math: identical taps/weights/clamps to
    _bilinear_flat, re-associated ((1-ly)*(x-interp) vs 4 expanded taps),
    so f32 results agree to ~1 ulp, not bitwise.
    """
    r = boxes.shape[0]
    s = sampling_ratio
    grid = (jnp.arange(output_size * s, dtype=jnp.float32) + 0.5) / s
    out = None
    for li, f in enumerate(features):
        h, w, c = f.shape
        stride = float(strides[li])
        x1 = boxes[:, 0] / stride
        y1 = boxes[:, 1] / stride
        bin_w = (boxes[:, 2] / stride - x1) / output_size
        bin_h = (boxes[:, 3] / stride - y1) / output_size
        sx = x1[:, None] + grid[None, :] * bin_w[:, None] - 0.5   # [R, P]
        sy = y1[:, None] + grid[None, :] * bin_h[:, None] - 0.5
        rx = _hat_rows(sx, w)                                     # [R, P, W]
        ry = _hat_rows(sy, h)                                     # [R, P, H]
        # fold the s x s window mean into the weight rows (exact: the mean
        # of bilinear samples is the sample of mean weights)
        rx = rx.reshape(r, output_size, s, w).mean(2)             # [R, out, W]
        ry = ry.reshape(r, output_size, s, h).mean(2)
        dt = f.dtype
        # x-contraction first keeps the transient at [R, H, out, C]
        tmpx = jnp.einsum("rtw,hwc->rhtc", rx.astype(dt), f,
                          preferred_element_type=jnp.float32)
        pooled = jnp.einsum("rsh,rhtc->rstc", ry.astype(dt),
                            tmpx.astype(dt),
                            preferred_element_type=jnp.float32).astype(dt)
        # levels are disjoint per ROI, so masked sum == select
        sel = (lvl_of_roi == li)[:, None, None, None]
        pooled = jnp.where(sel, pooled, 0.0)
        out = pooled if out is None else out + pooled
    return out


def _neighbor_packed(features: Sequence[jax.Array]) -> Sequence[jax.Array]:
    """Pack each pixel's 2x2 bilinear neighborhood into one row:
    out[y, x] = concat(f[y, x], f[y, x+1], f[y+1, x], f[y+1, x+1]) with
    zero padding past the border. One [T, 4C] row gather then fetches all
    four taps of a sample — gathers here are ROW-latency-bound, not
    byte-bound, so quartering the row count at constant bytes is the win
    (impl="v3"). Zero padding is EXACT: an out-of-range tap's bilinear
    weight is exactly 0 (x clamps to w-1 => lx == 0), so the padded zeros
    are multiplied by 0.0."""
    packed = []
    for f in features:
        fp = jnp.pad(f, ((0, 1), (0, 1), (0, 0)))
        packed.append(jnp.concatenate(
            [fp[:-1, :-1], fp[:-1, 1:], fp[1:, :-1], fp[1:, 1:]], axis=-1))
    return packed


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio", "strides",
                                   "canonical_box_size", "canonical_level",
                                   "impl"))
def multilevel_roi_align(features: Sequence[jax.Array], boxes: jax.Array,
                         strides: Tuple[int, ...], output_size: int,
                         sampling_ratio: int = 2,
                         canonical_box_size: int = 224,
                         canonical_level: int = 4,
                         impl: str = "v1") -> jax.Array:
    """ROIAlignV2 over an FPN pyramid.

    features: per-level [H_l, W_l, C] (NHWC, single image)
    boxes:    [R, 4] xyxy in image pixels
    strides:  per-level stride (e.g. (8, 16, 32))
    impl:     "v1" reference math in f32; "v2" bf16 tap weights + strided
              window pool; "v3" = v2 + neighbor-packed single-gather taps
              (one [T, 4C] row per sample instead of four [T, C] rows);
              "v4" = gather-free separable hat-weight matmuls (MXU)
    returns:  [R, output_size, output_size, C]
    """
    num_levels = len(features)
    c = features[0].shape[-1]

    # levels are log2(stride): (8,16,32) -> (3,4,5). Level routing below
    # indexes feature maps by (assigned_level - lvls[0]), which is only
    # correct for a contiguous power-of-two pyramid — guard loudly rather
    # than silently pooling a mid-size box from the wrong level.
    lvls = [int(math.log2(s)) for s in strides]
    if tuple(2 ** l for l in lvls) != tuple(strides) or \
            lvls != list(range(lvls[0], lvls[0] + num_levels)):
        raise ValueError(
            f"multilevel_roi_align needs contiguous power-of-two strides "
            f"(e.g. (8, 16, 32)); got {strides}")

    if impl == "v4":
        lvl4 = assign_levels(boxes, lvls[0], lvls[-1], canonical_box_size,
                             canonical_level) - lvls[0]
        return _roi_align_matmul(features, boxes, strides, output_size,
                                 sampling_ratio, lvl4)

    hs = jnp.array([f.shape[0] for f in features], jnp.int32)
    ws = jnp.array([f.shape[1] for f in features], jnp.int32)
    sizes = [f.shape[0] * f.shape[1] for f in features]
    bases_list = [0]
    for s in sizes[:-1]:
        bases_list.append(bases_list[-1] + s)
    bases = jnp.array(bases_list, jnp.int32)
    if impl == "v3":
        flat = jnp.concatenate(
            [f.reshape(-1, 4 * c) for f in _neighbor_packed(features)],
            axis=0)
    else:
        flat = jnp.concatenate([f.reshape(-1, c) for f in features], axis=0)
    lvl_of_roi = assign_levels(boxes, lvls[0], lvls[-1], canonical_box_size,
                               canonical_level) - lvls[0]        # [R] in [0, L)

    r = boxes.shape[0]
    stride_arr = jnp.array(strides, jnp.float32)
    roi_stride = stride_arr[lvl_of_roi]                          # [R]
    roi_h = hs[lvl_of_roi]
    roi_w = ws[lvl_of_roi]
    roi_base = bases[lvl_of_roi]

    # aligned=True: continuous coords, no +0.5 offset hack
    x1 = boxes[:, 0] / roi_stride
    y1 = boxes[:, 1] / roi_stride
    x2 = boxes[:, 2] / roi_stride
    y2 = boxes[:, 3] / roi_stride
    bin_w = (x2 - x1) / output_size                              # [R]
    bin_h = (y2 - y1) / output_size

    s = sampling_ratio
    # sample grid: for bin (i,j), samples at x1 + (j + (k+0.5)/s) * bin_w
    grid = (jnp.arange(output_size * s, dtype=jnp.float32) + 0.5) / s  # [P]
    sx = x1[:, None] + grid[None, :] * bin_w[:, None]            # [R, P]
    sy = y1[:, None] + grid[None, :] * bin_h[:, None]            # [R, P]
    # full sample lattice [R, P, P]
    sxx = jnp.broadcast_to(sx[:, None, :], (r, output_size * s, output_size * s))
    syy = jnp.broadcast_to(sy[:, :, None], (r, output_size * s, output_size * s))
    # ROIAlign samples at (coord - 0.5) in pixel-center convention
    sxx = sxx - 0.5
    syy = syy - 0.5

    bilinear = _bilinear_packed if impl == "v3" else \
        partial(_bilinear_flat, cast_weights=(impl == "v2"))
    vals = bilinear(
        flat, sxx, syy,
        jnp.broadcast_to(roi_h[:, None, None], sxx.shape),
        jnp.broadcast_to(roi_w[:, None, None], sxx.shape),
        jnp.broadcast_to(roi_base[:, None, None], sxx.shape))    # [R, P, P, C]

    if impl in ("v2", "v3"):
        # strided-slice window sum instead of a 6-D reshape+mean: the 6-D
        # view forces an XLA relayout (T(8,128)->T(2,128) copy); strided
        # slices fuse into the add. 1/s^2 is a power of two — exact in bf16.
        acc = vals[:, ::s, ::s]
        for ki in range(s):
            for kj in range(s):
                if ki or kj:
                    acc = acc + vals[:, ki::s, kj::s]
        return acc * (1.0 / (s * s))

    # average the s x s samples per bin
    vals = vals.reshape(r, output_size, s, output_size, s, c)
    return jnp.mean(vals, axis=(2, 4))
