"""Spatial-memory read/write ops (the framework's signature kernels).

TPU-native re-expression of the reference's memory machinery:
  * read  — gather allocentric map cells into the egocentric frame + pyramid
            pooling (ref: CustomRecurrentFPN.forward, timm.py:142-192, and
            create_implicit_memory, custom_rcnn.py:762-823)
  * write — splat detection features through instance masks into the image
            plane, subsample pixels, and scatter-mean them into map cells
            (ref: box_to_image_features custom_rcnn.py:884-901 and
            project_image_features custom_rcnn.py:903-936)

The reference materializes a [480, 640, 512] gathered feature image and a
[cells, pixels] one-hot matmul in fp32 (custom_rcnn.py:917-931). Here the
write is reformulated so the big contraction runs on the MXU with a
[cells, 100] x [100, 512] matmul: per-pixel feature means are never
materialized — the per-detection mask weights are scatter-reduced per cell
first, then combined with the 100 detection features. fp32 accumulation is
preserved (the reference notes fp16 overflows here).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


def normalize_memory(features: jax.Array, obs_count: jax.Array) -> jax.Array:
    """Mean-normalize accumulated cell features by observation count.

    ref: create_implicit_memory (custom_rcnn.py:774):
    `memory_features[obs > 1] /= obs` — note the strict >1: cells observed
    exactly once keep their raw sum (== their mean anyway after one visit,
    so this also equals a plain mean with clamp; we preserve the branch).
    """
    denom = jnp.where(obs_count > 1.0, obs_count, 1.0)
    return features / denom[:, None]


@partial(jax.jit, static_argnames=("pool",))
def memory_read(features: jax.Array, obs_count: jax.Array,
                proj_indices: jax.Array, pool: int = 4) -> jax.Array:
    """Project map memory into the egocentric frame, mean-pooled.

    features:     [cells, D] accumulated sums
    obs_count:    [cells]
    proj_indices: [H, W] int32 flattened cell index per pixel
    returns       [H//pool, W//pool, D] float32 egocentric memory

    ref: timm.py:147 (`map_memory[i][proj_indices[i]]`) + timm.py:152
    (F.avg_pool2d kernel 4) with the obs-count division done upstream in
    create_implicit_memory. The gather and 4x4 mean are fused here: indices
    are reshaped to [H/4, 4, W/4, 4] so XLA emits one gather feeding a local
    reduction instead of materializing the full-resolution feature image.
    """
    h, w = proj_indices.shape
    d = features.shape[-1]
    # gather in bf16 — faithful to the reference, which stores/gathers the
    # memory in fp16 and pools in fp32 (timm.py:147-152); halves the HBM
    # traffic of the dominant [H*W, D] row gather. Indices are regrouped so
    # each output cell's pool window is contiguous on the second-minor axis —
    # the mean then reduces over sublanes with no relayout copy of the 300 MB
    # gather output (a 1 ms/frame win found by trace).
    mem = normalize_memory(features, obs_count).astype(jnp.bfloat16)
    idx = proj_indices.reshape(h // pool, pool, w // pool, pool)
    idx = idx.transpose(0, 2, 1, 3).reshape(-1, pool * pool)
    gathered = jnp.take(mem, idx, axis=0)              # [HW/p^2, p^2, D]
    pooled = jnp.mean(gathered.astype(jnp.float32), axis=1)
    return pooled.reshape(h // pool, w // pool, d)


@partial(jax.jit, static_argnames=("pool",))
def memory_read_batched(features: jax.Array, obs_count: jax.Array,
                        proj_indices: jax.Array, pool: int = 4) -> jax.Array:
    """Batched memory_read as ONE flat row gather.

    features [B, cells, D], obs_count [B, cells], proj_indices [B, H, W]
    -> [B, H//pool, W//pool, D]. Bit-exact per sample vs memory_read.

    vmap(memory_read) lowers the row gather with a leading batch dimension,
    which the TPU executes ~3.4x slower per row than the flat form (r5
    train trace: 11.4 ns/row batched vs 3.3 unbatched at eval — 7.0 ms of
    a 37.5 ms train step). Offsetting each sample's indices by b*cells and
    gathering from the [B*cells, D] flattened table restores the fast
    single-gather lowering. Used by the train step, which reads
    PRECOMPUTED per-sample memories (loader.py:216-227) batched over
    independent frames.
    """
    b, cells, d = features.shape
    h, w = proj_indices.shape[1:]
    mem = normalize_memory(features.reshape(-1, d),
                           obs_count.reshape(-1)).astype(jnp.bfloat16)
    idx = proj_indices + (jnp.arange(b, dtype=jnp.int32) * cells)[:, None, None]
    idx = idx.reshape(b, h // pool, pool, w // pool, pool)
    idx = idx.transpose(0, 1, 3, 2, 4).reshape(-1, pool * pool)
    gathered = jnp.take(mem, idx, axis=0)              # [B*HW/p^2, p^2, D]
    pooled = jnp.mean(gathered.astype(jnp.float32), axis=1)
    return pooled.reshape(b, h // pool, w // pool, d)


def pyramid_pool(ego: jax.Array, num_levels: int) -> Tuple[jax.Array, ...]:
    """Successive 2x2 mean pools for the FPN levels.

    ref: timm.py:168 — the memory image is avg-pooled 2x2 *before* each level's
    merge, so level l uses pool factor 2^(l+1) of the /4 base.
    """
    outs = []
    cur = ego
    for _ in range(num_levels):
        h, w, d = cur.shape
        cur = cur.reshape(h // 2, 2, w // 2, 2, d).mean(axis=(1, 3))
        outs.append(cur)
    return tuple(outs)


class MemoryWriteResult(NamedTuple):
    features_update: jax.Array   # [cells, D] additive update (zeros where untouched)
    obs_update: jax.Array        # [cells] 1.0 for every cell visible in the frame
    any_detection: jax.Array     # scalar bool — reference skips update when no dets


@partial(jax.jit, static_argnames=("num_cells", "subsample", "exact_subsample",
                                   "pixel_major"))
def memory_write(det_features: jax.Array, det_masks: jax.Array,
                 det_valid: jax.Array, proj_indices: jax.Array,
                 num_cells: int,
                 subsample: int = 8, exact_subsample: bool = True,
                 obs_proj_indices: "jax.Array | None" = None,
                 obs_visibility: "jax.Array | None" = None,
                 pixel_major: bool = False
                 ) -> MemoryWriteResult:
    """Scatter detection features into map cells.

    det_features: [N, D]   CLIP-space features (already 50 * l2-normalized,
                           ref: custom_rcnn.py:848)
    det_masks:    [N, H, W] bool pasted instance masks ([H, W, N] with
                  pixel_major=True — the layout paste_masks(pixel_major=True)
                  emits; saves the [N, P] -> [P, N] relayout on the exact path)
    det_valid:    [N] bool
    proj_indices: [H, W] int32 flattened cell ids. Outlier pixels (projection
                  outside the map / above z-clip) carry index 0 — faithful to
                  the reference, which scatters them into cell 0
                  (custom_rcnn.py:903-936 uses the raw indices; the outlier
                  mask never reaches the write).

    Semantics preserved from the reference:
      * per-pixel feature = mean of covering masks' features
        (box_to_image_features, custom_rcnn.py:884-901)
      * only every `subsample`-th *observed* pixel (row-major order over the
        compacted observed set) feeds the scatter (custom_rcnn.py:913-914);
        with exact_subsample=False a static every-`subsample`-th-pixel grid is
        used instead (statistically identical; the legacy round-1..4 fast
        path, kept selectable)
      * cell value = mean over contributing pixels, fp32 accumulation
        (custom_rcnn.py:917-934)
      * obs_update = 1 for every unique cell id in proj_indices
        (custom_rcnn.py:699-701); when the feature scatter runs on a
        subsampled grid, pass the full-resolution indices as
        `obs_proj_indices` to keep the visibility update exact

    The exact path compacts the selected pixels with a PER-ROW dense
    one-hot built straight from the observed cumsum (no full-P
    gather/scatter/searchsorted — those were all measured latency-bound,
    ARCHITECTURE.md write-path study): the (t+1)-th observed pixel of a row
    is the unique column with observed & incl == t+1, so the [H, J, W]
    selection one-hot is one broadcast compare, the selected mask rows /
    cell ids are batched matmuls against it (MXU work instead of 38k
    latency-bound gather rows), and the result feeds the same small
    [H*ceil(W/s), N] segment-sum the strided path uses — with the pixel
    count folded in as lane N of the SAME scatter (the scatter is
    latency-bound per row; two scatters cost double). Bit-exact vs the
    full-P formulation (r5 A/B at flagship shapes: 2.20 ms vs 6.28 full-P,
    vs the strided approximation's 2.41).
    """
    if num_cells >= (1 << 24):
        raise ValueError(
            f"memory_write exact path contracts cell ids in f32 "
            f"(exact below 2^24); num_cells={num_cells} is out of range")
    if pixel_major:
        h, w, n = det_masks.shape
    else:
        n, h, w = det_masks.shape
    p = h * w
    idx = proj_indices.reshape(p)

    if exact_subsample:
        masks_pm = det_masks if pixel_major else jnp.moveaxis(det_masks, 0, -1)
        masks_pm = masks_pm & det_valid[None, None, :]          # [H, W, N]
        s = subsample
        j_cap = -(-w // s)                                      # slots per row
        observed = jnp.any(masks_pm, axis=-1)                   # [H, W]
        incl = jnp.cumsum(observed.astype(jnp.int32), axis=1)   # [H, W]
        row_count = incl[:, -1]                                 # [H]
        row_start = jnp.cumsum(row_count) - row_count           # exclusive
        t0 = (-row_start) % s                 # first selected local rank
        targets = (t0[:, None] +
                   s * jnp.arange(j_cap, dtype=jnp.int32)[None, :])
        slot_valid = (targets < row_count[:, None]).reshape(-1)  # [H*J]
        # the (t+1)-th observed pixel of row r is the UNIQUE column with
        # observed & incl == t+1, so the selection one-hot comes straight
        # from the cumsum, and the selected mask rows / cell ids are
        # per-row MATMULS against it instead of gathers (r5 A/B: gathers
        # 2.64 ms, one-hot matmuls 2.20 at flagship shapes — the 38k-row
        # and 38k-element gathers were both latency-bound). Every sum has
        # at most one nonzero term, so bf16 products stay exact 0/1 and
        # the f32 idx contraction is exact for cell ids < 2^24.
        onehot = ((incl[:, None, :] == (targets + 1)[:, :, None]) &
                  observed[:, None, :])                         # [H, J, W]
        m_sel = jnp.einsum("hjw,hwn->hjn", onehot.astype(jnp.bfloat16),
                           masks_pm.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32
                           ).reshape(h * j_cap, n)              # exact 0/1
        c_sel = jnp.sum(m_sel, axis=1)
        seg_idx = jnp.einsum("hjw,hw->hj", onehot.astype(jnp.float32),
                             proj_indices.astype(jnp.float32),
                             preferred_element_type=jnp.float32
                             ).reshape(-1).astype(jnp.int32)
        seg_idx = jnp.where(slot_valid, seg_idx, 0)
        sel_f = slot_valid.astype(jnp.float32)
        pix_w = jnp.where(slot_valid[:, None],
                          m_sel / jnp.maximum(c_sel, 1.0)[:, None], 0.0)
    else:
        masks = det_masks if not pixel_major else jnp.moveaxis(det_masks, -1, 0)
        masks = (masks & det_valid[:, None, None]).reshape(n, p)
        masks_f = masks.astype(jnp.float32)
        c = jnp.sum(masks_f, axis=0)                            # [P]
        observed = c > 0
        stride_mask = (jnp.arange(p, dtype=jnp.int32) % subsample) == 0
        sel = observed & stride_mask
        sel_f = sel.astype(jnp.float32)
        seg_idx = idx
        # weights w[p, i] = sel[p] * m_i[p] / c[p]; cell weight A[cell, i] =
        # segment-sum over pixels. The P x N intermediate is the only large
        # transient; the D-wide contraction below runs on the MXU.
        pix_w = jnp.where(sel[:, None],
                          masks_f.T / jnp.maximum(c, 1.0)[:, None], 0.0)

    # ONE scatter for both the per-detection weights and the pixel count:
    # the count rides as lane N of the same row (N=100 pads to 128 lanes
    # anyway, so the extra column is free — and the segment-sum scatter is
    # latency-bound per ROW, so folding halves its cost; r5 trace: the two
    # separate scatters cost 0.40 + 0.35 ms/frame)
    aug = jnp.concatenate([pix_w, sel_f[:, None]], axis=1)        # [S, N+1]
    acc = jax.ops.segment_sum(aug, seg_idx, num_segments=num_cells)
    a, cell_count = acc[:, :-1], acc[:, -1]                       # [cells, N], [cells]

    # full-f32 MXU accumulation — the reference explicitly disables fp16
    # autocast for this contraction because it overflows (custom_rcnn.py:929-931)
    cell_sum = jnp.dot(a, det_features.astype(jnp.float32),
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)       # [cells, D]
    features_update = jnp.where(cell_count[:, None] > 0,
                                cell_sum / jnp.maximum(cell_count, 1.0)[:, None],
                                0.0)

    # visibility: every cell id present in proj_indices gets +1 observation.
    # NOTE (preserved reference quirk, custom_rcnn.py:699-701): outlier pixels
    # carry index 0, so cell 0 counts as visible whenever any outlier exists.
    # This is a pure function of the frame's indices — when the host
    # precomputes it (np.bincount in the data pipeline, `obs_visibility`),
    # the 307k-element device scatter (measured 2 ms/frame, the single most
    # expensive op in the frame) disappears.
    if obs_visibility is not None:
        obs_update = obs_visibility.astype(jnp.float32)
    else:
        obs_idx = idx if obs_proj_indices is None \
            else obs_proj_indices.reshape(-1)
        obs_update = jnp.zeros((num_cells,), jnp.float32).at[obs_idx].max(1.0)

    any_detection = jnp.any(det_valid)
    return MemoryWriteResult(
        features_update=jnp.where(any_detection, features_update, 0.0),
        obs_update=jnp.where(any_detection, obs_update, 0.0),
        any_detection=any_detection,
    )


def semmap_classes(features: jax.Array, obs_count: jax.Array,
                   zs_weight: jax.Array, obs_thresh: float,
                   norm_temperature: float = 50.0) -> jax.Array:
    """Argmax-class snapshot of the memory (the `semmap` the reference saves).

    ref: visualise_clip_image_features (custom_rcnn.py:938-1017) as called at
    :756 — per-cell 50*l2-normalized feature dotted with CLIP class
    embeddings, softmaxed; cells whose normalized observation intensity falls
    below `obs_thresh` get class -1.
    """
    c = zs_weight.shape[1] - 1
    norm = jnp.linalg.norm(features, axis=-1, keepdims=True)
    feats = norm_temperature * features / jnp.maximum(norm, 1e-12)
    # fp32 like every zs_weight contraction (CLAUDE.md matmul rule;
    # preferred_element_type alone only fixes the accumulator, the MXU
    # would still round the inputs to bf16). softmax is monotone, so the
    # reference's softmax-then-argmax is just argmax(logits).
    logits = jnp.dot(feats, zs_weight,
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)[:, :c]
    cls = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    intensity = jnp.mean(jnp.abs(features), axis=-1)
    intensity = jnp.where(obs_count > 1, intensity / jnp.maximum(obs_count, 1.0), intensity)
    lo = jnp.min(intensity)
    hi = jnp.max(intensity)
    intensity = (intensity - lo) / jnp.maximum(hi - lo, 1e-12)
    return jnp.where(intensity < obs_thresh, -1, cls)
