"""Micro-benchmark of the memory-write path variants on TPU (round 5).

Attributes the parity-exact pipeline's gap vs the fast-path headline
(BENCH r4: 14.66 vs 9.64 ms/frame; the r5 searchsorted compaction made it
WORSE, 16.78) by timing each stage in isolation at flagship shapes:

  * paste_full      — paste_masks at 480x640 (exact path's input)
  * paste_strided   — paste_masks x_stride=8 (fast path's input)
  * write_fast      — memory_write on the strided grid (subsample=1)
  * write_exact_old — round-4 formulation: cumsum-rank mask + FULL-P
                      segment-sum
  * write_exact_new — round-5 searchsorted compaction to [P/8] rows
  * e2e chains of paste+write for both exact variants and fast

Usage: python tools/bench_write_variants.py   (runs on the default device)
"""

import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from embodied_object_detection_tpu.ops.mask_paste import paste_masks
from embodied_object_detection_tpu.ops.memory_ops import memory_write

H, W, N, CELLS, D, S = 480, 640, 100, 8192, 512, 8
P = H * W


@partial(jax.jit, static_argnames=("num_cells", "subsample"))
def write_exact_old(det_features, det_masks, det_valid, proj_indices,
                    num_cells, subsample=8, obs_visibility=None):
    """Round-4 exact formulation (pre-compaction), for A/B."""
    n, h, w = det_masks.shape
    p = h * w
    idx = proj_indices.reshape(p)
    masks = (det_masks & det_valid[:, None, None]).reshape(n, p)
    masks_f = masks.astype(jnp.float32)
    c = jnp.sum(masks_f, axis=0)
    observed = c > 0
    rank = jnp.cumsum(observed.astype(jnp.int32)) - 1
    sel = observed & (rank % subsample == 0)
    pix_w = jnp.where(sel[:, None], masks_f.T / jnp.maximum(c, 1.0)[:, None],
                      0.0)
    a = jax.ops.segment_sum(pix_w, idx, num_segments=num_cells)
    cell_count = jax.ops.segment_sum(sel.astype(jnp.float32), idx,
                                     num_segments=num_cells)
    cell_sum = jnp.dot(a, det_features.astype(jnp.float32),
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    features_update = jnp.where(cell_count[:, None] > 0,
                                cell_sum / jnp.maximum(cell_count, 1.0)[:, None],
                                0.0)
    obs_update = obs_visibility
    return features_update, obs_update


def sync(x):
    return float(jnp.sum(x[..., :1]))


def bench(fn, *args, iters=20, label=""):
    out = fn(*args)
    sync(out[0] if isinstance(out, tuple) else
         out.features_update if hasattr(out, "features_update") else out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out[0] if isinstance(out, tuple) else
         out.features_update if hasattr(out, "features_update") else out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{label:24s} {dt:8.3f} ms")
    return dt


def paste_masks_pm(masks, boxes, height, width, threshold):
    """paste_masks emitting PIXEL-MAJOR [H, W, N] f32 0/1 — the layout the
    write's per-pixel ops want, produced free by flipping the einsum
    output order (no [N, P] -> [P, N] relayout downstream)."""
    n, m, _ = masks.shape
    xs = jnp.arange(width, dtype=jnp.float32) + 0.5
    ys = jnp.arange(height, dtype=jnp.float32) + 0.5
    x0, y0, x1, y1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    bw = jnp.maximum(x1 - x0, 1e-4)[:, None]
    bh = jnp.maximum(y1 - y0, 1e-4)[:, None]
    gx = (xs[None, :] - x0[:, None]) / bw * 2.0 - 1.0
    gy = (ys[None, :] - y0[:, None]) / bh * 2.0 - 1.0
    sx = ((gx + 1.0) * m - 1.0) / 2.0
    sy = ((gy + 1.0) * m - 1.0) / 2.0
    from embodied_object_detection_tpu.ops.mask_paste import _hat_weights
    rx = _hat_weights(sx, m)                            # [N, W, M]
    ry = _hat_weights(sy, m)                            # [N, H, M]
    tmp = jnp.einsum("nha,nab->nhb", ry, masks.astype(jnp.float32),
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
    out = jnp.einsum("nhb,nwb->hwn", tmp, rx,
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
    return (out >= threshold).astype(jnp.float32)


@partial(jax.jit, static_argnames=("num_cells", "subsample"))
def write_exact_v3(det_features, masks_pm, det_valid, proj_indices,
                   num_cells, subsample=8, obs_visibility=None):
    """Compacted exact write consuming pixel-major [H, W, N] masks."""
    h, w, n = masks_pm.shape
    p = h * w
    idx = proj_indices.reshape(p)
    masks_f = masks_pm.reshape(p, n) * det_valid.astype(jnp.float32)[None, :]
    c = jnp.sum(masks_f, axis=1)                       # [P]
    observed = c > 0
    csum = jnp.cumsum(observed.astype(jnp.int32))
    s_cap = -(-p // subsample)
    targets = jnp.arange(s_cap, dtype=jnp.int32) * subsample + 1
    pos = jnp.searchsorted(csum, targets, side="left",
                           method="scan_unrolled").astype(jnp.int32)
    slot_valid = pos < p
    pos = jnp.minimum(pos, p - 1)
    sel_f = slot_valid.astype(jnp.float32)
    seg_idx = jnp.where(slot_valid, idx[pos], 0)
    m_sel = masks_f[pos]                               # [S, N] native rows
    c_sel = c[pos]
    pix_w = jnp.where(slot_valid[:, None],
                      m_sel / jnp.maximum(c_sel, 1.0)[:, None], 0.0)
    a = jax.ops.segment_sum(pix_w, seg_idx, num_segments=num_cells)
    cell_count = jax.ops.segment_sum(sel_f, seg_idx, num_segments=num_cells)
    cell_sum = jnp.dot(a, det_features.astype(jnp.float32),
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    features_update = jnp.where(cell_count[:, None] > 0,
                                cell_sum / jnp.maximum(cell_count, 1.0)[:, None],
                                0.0)
    return features_update, obs_visibility


@partial(jax.jit, static_argnames=("num_cells", "subsample"))
def write_exact_old_pm(det_features, masks_pm, det_valid, proj_indices,
                       num_cells, subsample=8, obs_visibility=None):
    """Round-4 full-P segment-sum, but from pixel-major masks (no
    relayout) — isolates relayout cost from compaction cost."""
    h, w, n = masks_pm.shape
    p = h * w
    idx = proj_indices.reshape(p)
    masks_f = masks_pm.reshape(p, n) * det_valid.astype(jnp.float32)[None, :]
    c = jnp.sum(masks_f, axis=1)
    observed = c > 0
    rank = jnp.cumsum(observed.astype(jnp.int32)) - 1
    sel = observed & (rank % subsample == 0)
    pix_w = jnp.where(sel[:, None], masks_f / jnp.maximum(c, 1.0)[:, None],
                      0.0)
    a = jax.ops.segment_sum(pix_w, idx, num_segments=num_cells)
    cell_count = jax.ops.segment_sum(sel.astype(jnp.float32), idx,
                                     num_segments=num_cells)
    cell_sum = jnp.dot(a, det_features.astype(jnp.float32),
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    features_update = jnp.where(cell_count[:, None] > 0,
                                cell_sum / jnp.maximum(cell_count, 1.0)[:, None],
                                0.0)
    return features_update, obs_visibility


@partial(jax.jit, static_argnames=("num_cells", "subsample"))
def write_exact_v4(det_features, masks_pm_bool, det_valid, proj_indices,
                   num_cells, subsample=8, obs_visibility=None):
    """Exact compaction via ONE scatter: the j-th selected pixel satisfies
    rank // subsample == j, so pos[j] = scatter(arange(P) at rank//s) —
    no binary search. Masks stay BOOL until the [S, N] gather."""
    h, w, n = masks_pm_bool.shape
    p = h * w
    s_cap = -(-p // subsample)
    idx = proj_indices.reshape(p)
    masks = masks_pm_bool.reshape(p, n) & det_valid[None, :]
    c = jnp.sum(masks, axis=1).astype(jnp.float32)      # [P]
    observed = c > 0
    rank = jnp.cumsum(observed.astype(jnp.int32)) - 1   # [P]
    sel = observed & (rank % subsample == 0)
    slot = jnp.where(sel, rank // subsample, s_cap)     # s_cap = dropped
    pos = jnp.zeros((s_cap,), jnp.int32).at[slot].set(
        jnp.arange(p, dtype=jnp.int32), mode="drop")
    n_obs = rank[-1] + 1
    slot_valid = jnp.arange(s_cap, dtype=jnp.int32) * subsample < n_obs
    sel_f = slot_valid.astype(jnp.float32)
    seg_idx = jnp.where(slot_valid, idx[pos], 0)
    m_sel = masks[pos].astype(jnp.float32)              # [S, N]
    c_sel = c[pos]
    pix_w = jnp.where(slot_valid[:, None],
                      m_sel / jnp.maximum(c_sel, 1.0)[:, None], 0.0)
    a = jax.ops.segment_sum(pix_w, seg_idx, num_segments=num_cells)
    cell_count = jax.ops.segment_sum(sel_f, seg_idx, num_segments=num_cells)
    cell_sum = jnp.dot(a, det_features.astype(jnp.float32),
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    features_update = jnp.where(cell_count[:, None] > 0,
                                cell_sum / jnp.maximum(cell_count, 1.0)[:, None],
                                0.0)
    return features_update, obs_visibility


@partial(jax.jit, static_argnames=("num_cells", "subsample"))
def write_exact_v5(det_features, masks_pm_bool, det_valid, proj_indices,
                   num_cells, subsample=8, obs_visibility=None):
    """Exact compaction via PER-ROW dense compare-reduce — no full-P
    gather/scatter/searchsorted at all. Key identity: the position of the
    (t+1)-th observed pixel in a row equals the COUNT of columns whose
    inclusive observed-cumsum is <= t, so every selected position is a
    [H, W, J] broadcast-compare-sum (pure VPU work), with the per-row
    selected local ranks derived from the rows' exclusive global rank
    offsets. Then gather just the [H*J, N] selected mask rows and feed the
    fast path's small segment-sum."""
    h, w, n = masks_pm_bool.shape
    s = subsample
    j_cap = -(-w // s)                                  # slots per row
    masks = masks_pm_bool & det_valid[None, None, :]
    observed = jnp.any(masks, axis=-1)                  # [H, W]
    incl = jnp.cumsum(observed.astype(jnp.int32), axis=1)   # [H, W]
    row_count = incl[:, -1]                             # [H]
    row_start = jnp.cumsum(row_count) - row_count       # exclusive [H]
    t0 = (-row_start) % s                               # first selected local rank
    targets = t0[:, None] + s * jnp.arange(j_cap, dtype=jnp.int32)[None, :]
    slot_valid = targets < row_count[:, None]           # [H, J]
    # pos[r, j] = #{x : incl[r, x] <= t} = column of the (t+1)-th observed
    pos = jnp.sum((incl[:, :, None] <= targets[:, None, :]).astype(jnp.int32),
                  axis=1)                               # [H, J]
    fp = (jnp.arange(h, dtype=jnp.int32)[:, None] * w +
          jnp.minimum(pos, w - 1)).reshape(-1)          # [H*J]
    slot_valid = slot_valid.reshape(-1)
    m_sel = masks.reshape(h * w, n)[fp].astype(jnp.float32)  # [S, N]
    c_sel = jnp.sum(m_sel, axis=1)
    seg_idx = jnp.where(slot_valid, proj_indices.reshape(-1)[fp], 0)
    sel_f = slot_valid.astype(jnp.float32)
    pix_w = jnp.where(slot_valid[:, None],
                      m_sel / jnp.maximum(c_sel, 1.0)[:, None], 0.0)
    # folded single scatter (count rides lane N) — matches the in-repo
    # memory_write so v5 vs v6 differ only by gathers-vs-matmuls
    aug = jnp.concatenate([pix_w, sel_f[:, None]], axis=1)
    acc = jax.ops.segment_sum(aug, seg_idx, num_segments=num_cells)
    a, cell_count = acc[:, :-1], acc[:, -1]
    cell_sum = jnp.dot(a, det_features.astype(jnp.float32),
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    features_update = jnp.where(cell_count[:, None] > 0,
                                cell_sum / jnp.maximum(cell_count, 1.0)[:, None],
                                0.0)
    return features_update, obs_visibility


@partial(jax.jit, static_argnames=("num_cells", "subsample"))
def write_exact_v6(det_features, masks_pm_bool, det_valid, proj_indices,
                   num_cells, subsample=8, obs_visibility=None):
    """v5 with the two selected-pixel GATHERS replaced by one-hot MXU
    matmuls: the (t+1)-th observed pixel of a row is the unique column with
    observed & incl == t+1, so the selection one-hot comes straight from
    the cumsum (no pos array), and m_sel / seg_idx are batched per-row
    matmuls against it. Sums have at most one nonzero term -> exact."""
    h, w, n = masks_pm_bool.shape
    s = subsample
    j_cap = -(-w // s)
    masks = masks_pm_bool & det_valid[None, None, :]
    observed = jnp.any(masks, axis=-1)                  # [H, W]
    incl = jnp.cumsum(observed.astype(jnp.int32), axis=1)
    row_count = incl[:, -1]
    row_start = jnp.cumsum(row_count) - row_count
    t0 = (-row_start) % s
    targets = t0[:, None] + s * jnp.arange(j_cap, dtype=jnp.int32)[None, :]
    slot_valid = (targets < row_count[:, None]).reshape(-1)
    onehot = ((incl[:, None, :] == (targets + 1)[:, :, None]) &
              observed[:, None, :])                     # [H, J, W]
    oh_b = onehot.astype(jnp.bfloat16)
    m_sel = jnp.einsum("hjw,hwn->hjn", oh_b, masks.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32
                       ).reshape(h * j_cap, n)          # exact 0/1
    c_sel = jnp.sum(m_sel, axis=1)
    seg_idx = jnp.einsum("hjw,hw->hj", onehot.astype(jnp.float32),
                         proj_indices.astype(jnp.float32),
                         preferred_element_type=jnp.float32
                         ).reshape(-1).astype(jnp.int32)
    seg_idx = jnp.where(slot_valid, seg_idx, 0)
    sel_f = slot_valid.astype(jnp.float32)
    pix_w = jnp.where(slot_valid[:, None],
                      m_sel / jnp.maximum(c_sel, 1.0)[:, None], 0.0)
    aug = jnp.concatenate([pix_w, sel_f[:, None]], axis=1)
    acc = jax.ops.segment_sum(aug, seg_idx, num_segments=num_cells)
    a, cell_count = acc[:, :-1], acc[:, -1]
    cell_sum = jnp.dot(a, det_features.astype(jnp.float32),
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    features_update = jnp.where(cell_count[:, None] > 0,
                                cell_sum / jnp.maximum(cell_count, 1.0)[:, None],
                                0.0)
    return features_update, obs_visibility


def main():
    rng = np.random.RandomState(0)
    print("device:", jax.devices()[0])

    mask_probs = jnp.asarray(rng.rand(N, 28, 28).astype(np.float32))
    boxes = np.zeros((N, 4), np.float32)
    boxes[:, 0] = rng.uniform(0, W - 80, N)
    boxes[:, 1] = rng.uniform(0, H - 80, N)
    boxes[:, 2] = boxes[:, 0] + rng.uniform(40, 240, N)
    boxes[:, 3] = boxes[:, 1] + rng.uniform(40, 240, N)
    boxes = jnp.asarray(np.clip(boxes, 0, [W, H, W, H]))
    feats = jnp.asarray(rng.randn(N, D).astype(np.float32))
    valid = jnp.asarray(np.ones(N, bool))
    proj = jnp.asarray(rng.randint(0, CELLS, (H, W)).astype(np.int32))
    vis = jnp.asarray((np.bincount(np.asarray(proj).ravel(),
                                   minlength=CELLS) > 0).astype(np.float32))

    paste_full = jax.jit(lambda m, b: paste_masks(m, b, H, W, 0.5))
    paste_strided = jax.jit(lambda m, b: paste_masks(m, b, H, W, 0.5,
                                                     x_stride=S))
    t_pf = bench(paste_full, mask_probs, boxes, label="paste_full")
    t_ps = bench(paste_strided, mask_probs, boxes, label="paste_strided")

    masks_full = paste_full(mask_probs, boxes)
    masks_strided = paste_strided(mask_probs, boxes)

    wf = jax.jit(partial(memory_write, num_cells=CELLS, subsample=1,
                         exact_subsample=False))
    t_wfast = bench(wf, feats, masks_strided, valid, proj[:, ::S],
                    label="write_fast(strided)")

    t_wold = bench(partial(write_exact_old, num_cells=CELLS, subsample=S,
                           obs_visibility=vis),
                   feats, masks_full, valid, proj, label="write_exact_old")

    wn = jax.jit(partial(memory_write, num_cells=CELLS, subsample=S,
                         exact_subsample=True))
    t_wnew = bench(lambda f, m, v, p: wn(f, m, v, p, obs_visibility=vis),
                   feats, masks_full, valid, proj, label="write_exact_new")

    paste_pm = jax.jit(lambda m, b: paste_masks_pm(m, b, H, W, 0.5))
    t_ppm = bench(paste_pm, mask_probs, boxes, label="paste_full_pm")
    masks_pm = paste_pm(mask_probs, boxes)
    t_wpm_old = bench(partial(write_exact_old_pm, num_cells=CELLS,
                              subsample=S, obs_visibility=vis),
                      feats, masks_pm, valid, proj,
                      label="write_exact_old_pm")
    t_wpm_v3 = bench(partial(write_exact_v3, num_cells=CELLS, subsample=S,
                             obs_visibility=vis),
                     feats, masks_pm, valid, proj,
                     label="write_exact_v3_pm")

    paste_pm_bool = jax.jit(
        lambda m, b: paste_masks_pm(m, b, H, W, 0.5) > 0)
    t_ppmb = bench(paste_pm_bool, mask_probs, boxes, label="paste_full_pm_bool")
    masks_pmb = paste_pm_bool(mask_probs, boxes)
    t_wv4 = bench(partial(write_exact_v4, num_cells=CELLS, subsample=S,
                          obs_visibility=vis),
                  feats, masks_pmb, valid, proj, label="write_exact_v4")
    t_wv5 = bench(partial(write_exact_v5, num_cells=CELLS, subsample=S,
                          obs_visibility=vis),
                  feats, masks_pmb, valid, proj, label="write_exact_v5")
    t_wv6 = bench(partial(write_exact_v6, num_cells=CELLS, subsample=S,
                          obs_visibility=vis),
                  feats, masks_pmb, valid, proj, label="write_exact_v6")
    # correctness cross-check vs old formulation
    ref, _ = write_exact_old(feats, jnp.moveaxis(masks_pmb, -1, 0), valid,
                             proj, num_cells=CELLS, subsample=S,
                             obs_visibility=vis)
    for name, fn in (("v4", write_exact_v4), ("v5", write_exact_v5),
                     ("v6", write_exact_v6)):
        got, _ = fn(feats, masks_pmb, valid, proj, num_cells=CELLS,
                    subsample=S, obs_visibility=vis)
        err = float(jnp.abs(ref - got).max())
        print(f"{name} vs old max abs diff: {err:.3e}")

    print(f"\nchains: fast {t_ps + t_wfast:.3f}  old {t_pf + t_wold:.3f}  "
          f"new {t_pf + t_wnew:.3f}  old_pm {t_ppm + t_wpm_old:.3f}  "
          f"v3_pm {t_ppm + t_wpm_v3:.3f}  v4_pm_bool {t_ppmb + t_wv4:.3f}  "
          f"v5_pm_bool {t_ppmb + t_wv5:.3f}  v6_pm_bool {t_ppmb + t_wv6:.3f} ms")


if __name__ == "__main__":
    main()
