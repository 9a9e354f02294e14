"""Memory read/write op tests against small hand-computable cases and a
numpy oracle of the reference algorithm (custom_rcnn.py:884-936)."""

import numpy as np
import jax.numpy as jnp

from embodied_object_detection_tpu.ops.memory_ops import (
    normalize_memory, memory_read, memory_read_batched, pyramid_pool,
    memory_write, semmap_classes)


def test_normalize_memory_strict_gt1():
    feats = jnp.asarray(np.array([[2.0, 4.0], [3.0, 6.0], [5.0, 10.0]], np.float32))
    obs = jnp.asarray(np.array([0.0, 1.0, 2.0], np.float32))
    out = np.asarray(normalize_memory(feats, obs))
    np.testing.assert_allclose(out[0], [2, 4])       # obs 0: untouched
    np.testing.assert_allclose(out[1], [3, 6])       # obs 1: untouched (strict >1)
    np.testing.assert_allclose(out[2], [2.5, 5])     # obs 2: divided


def test_memory_read_gather_and_pool():
    cells, d = 8, 4
    feats = np.zeros((cells, d), np.float32)
    feats[3] = 8.0
    obs = np.zeros(cells, np.float32)
    idx = np.zeros((8, 8), np.int32)
    idx[:4, :4] = 3                                  # one 4x4 pool window = cell 3
    out = np.asarray(memory_read(jnp.asarray(feats), jnp.asarray(obs),
                                 jnp.asarray(idx), pool=4))
    assert out.shape == (2, 2, d)
    np.testing.assert_allclose(out[0, 0], 8.0)
    np.testing.assert_allclose(out[0, 1], 0.0)


def test_memory_read_batched_bitexact(rng):
    """The flat-offset batched read (the train step's hoisted gather) must
    be bit-identical per sample to memory_read."""
    b, cells, d, h, w = 3, 24, 8, 16, 8
    feats = jnp.asarray(rng.randn(b, cells, d).astype(np.float32))
    obs = jnp.asarray(rng.randint(0, 4, (b, cells)).astype(np.float32))
    proj = jnp.asarray(rng.randint(0, cells, (b, h, w)).astype(np.int32))
    got = memory_read_batched(feats, obs, proj, pool=4)
    for i in range(b):
        want = memory_read(feats[i], obs[i], proj[i], pool=4)
        assert (np.asarray(got[i]) == np.asarray(want)).all()


def test_pyramid_pool_shapes():
    ego = jnp.ones((120, 160, 8))
    l1, l2, l3 = pyramid_pool(ego, 3)
    assert l1.shape == (60, 80, 8)
    assert l2.shape == (30, 40, 8)
    assert l3.shape == (15, 20, 8)


def np_memory_write_oracle(feats, masks, idx, num_cells, subsample=8):
    """Literal re-derivation of custom_rcnn.py:884-936 in numpy."""
    n, h, w = masks.shape
    d = feats.shape[1]
    image_feat = np.zeros((h * w, d), np.float64)
    count = np.zeros(h * w)
    m = masks.reshape(n, -1)
    for i in range(n):
        image_feat[m[i]] += feats[i]
        count[m[i]] += 1
    observed = count > 0
    image_feat[observed] /= count[observed, None]
    # compacted ::subsample
    obs_pix = np.nonzero(observed)[0][::subsample]
    proj = idx.reshape(-1)[obs_pix]
    cell_sum = np.zeros((num_cells, d))
    cell_cnt = np.zeros(num_cells)
    for p_, c_ in zip(obs_pix, proj):
        cell_sum[c_] += image_feat[p_]
        cell_cnt[c_] += 1
    upd = np.zeros((num_cells, d))
    nz = cell_cnt > 0
    upd[nz] = cell_sum[nz] / cell_cnt[nz, None]
    obs_upd = np.zeros(num_cells)
    obs_upd[np.unique(idx)] = 1
    return upd, obs_upd


def test_memory_write_matches_oracle(rng):
    n, h, w, d, cells = 5, 16, 24, 6, 32
    feats = rng.randn(n, d).astype(np.float32)
    masks = rng.rand(n, h, w) > 0.6
    idx = rng.randint(0, cells, (h, w)).astype(np.int32)
    valid = np.ones(n, bool)
    res = memory_write(jnp.asarray(feats), jnp.asarray(masks), jnp.asarray(valid),
                       jnp.asarray(idx), cells)
    want_upd, want_obs = np_memory_write_oracle(feats, masks, idx, cells)
    np.testing.assert_allclose(np.asarray(res.features_update), want_upd,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.obs_update), want_obs)
    assert bool(res.any_detection)


def test_memory_write_pixel_major_layout_bitexact(rng):
    """pixel_major=True ([H, W, N] masks, the layout paste_masks emits for
    the exact path) must be bit-identical to the [N, H, W] layout, and the
    exact per-row-compacted path must stay bit-exact vs the oracle across
    awkward shapes (W not divisible by subsample, sparse masks, an invalid
    detection)."""
    for n, h, w, d, cells, s in ((5, 16, 24, 6, 32, 8), (4, 11, 29, 5, 24, 8),
                                 (6, 33, 41, 8, 64, 3)):
        feats = rng.randn(n, d).astype(np.float32)
        masks = rng.rand(n, h, w) > 0.8
        idx = rng.randint(0, cells, (h, w)).astype(np.int32)
        valid = np.ones(n, bool)
        valid[-1] = False
        res_nm = memory_write(jnp.asarray(feats), jnp.asarray(masks),
                              jnp.asarray(valid), jnp.asarray(idx), cells,
                              subsample=s)
        res_pm = memory_write(jnp.asarray(feats),
                              jnp.asarray(np.moveaxis(masks, 0, -1)),
                              jnp.asarray(valid), jnp.asarray(idx), cells,
                              subsample=s, pixel_major=True)
        assert (np.asarray(res_nm.features_update) ==
                np.asarray(res_pm.features_update)).all()
        want_upd, _ = np_memory_write_oracle(feats, masks & valid[:, None, None],
                                             idx, cells, subsample=s)
        np.testing.assert_allclose(np.asarray(res_pm.features_update),
                                   want_upd, rtol=1e-4, atol=1e-5)


def test_memory_write_no_detections_is_noop():
    n, h, w, d, cells = 3, 8, 8, 4, 16
    res = memory_write(jnp.zeros((n, d)), jnp.zeros((n, h, w), bool),
                       jnp.zeros(n, bool), jnp.zeros((h, w), jnp.int32),
                       cells)
    assert not bool(res.any_detection)
    np.testing.assert_allclose(np.asarray(res.features_update), 0.0)
    np.testing.assert_allclose(np.asarray(res.obs_update), 0.0)


def test_semmap_classes():
    cells, d, c = 4, 8, 3
    zs = np.zeros((d, c + 1), np.float32)
    zs[0, 0] = 1.0
    zs[1, 1] = 1.0
    zs[2, 2] = 1.0
    feats = np.zeros((cells, d), np.float32)
    feats[0, 1] = 5.0           # class 1
    feats[1, 2] = 5.0           # class 2
    obs = np.array([1.0, 1.0, 0.0, 0.0], np.float32)
    out = np.asarray(semmap_classes(jnp.asarray(feats), jnp.asarray(obs),
                                    jnp.asarray(zs), obs_thresh=0.4))
    assert out[0] == 1
    assert out[1] == 2
    assert out[2] == -1 and out[3] == -1   # below intensity threshold


def test_memory_write_fast_subgrid_matches_strided_oracle(rng):
    """Fast path: paste/scatter on the stride-s column grid + full-res obs."""
    n, h, w, d, cells, s = 4, 8, 16, 5, 24, 4
    feats = rng.randn(n, d).astype(np.float32)
    masks_full = rng.rand(n, h, w) > 0.5
    idx = rng.randint(0, cells, (h, w)).astype(np.int32)
    valid = np.ones(n, bool)
    # fast path inputs: subgrid columns
    res = memory_write(jnp.asarray(feats), jnp.asarray(masks_full[:, :, ::s]),
                       jnp.asarray(valid), jnp.asarray(idx[:, ::s]),
                       cells, subsample=1, exact_subsample=False,
                       obs_proj_indices=jnp.asarray(idx))
    # oracle on the subgrid with subsample 1
    want_upd, _ = np_memory_write_oracle(feats, masks_full[:, :, ::s],
                                         idx[:, ::s], cells, subsample=1)
    np.testing.assert_allclose(np.asarray(res.features_update), want_upd,
                               rtol=1e-4, atol=1e-5)
    # obs update covers every cell in the FULL-res index map
    want_obs = np.zeros(cells)
    want_obs[np.unique(idx)] = 1
    np.testing.assert_allclose(np.asarray(res.obs_update), want_obs)
