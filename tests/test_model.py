"""End-to-end model smoke tests on a tiny config."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from embodied_object_detection_tpu.models.detector import (
    EmbodiedDetector, FrameInputs, build_detector, make_episode_runner)
from embodied_object_detection_tpu.structures import MemoryState

from common import tiny_config


@pytest.fixture(scope="module")
def model_and_params():
    cfg = tiny_config()
    model, params = build_detector(cfg, jax.random.PRNGKey(0))
    return cfg, model, params


def _dummy_frame(cfg, rng, reset=True, start=True):
    h, w = cfg.input.height, cfg.input.width
    proj = rng.randint(0, cfg.memory.max_cells, (h, w)).astype(np.int32)
    vis = (np.bincount(proj.ravel(), minlength=cfg.memory.max_cells)
           [: cfg.memory.max_cells] > 0).astype(np.float32)
    return FrameInputs(
        image=jnp.asarray(rng.randint(0, 255, (h, w, 3)).astype(np.float32)),
        proj_indices=jnp.asarray(proj),
        outlier_mask=jnp.zeros((h, w), bool),
        obs_visibility=jnp.asarray(vis),
        memory_reset=jnp.asarray(reset),
        episode_start=jnp.asarray(start),
    )


def test_frame_step_shapes(model_and_params, rng):
    cfg, model, params = model_and_params
    f = _dummy_frame(cfg, rng)
    zs = jnp.asarray(rng.randn(cfg.roi.zs_weight_dim,
                               cfg.roi.num_classes + 1).astype(np.float32))
    mem = MemoryState.zeros(cfg.memory.max_cells, cfg.memory.memory_dim)
    out = model.apply(params, f.image, zs, mem.features, mem.obs_count,
                      f.proj_indices, f.outlier_mask,
                      method=EmbodiedDetector.frame_step)
    assert out.detections.boxes.shape == (cfg.roi.detections_per_image, 4)
    assert out.proposals.boxes.shape == (cfg.centernet.post_nms_topk_test, 4)
    assert out.write.features_update.shape == (cfg.memory.max_cells,
                                               cfg.memory.memory_dim)
    # detections within image bounds
    b = np.asarray(out.detections.boxes)
    v = np.asarray(out.detections.valid)
    assert np.all(b[v][:, 0] >= 0) and np.all(b[v][:, 2] <= cfg.input.width)
    # scores sorted desc among valid
    s = np.asarray(out.detections.scores)[v]
    assert np.all(np.diff(s) <= 1e-6)


def test_episode_scan_runs_and_accumulates(model_and_params, rng):
    cfg, model, params = model_and_params
    t = 3
    frames = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[_dummy_frame(cfg, rng, reset=(i == 0), start=(i == 0))
          for i in range(t)])
    zs = jnp.asarray(rng.randn(cfg.roi.zs_weight_dim,
                               cfg.roi.num_classes + 1).astype(np.float32))
    runner = jax.jit(make_episode_runner(model, cfg))
    init = MemoryState.zeros(cfg.memory.max_cells, cfg.memory.memory_dim)
    out = runner(params, frames, zs, init)
    assert out.detections.boxes.shape == (t, cfg.roi.detections_per_image, 4)
    assert out.memory.features.shape == (cfg.memory.max_cells,
                                         cfg.memory.memory_dim)
    # memory observation counts are non-negative and integral-ish
    obs = np.asarray(out.memory.obs_count)
    assert np.all(obs >= 0)


def test_memory_reset_zeroes_state(model_and_params, rng):
    cfg, model, params = model_and_params
    # two frames, second one resets: final memory only reflects frame 2
    f1 = _dummy_frame(cfg, rng, reset=True, start=True)
    f2 = _dummy_frame(cfg, rng, reset=True, start=True)
    frames = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), f1, f2)
    zs = jnp.asarray(rng.randn(cfg.roi.zs_weight_dim,
                               cfg.roi.num_classes + 1).astype(np.float32))
    runner = jax.jit(make_episode_runner(model, cfg))
    init = MemoryState.zeros(cfg.memory.max_cells, cfg.memory.memory_dim)
    out2 = runner(params, frames, zs, init)

    frames1 = jax.tree_util.tree_map(lambda x: x[1:], frames)
    out1 = runner(params, frames1, zs, init)
    np.testing.assert_allclose(np.asarray(out2.memory.features),
                               np.asarray(out1.memory.features), atol=1e-5)


def test_frame_step_debug_outputs(model_and_params, rng):
    from embodied_object_detection_tpu.models.detector import EmbodiedDetector
    from embodied_object_detection_tpu.structures import MemoryState
    cfg, model, params = model_and_params
    f = _dummy_frame(cfg, rng)
    zs = jnp.asarray(rng.randn(cfg.roi.zs_weight_dim,
                               cfg.roi.num_classes + 1).astype(np.float32))
    mem = MemoryState.zeros(cfg.memory.max_cells, cfg.memory.memory_dim)
    out = model.apply(params, f.image, zs, mem.features, mem.obs_count,
                      f.proj_indices, f.outlier_mask,
                      method=EmbodiedDetector.frame_step_debug)
    r = cfg.centernet.post_nms_topk_test
    assert out["stage0_region_embeddings"].shape == (r, cfg.roi.zs_weight_dim)
    assert out["stage2_scores"].shape == (r, cfg.roi.num_classes + 1)
    # debug final detections equal frame_step's
    ref = model.apply(params, f.image, zs, mem.features, mem.obs_count,
                      f.proj_indices, f.outlier_mask,
                      method=EmbodiedDetector.frame_step)
    np.testing.assert_allclose(np.asarray(out["final_scores"]),
                               np.asarray(ref.detections.scores), atol=1e-5)


@pytest.mark.slow
def test_longterm_reads_frozen_snapshot(model_and_params, rng):
    """longterm mode reads the episode-start memory snapshot while default
    mode reads the live memory (ref: custom_rcnn.py:482-491) — with writes
    happening at frame 0, frame-1 outputs must diverge between modes."""
    import dataclasses
    from embodied_object_detection_tpu.models.detector import (
        make_episode_runner)
    cfg, model, params = model_and_params
    f0 = _dummy_frame(cfg, rng, reset=True, start=True)
    f1 = _dummy_frame(cfg, rng, reset=False, start=False)
    frames = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), f0, f1)
    zs = jnp.asarray(rng.randn(cfg.roi.zs_weight_dim,
                               cfg.roi.num_classes + 1).astype(np.float32))
    init = MemoryState.zeros(cfg.memory.max_cells, cfg.memory.memory_dim)

    out_default = jax.jit(make_episode_runner(model, cfg))(
        params, frames, zs, init)
    cfg_lt = cfg.replace(memory=dataclasses.replace(cfg.memory,
                                                    test_type="longterm"))
    out_longterm = jax.jit(make_episode_runner(model, cfg_lt))(
        params, frames, zs, init)

    # frame 0: identical in both modes (same zeroed snapshot)
    np.testing.assert_allclose(
        np.asarray(out_default.detections.scores[0]),
        np.asarray(out_longterm.detections.scores[0]), atol=1e-5)
    # writes happened at frame 0, so default's frame-1 read sees them and
    # longterm's does not -> outputs diverge
    assert bool(out_default.any_detection[0])
    assert not np.allclose(np.asarray(out_default.detections.scores[1]),
                           np.asarray(out_longterm.detections.scores[1]),
                           atol=1e-7)


def test_pipelined_runner_equals_serial(model_and_params, rng):
    """make_pipelined_episode_runner (trunk/scan split for host-side chunk
    pipelining) is numerically identical to make_episode_runner — only the
    dispatch order changes (VERDICT r3 next #4)."""
    from embodied_object_detection_tpu.models.detector import (
        make_pipelined_episode_runner)
    cfg, model, params = model_and_params
    t = 3
    frames = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[_dummy_frame(cfg, rng, reset=(i == 0), start=(i == 0))
          for i in range(t)])
    zs = jnp.asarray(rng.randn(cfg.roi.zs_weight_dim,
                               cfg.roi.num_classes + 1).astype(np.float32))
    init = MemoryState.zeros(cfg.memory.max_cells, cfg.memory.memory_dim)

    serial = jax.jit(make_episode_runner(model, cfg))
    want = serial(params, frames, zs, init)

    trunk_fn, scan_fn = make_pipelined_episode_runner(model, cfg)
    feats = jax.jit(trunk_fn)(params, frames.image)
    got = jax.jit(scan_fn)(params, frames, zs, init, feats)

    np.testing.assert_allclose(np.asarray(got.detections.scores),
                               np.asarray(want.detections.scores),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(got.detections.boxes),
                               np.asarray(want.detections.boxes),
                               rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.memory.features),
                               np.asarray(want.memory.features),
                               rtol=1e-6, atol=1e-6)
    # chained: chunk 2 consumes chunk 1's memory through the split path
    got2 = jax.jit(scan_fn)(params, frames, zs, got.memory, feats)
    want2 = serial(params, frames, zs, want.memory)
    np.testing.assert_allclose(np.asarray(got2.memory.features),
                               np.asarray(want2.memory.features),
                               rtol=1e-6, atol=1e-6)


def test_use_sigmoid_ce_false_scores_softmax(rng):
    """USE_SIGMOID_CE=False switches inference class probabilities to
    softmax (predict_probs, detic_fast_rcnn.py:334-338) — the knob must
    change eval scoring, not just the train loss."""
    import dataclasses
    from embodied_object_detection_tpu.models.detector import (
        EmbodiedDetector, build_detector)

    cfg = tiny_config()
    model, params = build_detector(cfg, jax.random.PRNGKey(0))
    h, w = cfg.input.height, cfg.input.width
    image = jnp.asarray(rng.randint(0, 255, (h, w, 3)).astype(np.float32))
    zs = jnp.asarray(rng.randn(cfg.roi.zs_weight_dim,
                               cfg.roi.num_classes + 1).astype(np.float32))
    memf = jnp.zeros((cfg.memory.max_cells, cfg.memory.memory_dim))
    memo = jnp.zeros((cfg.memory.max_cells,))
    proj = jnp.zeros((h, w), jnp.int32)
    outl = jnp.zeros((h, w), bool)

    def run(c):
        m = EmbodiedDetector(c)
        return m.apply(params, image, zs, memf, memo, proj, outl,
                       method=EmbodiedDetector.frame_step)

    sig = run(cfg)
    soft = run(cfg.replace(roi=dataclasses.replace(
        cfg.roi, use_sigmoid_ce=False)))
    assert not np.allclose(np.asarray(sig.detections.scores),
                           np.asarray(soft.detections.scores))
    # the memory write stays sigmoid-scored regardless of the knob
    # (inference_with_proposals calls .sigmoid() unconditionally,
    # custom_rcnn.py:853) — same rows selected either way
    np.testing.assert_array_equal(np.asarray(sig.write_valid),
                                  np.asarray(soft.write_valid))
    np.testing.assert_allclose(np.asarray(sig.write.features_update),
                               np.asarray(soft.write.features_update),
                               rtol=1e-5, atol=1e-6)
