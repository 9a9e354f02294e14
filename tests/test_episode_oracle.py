"""EPISODE-level torch oracle parity (VERDICT r3 #6).

Chains the full-frame torch oracle (tests/torch_frame_oracle.py) over a
T=5 frame chunk — including a mid-chunk memory_reset and the longterm
frozen-snapshot branch — and compares against make_episode_runner's scan.
Today's frame oracle covers 2-frame recurrence; this covers the reset /
test_type gating *inside* the scan (models/detector.py step() vs
custom_rcnn.py:466-539):

  default/episodic: reset -> zeros; the read memory tracks the live
                    memory every frame (custom_rcnn.py:489-491)
  longterm:         the read memory is snapshotted only at episode starts
                    (:482-486); within an episode the model sees frozen
                    memory while the live memory keeps accumulating
"""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from embodied_object_detection_tpu.config import DetectorConfig  # noqa: E402
from embodied_object_detection_tpu.convert.torch_weights import (  # noqa: E402
    convert_state_dict, verify_against_model)
from embodied_object_detection_tpu.models.detector import (  # noqa: E402
    FrameInputs, build_detector, make_episode_runner)
from embodied_object_detection_tpu.structures import MemoryState  # noqa: E402

from torch_frame_oracle import TorchFrameOracle  # noqa: E402
from test_full_frame_oracle import _oracle_config  # noqa: E402


T = 5


def _episode_fixture(test_type: str):
    cfg = _oracle_config().replace()
    cfg = cfg.replace(memory=dataclasses.replace(cfg.memory,
                                                 test_type=test_type))
    oracle = TorchFrameOracle(cfg, seed=7)
    sd = oracle.to_reference_state_dict()
    tree, _ = convert_state_dict(sd)
    model, init_params = build_detector(cfg, jax.random.PRNGKey(0))
    missing, extra, mismatch = verify_against_model(tree, init_params)
    assert not missing and not extra and not mismatch
    params = {"params": jax.tree_util.tree_map(jnp.asarray, tree["params"])}

    rng = np.random.RandomState(11)
    h, w = cfg.input.height, cfg.input.width
    cells = cfg.memory.max_cells
    images = rng.randint(0, 255, (T, h, w, 3)).astype(np.float32)
    projs = np.zeros((T, h, w), np.int32)
    for t in range(T):
        for i in range(8):
            for j in range(8):
                projs[t, i * h // 8:(i + 1) * h // 8,
                      j * w // 8:(j + 1) * w // 8] = rng.randint(0, cells)
    zs = rng.randn(cfg.roi.zs_weight_dim, cfg.roi.num_classes + 1)
    zs = zs.astype(np.float32)
    zs[:, -1] = 0.0
    zs[:, :-1] /= np.linalg.norm(zs[:, :-1], axis=0, keepdims=True)
    return cfg, oracle, model, params, images, projs, zs


def _visibility(proj, cells):
    return (np.bincount(proj.ravel(), minlength=cells)[:cells] > 0) \
        .astype(np.float32)


def _run_episode(cfg, model, params, images, projs, zs, resets, starts):
    cells = cfg.memory.max_cells
    frames = FrameInputs(
        image=jnp.asarray(images),
        proj_indices=jnp.asarray(projs),
        outlier_mask=jnp.zeros(projs.shape, bool),
        obs_visibility=jnp.asarray(np.stack(
            [_visibility(projs[t], cells) for t in range(T)])),
        memory_reset=jnp.asarray(resets),
        episode_start=jnp.asarray(starts),
    )
    runner = jax.jit(make_episode_runner(model, cfg))
    init = MemoryState.zeros(cells, cfg.memory.memory_dim)
    return runner(params, frames, zs, init)


def _oracle_episode(cfg, oracle, images, projs, zs, resets, starts):
    """The reference recurrent state machine over oracle.frame
    (custom_rcnn.py:466-539)."""
    cells, d = cfg.memory.max_cells, cfg.memory.memory_dim
    live_f = np.zeros((cells, d), np.float32)
    live_o = np.zeros((cells,), np.float32)
    snap_f, snap_o = live_f, live_o
    per_frame = []
    for t in range(T):
        if resets[t]:
            live_f = np.zeros((cells, d), np.float32)
            live_o = np.zeros((cells,), np.float32)
            snap_f, snap_o = live_f, live_o
        if cfg.memory.test_type in ("default", "episodic"):
            snap_f, snap_o = live_f, live_o
        elif starts[t]:
            snap_f, snap_o = live_f, live_o
        out = oracle.frame(images[t], zs, snap_f, snap_o, projs[t])
        live_f = live_f + out["features_update"]
        live_o = live_o + out["obs_update"]
        per_frame.append(out)
    return per_frame, live_f, live_o


def _check(got, per_frame, final_f, final_o):
    for t in range(T):
        want = per_frame[t]
        v = np.asarray(got.detections.valid[t])
        gs = np.asarray(got.detections.scores[t])[v]
        gb = np.asarray(got.detections.boxes[t])[v]
        gc = np.asarray(got.detections.classes[t])[v]
        o_g = np.argsort(-gs, kind="stable")
        o_w = np.argsort(-want["scores"], kind="stable")
        assert len(gs) == len(want["scores"]), f"frame {t} count"
        np.testing.assert_allclose(gs[o_g], want["scores"][o_w], rtol=2e-3,
                                   atol=1e-4, err_msg=f"frame {t} scores")
        np.testing.assert_allclose(gb[o_g], want["boxes"][o_w], rtol=2e-3,
                                   atol=2e-2, err_msg=f"frame {t} boxes")
        assert (gc[o_g] == want["classes"][o_w]).all(), f"frame {t} classes"
    np.testing.assert_allclose(np.asarray(got.memory.features), final_f,
                               rtol=2e-3, atol=2e-3, err_msg="final memory")
    np.testing.assert_allclose(np.asarray(got.memory.obs_count), final_o,
                               err_msg="final obs")


@pytest.mark.slow
def test_episode_default_with_midchunk_reset_vs_torch():
    """default: live read every frame; frame 3 carries a mid-chunk reset
    (scene boundary inside a chunk) that must wipe the carry."""
    cfg, oracle, model, params, images, projs, zs = _episode_fixture("default")
    resets = np.array([True, False, False, True, False])
    starts = np.array([True, False, False, True, False])
    got = _run_episode(cfg, model, params, images, projs, zs, resets, starts)
    per_frame, ff, fo = _oracle_episode(cfg, oracle, images, projs, zs,
                                        resets, starts)
    # the chain is only meaningful if memory accumulated across frames
    assert np.abs(ff).max() > 0
    _check(got, per_frame, ff, fo)


@pytest.mark.slow
def test_episode_longterm_frozen_snapshot_vs_torch():
    """longterm: frames 1-2 read the frame-0 snapshot while the live memory
    accumulates; the frame-3 episode_start (without reset) swaps in the
    accumulated memory (custom_rcnn.py:482-486)."""
    cfg, oracle, model, params, images, projs, zs = \
        _episode_fixture("longterm")
    resets = np.array([True, False, False, False, False])
    starts = np.array([True, False, False, True, False])
    got = _run_episode(cfg, model, params, images, projs, zs, resets, starts)
    per_frame, ff, fo = _oracle_episode(cfg, oracle, images, projs, zs,
                                        resets, starts)
    assert np.abs(ff).max() > 0
    _check(got, per_frame, ff, fo)
    # the frozen branch must have been exercised: frame 3's read memory
    # (the new snapshot) differs from frame 1-2's (zeros at frame 0)
    upd01 = per_frame[0]["features_update"] + per_frame[1]["features_update"]
    assert np.abs(upd01).max() > 0
