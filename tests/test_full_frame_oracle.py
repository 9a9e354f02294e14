"""FULL-FRAME torch oracle parity (the round-3 parity capstone).

One torch re-derivation of the whole recurrent frame — backbone -> FPN with
implicit-memory fusion -> CenterNet decode+NMS -> 3-stage cascade -> final
multiclass NMS -> mask head -> memory write — with weights shared through
convert/torch_weights.py, compared against EmbodiedDetector.frame_step at
tiny-but-real shapes. Includes the 2-frame recurrence check: frame 2 reads
the memory frame 1 wrote.

This is the strongest in-env proxy for the (data-unavailable) 0.1-mAP golden
checkpoint gate: it exercises every layer, the converter, and every inter-op
boundary (dtype casts, padding semantics at stage joints) in one chain.
ref: custom_rcnn.py:548-582 (inference), :681-760 (update_implicit_memory).
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

from torch_frame_oracle import TorchFrameOracle  # noqa: E402


def _oracle_config() -> DetectorConfig:
    cfg = DetectorConfig()
    return cfg.replace(
        compute_dtype="float32",
        backbone=dataclasses.replace(cfg.backbone, depths=(1, 1, 1, 1)),
        input=dataclasses.replace(cfg.input, height=64, width=96,
                                  max_gt_boxes=8),
        centernet=dataclasses.replace(cfg.centernet, pre_nms_topk_test=64,
                                      post_nms_topk_test=16),
        roi=dataclasses.replace(cfg.roi, detections_per_image=16,
                                num_classes=5),
        memory=dataclasses.replace(cfg.memory, max_cells=64, write_topk=8,
                                   exact_write_subsample=True),
    )


def _sorted_valid(det):
    b = np.asarray(det.boxes)[np.asarray(det.valid)]
    s = np.asarray(det.scores)[np.asarray(det.valid)]
    c = np.asarray(det.classes)[np.asarray(det.valid)]
    o = np.argsort(-s, kind="stable")
    return b[o], s[o], c[o]


@pytest.fixture(scope="module")
def frame_fixture():
    """Shared torch oracle + converted flax model + inputs."""
    cfg = _oracle_config()
    oracle = TorchFrameOracle(cfg, seed=7)
    sd = oracle.to_reference_state_dict()
    tree, _ = convert_state_dict(sd)
    assert "_unmapped" not in tree, tree.get("_unmapped")

    from embodied_object_detection_tpu.models.detector import build_detector
    model, init_params = build_detector(cfg, jax.random.PRNGKey(0))
    missing, extra, mismatch = verify_against_model(tree, init_params)
    assert not missing, missing
    assert not extra, extra
    assert not mismatch, mismatch
    params = {"params": jax.tree_util.tree_map(jnp.asarray, tree["params"])}

    rng = np.random.RandomState(11)
    h, w = cfg.input.height, cfg.input.width
    image = rng.randint(0, 255, (h, w, 3)).astype(np.float32)
    # blocky projection: contiguous cell patches like a real projection
    cells = cfg.memory.max_cells
    proj = np.zeros((h, w), np.int32)
    for i in range(8):
        for j in range(8):
            proj[i * h // 8:(i + 1) * h // 8, j * w // 8:(j + 1) * w // 8] = \
                rng.randint(0, cells)
    zs = rng.randn(cfg.roi.zs_weight_dim, cfg.roi.num_classes + 1)
    zs = zs.astype(np.float32)
    zs[:, -1] = 0.0
    zs[:, :-1] /= np.linalg.norm(zs[:, :-1], axis=0, keepdims=True)

    return dict(cfg=cfg, oracle=oracle, model=model, params=params,
                image=image, proj=proj, zs=zs)


def _flax_frame(fx, memf, memo):
    from embodied_object_detection_tpu.models.detector import EmbodiedDetector
    cfg = fx["cfg"]
    h, w = cfg.input.height, cfg.input.width
    return fx["model"].apply(
        fx["params"], jnp.asarray(fx["image"]), jnp.asarray(fx["zs"]),
        jnp.asarray(memf), jnp.asarray(memo), jnp.asarray(fx["proj"]),
        jnp.zeros((h, w), bool), method=EmbodiedDetector.frame_step)


@pytest.mark.slow
def test_full_frame_and_recurrence_vs_torch(frame_fixture):
    fx = frame_fixture
    cfg = fx["cfg"]
    cells, d = cfg.memory.max_cells, cfg.memory.memory_dim

    # ---------------- frame 1: zero memory (post-reset episode start)
    memf = np.zeros((cells, d), np.float32)
    memo = np.zeros((cells,), np.float32)
    want = fx["oracle"].frame(fx["image"], fx["zs"], memf, memo, fx["proj"])
    got = _flax_frame(fx, memf, memo)

    # proposals (CenterNet decode + NMS): same set, same scores
    pb = np.asarray(got.proposals.boxes)[np.asarray(got.proposals.valid)]
    ps = np.asarray(got.proposals.scores)[np.asarray(got.proposals.valid)]
    o_g, o_w = np.argsort(-ps), np.argsort(-want["proposal_scores"])
    assert len(ps) == len(want["proposal_scores"])
    np.testing.assert_allclose(ps[o_g], want["proposal_scores"][o_w],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(pb[o_g], want["proposal_boxes"][o_w],
                               rtol=1e-3, atol=5e-3)

    # final detections: boxes, scores AND classes
    gb, gs, gc = _sorted_valid(got.detections)
    o_w = np.argsort(-want["scores"], kind="stable")
    assert len(gs) == len(want["scores"])
    np.testing.assert_allclose(gs, want["scores"][o_w], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(gb, want["boxes"][o_w], rtol=1e-3, atol=5e-3)
    assert (gc == want["classes"][o_w]).all()

    # memory write: selected rows, feature update, observation update
    wvalid = np.asarray(got.write_valid)
    assert wvalid.sum() == len(want["write_rows"])
    np.testing.assert_allclose(np.asarray(got.write_boxes)[wvalid],
                               want["write_boxes"], rtol=1e-3, atol=5e-3)
    upd = np.asarray(got.write.features_update)
    np.testing.assert_allclose(upd, want["features_update"],
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got.write.obs_update),
                               want["obs_update"])

    # ---------------- frame 2: reads frame 1's write (the recurrence)
    memf2_w = want["new_features"]
    memo2_w = want["new_obs"]
    memf2_g = memf + upd
    memo2_g = memo + np.asarray(got.write.obs_update)
    assert np.abs(memf2_w).max() > 0, "frame 1 wrote nothing — weak fixture"

    want2 = fx["oracle"].frame(fx["image"], fx["zs"], memf2_w, memo2_w,
                               fx["proj"])
    got2 = _flax_frame(fx, memf2_g, memo2_g)

    gb2, gs2, gc2 = _sorted_valid(got2.detections)
    o_w2 = np.argsort(-want2["scores"], kind="stable")
    assert len(gs2) == len(want2["scores"])
    np.testing.assert_allclose(gs2, want2["scores"][o_w2], rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(gb2, want2["boxes"][o_w2], rtol=1e-3,
                               atol=1e-2)
    assert (gc2 == want2["classes"][o_w2]).all()

    # frame-2 memory must differ from frame 1's output (the read mattered)
    # and the two implementations' frame-2 writes must agree
    np.testing.assert_allclose(np.asarray(got2.write.features_update),
                               want2["features_update"], rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got2.write.obs_update),
                               want2["obs_update"])


@pytest.mark.slow
def test_memory_fusion_changes_output(frame_fixture):
    """Sanity: the implicit-memory read actually influences detections —
    the frame-2 comparison above is not vacuous."""
    fx = frame_fixture
    cfg = fx["cfg"]
    cells, d = cfg.memory.max_cells, cfg.memory.memory_dim
    rng = np.random.RandomState(3)
    memf = rng.randn(cells, d).astype(np.float32) * 5.0
    memo = np.ones((cells,), np.float32)

    got_zero = _flax_frame(fx, np.zeros((cells, d), np.float32),
                           np.zeros((cells,), np.float32))
    got_mem = _flax_frame(fx, memf, memo)
    s0 = np.asarray(got_zero.detections.scores)
    s1 = np.asarray(got_mem.detections.scores)
    assert not np.allclose(s0, s1)

    # and the torch oracle agrees under that same nonzero memory
    want = fx["oracle"].frame(fx["image"], fx["zs"], memf, memo, fx["proj"])
    gb, gs, gc = _sorted_valid(got_mem.detections)
    o_w = np.argsort(-want["scores"], kind="stable")
    assert len(gs) == len(want["scores"])
    np.testing.assert_allclose(gs, want["scores"][o_w], rtol=1e-3, atol=1e-4)
    assert (gc == want["classes"][o_w]).all()
