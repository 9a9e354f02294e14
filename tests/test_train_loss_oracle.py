"""frame_train loss parity vs the torch training-side oracle.

Completes the parity story on the training side: CenterNet GT assignment
(peak positives, center-3x3 regression masks, gaussian-ish agnostic
heatmaps), focal/gIoU losses, training-time proposal decode, GT injection,
and all three cascade stages' matching + sigmoid-CE/gIoU losses — computed
by an independent torch re-derivation with converter-shared weights and
compared against EmbodiedDetector.frame_train. ref: forward_model
(custom_rcnn.py:584-679), centernet.py:183-318/342-570,
detic_fast_rcnn.py:157-300.
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
from embodied_object_detection_tpu.structures import GroundTruth  # noqa: E402

from torch_frame_oracle import TorchFrameOracle  # noqa: E402


def _train_oracle_config() -> DetectorConfig:
    cfg = DetectorConfig()
    return cfg.replace(
        compute_dtype="float32",
        backbone=dataclasses.replace(cfg.backbone, depths=(1, 1, 1, 1)),
        input=dataclasses.replace(cfg.input, height=64, width=96,
                                  max_gt_boxes=4),
        centernet=dataclasses.replace(cfg.centernet, pre_nms_topk_train=64,
                                      post_nms_topk_train=16),
        # batch_size_per_image (512) > 16 proposals + 4 gt, so the proposal
        # sampler is the identity (ARCHITECTURE divergence #5) and the two
        # implementations see the same row set
        roi=dataclasses.replace(cfg.roi, detections_per_image=8,
                                num_classes=5),
        memory=dataclasses.replace(cfg.memory, max_cells=64, write_topk=4),
    )


@pytest.mark.slow
def test_frame_train_losses_vs_torch_oracle():
    cfg = _train_oracle_config()
    oracle = TorchFrameOracle(cfg, seed=13)
    tree, _ = convert_state_dict(oracle.to_reference_state_dict())

    from embodied_object_detection_tpu.models.detector import (
        EmbodiedDetector, build_detector)
    model, init_params = build_detector(cfg, jax.random.PRNGKey(0))
    missing, extra, mismatch = verify_against_model(tree, init_params)
    assert not missing and not extra and not mismatch
    params = {"params": jax.tree_util.tree_map(jnp.asarray, tree["params"])}

    rng = np.random.RandomState(5)
    h, w = cfg.input.height, cfg.input.width
    cells, d = cfg.memory.max_cells, cfg.memory.memory_dim
    image = rng.randint(0, 255, (h, w, 3)).astype(np.float32)
    proj = rng.randint(0, cells, (h, w)).astype(np.int32)
    memf = (rng.randn(cells, d) * 2).astype(np.float32)
    memo = rng.randint(0, 4, (cells,)).astype(np.float32)
    zs = rng.randn(cfg.roi.zs_weight_dim,
                   cfg.roi.num_classes + 1).astype(np.float32)
    zs[:, -1] = 0.0
    zs[:, :-1] /= np.linalg.norm(zs[:, :-1], axis=0, keepdims=True)

    g = cfg.input.max_gt_boxes
    gt_boxes = np.zeros((g, 4), np.float32)
    gt_classes = np.zeros((g,), np.int32)
    gt_valid = np.zeros((g,), bool)
    gt_boxes[0] = [12, 10, 52, 46]       # mid-size box
    gt_boxes[1] = [60, 20, 90, 58]       # second object, different class
    gt_classes[:2] = [1, 3]
    gt_valid[:2] = True

    want = oracle.train_losses(image, zs, memf, memo, proj,
                               gt_boxes[gt_valid], gt_classes[gt_valid])

    gt = GroundTruth(boxes=jnp.asarray(gt_boxes),
                     classes=jnp.asarray(gt_classes),
                     valid=jnp.asarray(gt_valid))
    got = model.apply(params, jnp.asarray(image), jnp.asarray(zs),
                      jnp.asarray(memf), jnp.asarray(memo),
                      jnp.asarray(proj), gt,
                      method=EmbodiedDetector.frame_train)
    got = {k: float(v) for k, v in got.items()}

    assert set(got) == set(want), (sorted(got), sorted(want))
    for k in sorted(want):
        np.testing.assert_allclose(got[k], want[k], rtol=2e-3, atol=2e-4,
                                   err_msg=k)
    # the fixture is non-degenerate: positives exist and cascade sees fg
    assert want["loss_centernet_agn_pos"] > 0
    assert want["loss_box_reg_stage0"] > 0
