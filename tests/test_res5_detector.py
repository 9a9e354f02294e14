"""Res5ROIHeads variant tests (ref: res5_roi_heads.py:20-172): stage-4
sharing with the backbone, shapes, and training gradients."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from common import tiny_config


def _cfg():
    cfg = tiny_config()
    return cfg.replace(roi=dataclasses.replace(cfg.roi, head_type="res5"))


def _inputs(cfg, rng):
    h, w = cfg.input.height, cfg.input.width
    img = jnp.asarray(rng.randint(0, 255, (h, w, 3)).astype(np.float32))
    zs = jnp.asarray(rng.randn(cfg.roi.zs_weight_dim,
                               cfg.roi.num_classes + 1).astype(np.float32))
    return img, zs


@pytest.mark.slow
def test_res5_frame_step_shapes(rng):
    from embodied_object_detection_tpu.models.res5_detector import (
        Res5Detector, build_res5_detector)
    cfg = _cfg()
    model, params = build_res5_detector(cfg, jax.random.PRNGKey(0))
    img, zs = _inputs(cfg, rng)
    out = jax.jit(lambda p, i, z: model.apply(
        p, i, z, method=Res5Detector.frame_step))(params, img, zs)
    r = cfg.centernet.post_nms_topk_test
    assert out.detections.boxes.shape == (cfg.roi.detections_per_image, 4)
    assert out.logits.shape == (r, cfg.roi.num_classes + 1)
    assert out.clip_feats.shape == (r, cfg.roi.zs_weight_dim)
    assert np.all(np.isfinite(np.asarray(out.detections.scores)))
    # res5 params are the backbone's layer4 — shared, not duplicated
    names = set(params["params"]["backbone"].keys())
    assert "layer4_0" in names
    assert "res5" not in names


@pytest.mark.slow
def test_res5_train_grads_flow_through_shared_stage(rng):
    from embodied_object_detection_tpu.models.res5_detector import (
        Res5Detector, build_res5_detector)
    from embodied_object_detection_tpu.structures import GroundTruth
    cfg = _cfg()
    model, params = build_res5_detector(cfg, jax.random.PRNGKey(0))
    img, zs = _inputs(cfg, rng)
    g = cfg.input.max_gt_boxes
    boxes = np.zeros((g, 4), np.float32)
    boxes[0] = [16, 16, 90, 100]
    gt = GroundTruth(boxes=jnp.asarray(boxes),
                     classes=jnp.zeros((g,), jnp.int32),
                     valid=jnp.asarray([True] + [False] * (g - 1)))

    def loss_fn(p):
        losses = model.apply(p, img, zs, gt,
                             method=Res5Detector.frame_train)
        return sum(jnp.sum(v) for v in losses.values()), losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(total))
    assert "loss_cls" in losses or any("cls" in k for k in losses)
    # gradient reaches layer4 through BOTH the ROI path (res5 on pooled
    # features); conv weights of the shared stage must be nonzero-grad
    l4 = grads["params"]["backbone"]["layer4_0"]["conv1"]["kernel"]
    assert float(jnp.sum(jnp.abs(l4))) > 0


def test_build_detector_dispatches_on_head_type():
    """roi.head_type='res5' must actually select the Res5 variant through
    the common build_detector entry (was a dead knob)."""
    import dataclasses
    import jax
    from common import tiny_config
    from embodied_object_detection_tpu.models.detector import build_detector
    from embodied_object_detection_tpu.models.res5_detector import (
        Res5Detector)
    cfg = tiny_config()
    cfg = cfg.replace(roi=dataclasses.replace(cfg.roi, head_type="res5"))
    model, params = build_detector(cfg, jax.random.PRNGKey(0))
    assert isinstance(model, Res5Detector)
