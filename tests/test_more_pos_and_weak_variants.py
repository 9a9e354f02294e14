"""MORE_POS assignment + wsddn/min_loss image-label variants
(ref: centernet.py:748-878, detic_fast_rcnn.py:509-545)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from embodied_object_detection_tpu.config import CenterNetConfig
from embodied_object_detection_tpu.models.losses import (
    add_more_pos, image_label_loss)
from embodied_object_detection_tpu.structures import GroundTruth


def _cfg_1level():
    return dataclasses.replace(CenterNetConfig(), strides=(8,),
                               sizes_of_interest=((0, 10000),),
                               more_pos=True, more_pos_thresh=0.2,
                               more_pos_topk=9)


def test_more_pos_hand_computed():
    """One GT on an 8x8 stride-8 grid: center cell (3,3); neighbors whose
    regression prediction is (near-)exact become positives, bad ones don't."""
    cfg = _cfg_1level()
    g_cap = 2
    boxes = np.zeros((g_cap, 4), np.float32)
    boxes[0] = [8, 8, 40, 40]           # center (24,24) -> cell (3,3)
    gt = GroundTruth(boxes=jnp.asarray(boxes),
                     classes=jnp.asarray([2, 0], jnp.int32),
                     valid=jnp.asarray([True, False]))
    shapes = [(8, 8)]
    m = 64

    # center-cell ltrb in stride units: grid point (28,28); l=t=2.5, r=b=1.5
    base_reg = np.array([2.5, 2.5, 1.5, 1.5], np.float32)
    reg_pred = np.zeros((m, 4), np.float32)
    # exact predictions at center (3,3), left (2,3), above (3,2)
    reg_pred[3 * 8 + 3] = base_reg
    reg_pred[3 * 8 + 2] = base_reg + [-1, 0, 1, 0]     # dx=-1 shift
    reg_pred[2 * 8 + 3] = base_reg + [0, -1, 0, 1]     # dy=-1 shift
    # everything else predicts garbage (loss >> 0.2)

    mp = add_more_pos(jnp.asarray(reg_pred), gt, shapes, cfg)
    pos = set(np.asarray(mp.pos_inds)[np.asarray(mp.pos_valid)].tolist())
    assert 3 * 8 + 3 in pos          # real center always in (loss forced 0)
    assert 3 * 8 + 2 in pos
    assert 2 * 8 + 3 in pos
    # garbage neighbors excluded
    assert 4 * 8 + 4 not in pos
    assert len(pos) == 3
    labels = np.asarray(mp.labels)[np.asarray(mp.pos_valid)]
    assert (labels == 2).all()


def test_more_pos_invalid_gt_contributes_nothing():
    cfg = _cfg_1level()
    gt = GroundTruth(boxes=jnp.zeros((3, 4)),
                     classes=jnp.zeros((3,), jnp.int32),
                     valid=jnp.zeros((3,), bool))
    mp = add_more_pos(jnp.zeros((64, 4)), gt, [(8, 8)], cfg)
    assert not bool(np.asarray(mp.pos_valid).any())


def test_more_pos_thresh_gates_loose_predictions():
    """Neighbors below the kth-smallest loss but above more_pos_thresh are
    rejected (the min(kth, thresh) clamp, centernet.py:771-773)."""
    cfg = dataclasses.replace(_cfg_1level(), more_pos_thresh=1e-6)
    boxes = np.array([[8, 8, 40, 40]], np.float32)
    gt = GroundTruth(boxes=jnp.asarray(boxes),
                     classes=jnp.zeros((1,), jnp.int32),
                     valid=jnp.asarray([True]))
    reg_pred = np.full((64, 4), 0.7, np.float32)   # uniformly imperfect
    mp = add_more_pos(jnp.asarray(reg_pred), gt, [(8, 8)], cfg)
    pos = np.asarray(mp.pos_inds)[np.asarray(mp.pos_valid)]
    # only the real center survives (its loss is forced to exactly 0 < any
    # positive threshold... 0 < 1e-6)
    assert set(pos.tolist()) == {3 * 8 + 3}


def test_wsddn_loss_hand_computed():
    """WSDDN: img_score = sum_r sigmoid(s) * softmax_r(prop); BCE (mean over
    C+1) against the one-hot label (ref: detic_fast_rcnn.py:509-522)."""
    logits = jnp.asarray(np.array([[4.0, -4.0, 0.0],
                                   [-4.0, -4.0, 0.0]], np.float32))
    prop = jnp.asarray(np.array([[10.0, 0.0, 0.0],
                                 [-10.0, 0.0, 0.0]], np.float32))
    boxes = jnp.asarray(np.array([[0, 0, 10, 10], [0, 0, 5, 5]], np.float32))
    valid = jnp.ones((2,), bool)
    labels = jnp.asarray([0], jnp.int32)
    lv = jnp.ones((1,), bool)
    got = float(image_label_loss(logits, boxes, valid, labels, lv,
                                 num_classes=2, variant="wsddn",
                                 image_loss_weight=1.0, prop_logits=prop))
    s = jax.nn.sigmoid(logits)
    w = jax.nn.softmax(prop, axis=0)
    img = np.clip(np.asarray(jnp.sum(s * w, axis=0)), 1e-10, 1 - 1e-10)
    t = np.array([1.0, 0.0, 0.0])
    want = float(np.mean(-(t * np.log(img) + (1 - t) * np.log(1 - img))))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_min_loss_selects_best_row():
    # row 0 matches the label strongly; row 1 (the largest non-image box)
    # matches the anti-label; row 2 plays the appended image box.
    logits = jnp.asarray(np.array([[8.0, -8.0, -8.0],
                                   [-8.0, 8.0, -8.0],
                                   [-8.0, 8.0, -8.0]], np.float32))
    boxes = jnp.asarray(np.array([[0, 0, 10, 10], [0, 0, 90, 90],
                                  [0, 0, 100, 100]], np.float32))
    valid = jnp.ones((3,), bool)
    labels = jnp.asarray([0], jnp.int32)
    lv = jnp.ones((1,), bool)
    min_loss = float(image_label_loss(logits, boxes, valid, labels, lv,
                                      num_classes=2, variant="min_loss",
                                      image_loss_weight=1.0))
    # max_size would pick row 1 (larger box), giving a much bigger loss
    max_size = float(image_label_loss(logits, boxes, valid, labels, lv,
                                      num_classes=2, variant="max_size",
                                      image_loss_weight=1.0))
    assert min_loss < 0.01
    assert max_size > 8.0


@pytest.mark.slow
def test_frame_train_weak_wsddn_end_to_end(rng):
    from common import tiny_config
    from embodied_object_detection_tpu.models.detector import (
        EmbodiedDetector, build_detector)
    cfg = tiny_config()
    cfg = cfg.replace(roi=dataclasses.replace(cfg.roi,
                                              with_softmax_prop=True))
    model, params = build_detector(cfg, jax.random.PRNGKey(0))
    assert "prop_score0" in params["params"]
    h, w = cfg.input.height, cfg.input.width
    img = jnp.asarray(rng.randint(0, 255, (h, w, 3)).astype(np.float32))
    zs = jnp.asarray(rng.randn(cfg.roi.zs_weight_dim,
                               cfg.roi.num_classes + 1).astype(np.float32))
    labels = jnp.asarray([1, 3], jnp.int32)
    lv = jnp.ones((2,), bool)

    def loss_fn(p):
        losses = model.apply(p, img, zs, labels, lv, variant="wsddn",
                             method=EmbodiedDetector.frame_train_weak)
        return sum(jnp.sum(v) for v in losses.values())

    total, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(total))
    g = float(jnp.sum(jnp.abs(
        grads["params"]["prop_score0"]["fc1"]["kernel"])))
    assert g > 0


@pytest.mark.slow
def test_frame_train_more_pos_end_to_end(rng):
    from common import tiny_config
    from embodied_object_detection_tpu.models.detector import (
        EmbodiedDetector, build_detector)
    from embodied_object_detection_tpu.structures import GroundTruth
    cfg = tiny_config()
    cfg = cfg.replace(centernet=dataclasses.replace(cfg.centernet,
                                                    more_pos=True))
    model, params = build_detector(cfg, jax.random.PRNGKey(0))
    h, w = cfg.input.height, cfg.input.width
    img = jnp.asarray(rng.randint(0, 255, (h, w, 3)).astype(np.float32))
    zs = jnp.asarray(rng.randn(cfg.roi.zs_weight_dim,
                               cfg.roi.num_classes + 1).astype(np.float32))
    g = cfg.input.max_gt_boxes
    boxes = np.zeros((g, 4), np.float32)
    boxes[0] = [16, 16, 90, 100]
    gt = GroundTruth(boxes=jnp.asarray(boxes),
                     classes=jnp.zeros((g,), jnp.int32),
                     valid=jnp.asarray([True] + [False] * (g - 1)))
    mem = jnp.zeros((cfg.memory.max_cells, cfg.memory.memory_dim))
    obs = jnp.zeros((cfg.memory.max_cells,))
    proj = jnp.zeros((h, w), jnp.int32)
    losses = model.apply(params, img, zs, mem, obs, proj, gt,
                         method=EmbodiedDetector.frame_train)
    assert all(np.isfinite(float(jnp.sum(v))) for v in losses.values())
