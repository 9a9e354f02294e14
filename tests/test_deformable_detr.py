"""Deformable-DETR: forward shapes, matcher, losses, inference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from embodied_object_detection_tpu.models.deformable_detr import (
    DeformableDETR, matcher_cost_matrix, hungarian_match, detr_losses,
    detr_inference, position_embedding_sine, boxes_cxcywh_to_xyxy)
from embodied_object_detection_tpu.structures import GroundTruth


def _feats(rng, c=32):
    return [jnp.asarray(rng.randn(*s, c).astype(np.float32))
            for s in [(16, 20), (8, 10), (4, 5), (2, 3)]]


@pytest.fixture(scope="module")
def detr_and_params():
    rng = np.random.RandomState(0)
    model = DeformableDETR(num_classes=5, hidden_dim=32, heads=4,
                           enc_layers=2, dec_layers=2, ffn=64,
                           num_queries=12, levels=4, points=2)
    params = model.init(jax.random.PRNGKey(0), _feats(rng))
    return model, params


def test_pos_embedding_shape():
    pe = position_embedding_sine(6, 8, 32)
    assert pe.shape == (6, 8, 32)
    assert np.abs(np.asarray(pe)).max() <= 1.0 + 1e-6


def test_forward_shapes(detr_and_params, rng):
    model, params = detr_and_params
    out = model.apply(params, _feats(rng))
    assert out.logits.shape == (2, 12, 5)
    assert out.boxes_cxcywh.shape == (2, 12, 4)
    b = np.asarray(out.boxes_cxcywh)
    assert (b >= 0).all() and (b <= 1).all()


def _gt(boxes, classes, capacity=4):
    g = len(boxes)
    b = np.zeros((capacity, 4), np.float32)
    c = np.zeros((capacity,), np.int32)
    v = np.zeros((capacity,), bool)
    b[:g] = boxes
    c[:g] = classes
    v[:g] = True
    return GroundTruth(jnp.asarray(b), jnp.asarray(c), jnp.asarray(v))


def test_matcher_prefers_good_query():
    q, c = 4, 5
    logits = np.full((q, c), -10.0, np.float32)
    boxes = np.tile(np.array([[0.1, 0.1, 0.05, 0.05]], np.float32), (q, 1))
    # query 2 predicts the gt box + class well
    logits[2, 3] = 10.0
    boxes[2] = [0.5, 0.5, 0.25, 0.25]
    gt = _gt([[60, 60, 100, 100]], [3])        # in a 160x160 image
    cost = matcher_cost_matrix(jnp.asarray(logits), jnp.asarray(boxes), gt,
                               (160, 160))
    qi, gi = hungarian_match(np.asarray(cost), np.asarray(gt.valid))
    assert list(qi) == [2] and list(gi) == [0]


def test_losses_drop_for_better_predictions():
    q, c = 4, 5
    gt = _gt([[60, 60, 100, 100]], [3])
    good_logits = np.full((q, c), -8.0, np.float32)
    good_logits[0, 3] = 8.0
    good_boxes = np.tile(np.array([[0.9, 0.9, 0.01, 0.01]], np.float32), (q, 1))
    good_boxes[0] = [0.5, 0.5, 0.25, 0.25]
    mq = jnp.asarray([0, 0, 0, 0])
    mg = jnp.asarray([0, 0, 0, 0])
    mv = jnp.asarray([True, False, False, False])
    good = detr_losses(jnp.asarray(good_logits), jnp.asarray(good_boxes), gt,
                       mq, mg, mv, (160, 160), c)
    bad_logits = np.full((q, c), 0.0, np.float32)
    bad_boxes = np.full((q, 4), 0.1, np.float32)
    bad = detr_losses(jnp.asarray(bad_logits), jnp.asarray(bad_boxes), gt,
                      mq, mg, mv, (160, 160), c)
    assert float(good["loss_ce"]) < float(bad["loss_ce"])
    assert float(good["loss_bbox"]) < float(bad["loss_bbox"])
    assert float(good["loss_giou"]) < float(bad["loss_giou"])


def test_inference_topk(detr_and_params, rng):
    model, params = detr_and_params
    out = model.apply(params, _feats(rng))
    dets = detr_inference(out.logits[-1], out.boxes_cxcywh[-1], (128, 160),
                          topk=10)
    assert dets.boxes.shape == (10, 4)
    s = np.asarray(dets.scores)
    assert np.all(np.diff(s) <= 1e-6)          # sorted desc


def test_zeroshot_classifier_variant(rng):
    model = DeformableDETR(num_classes=5, hidden_dim=32, heads=4,
                           enc_layers=1, dec_layers=1, ffn=64,
                           num_queries=6, levels=4, points=2,
                           use_zeroshot=True, zs_dim=16)
    zs = jnp.asarray(rng.randn(16, 6).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), _feats(rng), zs)
    out = model.apply(params, _feats(rng), zs)
    assert out.logits.shape == (1, 6, 5)


@pytest.mark.slow
def test_end_to_end_detr_train_step(rng):
    import dataclasses
    from common import tiny_config
    from embodied_object_detection_tpu.models.deformable_detr import (
        DeformableDetrDetector, detr_train_step_host_matched)

    cfg = tiny_config()
    model = DeformableDetrDetector(cfg, num_queries=8)
    h, w = cfg.input.height, cfg.input.width
    img = jnp.asarray(rng.randn(h, w, 3).astype(np.float32) * 50 + 100)
    params = model.init(jax.random.PRNGKey(0), img)
    out = model.apply(params, img)
    assert out.logits.shape == (6, 8, cfg.roi.num_classes)

    gt = _gt([[20, 20, 80, 90]], [2], capacity=4)
    (total, aux), grads = detr_train_step_host_matched(
        model, params, img, gt, (h, w))
    assert np.isfinite(float(total))
    gnorm = float(jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(jnp.abs(x)), grads, 0.0))
    assert gnorm > 0


def test_two_stage_forward_and_refs(rng):
    """TWO_STAGE (ref: d2_deformable_detr.py:124,
    deformable_transformer.py:157-184): encoder tokens propose, top-k seed
    4-d reference points, enc outputs returned for the binary aux loss."""
    model = DeformableDETR(num_classes=5, hidden_dim=32, heads=4,
                           enc_layers=1, dec_layers=2, ffn=64,
                           num_queries=6, levels=4, points=2,
                           with_box_refine=True, two_stage=True)
    feats = _feats(rng)
    params = model.init(jax.random.PRNGKey(0), feats)
    out = model.apply(params, feats)
    s = sum(f.shape[0] * f.shape[1] for f in feats)
    assert out.logits.shape == (2, 6, 5)
    assert out.boxes_cxcywh.shape == (2, 6, 4)
    assert out.enc_logits.shape == (s, 5)
    assert out.enc_boxes_cxcywh.shape == (s, 4)
    assert np.all(np.isfinite(np.asarray(out.enc_logits)))
    b = np.asarray(out.enc_boxes_cxcywh)
    assert b.min() >= 0.0 and b.max() <= 1.0
    # two_stage + refine: dec_layers + 1 head clones exist
    names = set(params["params"].keys())
    assert "cls_embed2" in names or "class_embed2" in names
    assert "pos_trans" in names and "enc_output" in names
    assert "query_embed" not in names  # queries come from encoder proposals


def test_encoder_output_proposals_geometry():
    from embodied_object_detection_tpu.models.deformable_detr import (
        encoder_output_proposals)
    unact, valid = encoder_output_proposals([(4, 4), (2, 2)])
    assert unact.shape == (20, 4)
    p = np.asarray(jax.nn.sigmoid(unact))
    v = np.asarray(valid)
    # first token of level 0: center (0.5/4, 0.5/4), wh 0.05
    np.testing.assert_allclose(p[0], [0.125, 0.125, 0.05, 0.05], atol=1e-5)
    # level 1 wh doubles
    np.testing.assert_allclose(p[16, 2:], [0.1, 0.1], atol=1e-5)
    assert v.all()  # all these centers are inside (0.01, 0.99)


@pytest.mark.slow
def test_two_stage_end_to_end_train_step(rng):
    from common import tiny_config
    from embodied_object_detection_tpu.models.deformable_detr import (
        DeformableDetrDetector, detr_train_step_host_matched)

    cfg = tiny_config()
    model = DeformableDetrDetector(cfg, num_queries=8, with_box_refine=True,
                                   two_stage=True)
    h, w = cfg.input.height, cfg.input.width
    img = jnp.asarray(rng.randn(h, w, 3).astype(np.float32) * 50 + 100)
    params = model.init(jax.random.PRNGKey(0), img)
    gt = _gt([[20, 20, 80, 90]], [2], capacity=4)
    (total, aux), grads = detr_train_step_host_matched(
        model, params, img, gt, (h, w))
    assert np.isfinite(float(total))
    assert any(k.endswith("_enc") for k in aux)
    gnorm = float(jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(jnp.abs(x)), grads, 0.0))
    assert gnorm > 0
    # encoder-stage parameters receive gradient through the enc loss
    enc_g = float(jnp.sum(jnp.abs(
        grads["params"]["detr"]["enc_output"]["kernel"])))
    assert enc_g > 0


def test_two_stage_padded_queries_suppressed(rng):
    """num_queries > encoder token count (miniature inputs): the tail
    queries are edge-padded duplicates and must be score-suppressed so
    detr_inference's plain (query, class) top-k can't return them as
    extra valid detections."""
    feats = [jnp.asarray(rng.randn(*s, 32).astype(np.float32))
             for s in [(4, 5), (2, 3), (1, 2), (1, 1)]]   # 29 tokens
    q = 32
    model = DeformableDETR(num_classes=5, hidden_dim=32, heads=4,
                           enc_layers=1, dec_layers=2, ffn=64,
                           num_queries=q, levels=4, points=2,
                           with_box_refine=True, two_stage=True)
    params = model.init(jax.random.PRNGKey(0), feats)
    out = model.apply(params, feats)
    s = sum(f.shape[0] * f.shape[1] for f in feats)
    assert s < q
    logits = np.asarray(out.logits)                        # [L, Q, C]
    # every decoder layer: the padded slots' scores are driven to ~0
    assert (logits[:, s:, :] <= -1e3).all()
    assert np.isfinite(logits[:, :s, :]).all()
    # and inference never surfaces a padded query above a real one
    det = detr_inference(out.logits[-1], out.boxes_cxcywh[-1], (64, 96),
                        topk=s)
    scores = jax.nn.sigmoid(out.logits[-1])
    assert float(np.asarray(det.scores).min()) >= \
        float(np.asarray(scores[s:]).max())
