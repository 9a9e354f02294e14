"""NMS parity: device fixpoint NMS vs a naive greedy numpy oracle
(the exact algorithm CUDA batched_nms implements)."""

import numpy as np
import jax.numpy as jnp

from embodied_object_detection_tpu.ops.nms import nms_padded, multiclass_nms


def np_greedy_nms(boxes, scores, classes, iou_thresh):
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if suppressed[j] or j == i or scores[j] > scores[i]:
                continue
            if classes[j] != classes[i]:
                continue
            # iou
            xx1 = max(boxes[i, 0], boxes[j, 0]); yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2]); yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0, xx2 - xx1) * max(0, yy2 - yy1)
            a_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            a_j = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            iou = inter / max(a_i + a_j - inter, 1e-12)
            if iou > iou_thresh:
                suppressed[j] = True
    return keep


def random_boxes(rng, n, size=100.0):
    xy = rng.rand(n, 2) * size
    wh = rng.rand(n, 2) * size / 4 + 1.0
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_nms_matches_greedy_oracle(rng):
    n = 200
    boxes = random_boxes(rng, n)
    scores = rng.rand(n).astype(np.float32)
    valid = np.ones(n, bool)
    for thresh in (0.3, 0.5, 0.9):
        det = nms_padded(jnp.asarray(boxes), jnp.asarray(scores),
                         jnp.asarray(valid), thresh, topk=n)
        got = set(np.round(np.asarray(det.boxes)[np.asarray(det.valid)][:, 0], 3))
        want_idx = np_greedy_nms(boxes, scores, np.zeros(n, np.int32), thresh)
        want = set(np.round(boxes[want_idx, 0], 3))
        assert got == want


def test_nms_class_aware(rng):
    n = 100
    boxes = random_boxes(rng, n)
    # duplicate boxes across two classes: no cross-class suppression
    boxes = np.concatenate([boxes, boxes], axis=0)
    scores = rng.rand(2 * n).astype(np.float32)
    classes = np.concatenate([np.zeros(n, np.int32), np.ones(n, np.int32)])
    valid = np.ones(2 * n, bool)
    det = nms_padded(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
                     0.5, topk=2 * n, classes=jnp.asarray(classes))
    want_idx = np_greedy_nms(boxes, scores, classes, 0.5)
    assert int(det.num_valid()) == len(want_idx)


def test_nms_respects_padding(rng):
    n = 50
    boxes = random_boxes(rng, n)
    scores = rng.rand(n).astype(np.float32)
    valid = np.zeros(n, bool)
    valid[:10] = True
    det = nms_padded(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
                     0.5, topk=n)
    assert int(det.num_valid()) <= 10
    # padded outputs are zeroed
    out_valid = np.asarray(det.valid)
    assert np.all(np.asarray(det.scores)[~out_valid] == 0)


def test_nms_topk_truncates(rng):
    n = 60
    # non-overlapping boxes: all kept, topk limits output
    boxes = np.stack([np.arange(n) * 10.0, np.zeros(n),
                      np.arange(n) * 10.0 + 5, np.ones(n) * 5], 1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    det = nms_padded(jnp.asarray(boxes), jnp.asarray(scores),
                     jnp.ones(n, bool), 0.5, topk=16)
    assert int(det.num_valid()) == 16
    # and they are the 16 highest scores, sorted desc
    got = np.asarray(det.scores)
    np.testing.assert_allclose(got, np.sort(scores)[::-1][:16], rtol=1e-6)


def test_multiclass_nms_rows(rng):
    r, c = 30, 5
    boxes = random_boxes(rng, r)
    scores = rng.rand(r, c + 1).astype(np.float32) * 0.5
    scores[3, 2] = 0.9
    det, rows = multiclass_nms(jnp.asarray(boxes), jnp.asarray(scores),
                               jnp.ones(r, bool), score_thresh=0.05,
                               iou_threshold=0.5, topk=20)
    det_v = np.asarray(det.valid)
    rows = np.asarray(rows)
    assert rows[0] == 3                       # best-scoring row comes first
    assert int(np.asarray(det.classes)[0]) == 2
    assert np.all(rows[det_v] >= 0)
    assert np.all(rows[~det_v] == -1)
    # scores above threshold only
    assert np.all(np.asarray(det.scores)[det_v] > 0.05)


def test_decode_proposals_train_post_topk_exceeds_cap():
    """post_nms_topk_train (2000 default) > nms_candidate_cap (1024): the
    cap must expand to the requested output size instead of feeding top_k
    fewer rows than k (regression: ValueError in jax.lax.top_k)."""
    import dataclasses
    import jax.numpy as jnp
    from embodied_object_detection_tpu.config import CenterNetConfig
    from embodied_object_detection_tpu.models.centernet import (
        decode_proposals)
    cfg = CenterNetConfig(pre_nms_topk_train=2000, post_nms_topk_train=2000,
                          nms_candidate_cap=1024,
                          strides=(8, 16, 32), not_nms=True)
    rng = np.random.RandomState(0)
    shapes = [(40, 52), (20, 26), (10, 13)]
    hms = [jnp.asarray(rng.randn(h, w, 1).astype(np.float32))
           for h, w in shapes]
    regs = [jnp.asarray(np.abs(rng.randn(h, w, 4)).astype(np.float32))
            for h, w in shapes]
    out = decode_proposals(hms, regs, cfg, training=True)
    assert out.boxes.shape[0] == 2000
    assert bool(out.valid.any())


def test_nms_topk_exceeds_candidates(rng):
    """topk > N must clamp + pad with valid=False rows, never crash
    (regression: the r3 8-device dryrun died at ops/nms.py top_k with
    post_nms_topk_test=256 against 129 miniature candidates)."""
    n = 9
    boxes = random_boxes(rng, n)
    scores = rng.rand(n).astype(np.float32)
    valid = np.ones(n, bool)
    valid[-2:] = False
    det = nms_padded(jnp.asarray(boxes), jnp.asarray(scores),
                     jnp.asarray(valid), 0.99, topk=32)
    assert det.boxes.shape == (32, 4)
    assert det.scores.shape == (32,)
    assert int(det.num_valid()) == 7
    out_valid = np.asarray(det.valid)
    assert np.all(np.asarray(det.scores)[~out_valid] == 0)
    assert np.all(np.asarray(det.boxes)[~out_valid] == 0)
    # kept rows match the small-topk result
    small = nms_padded(jnp.asarray(boxes), jnp.asarray(scores),
                       jnp.asarray(valid), 0.99, topk=7)
    np.testing.assert_allclose(np.asarray(det.scores)[:7],
                               np.asarray(small.scores), rtol=1e-6)


def test_multiclass_nms_topk_exceeds_candidates(rng):
    r, c = 4, 3
    boxes = random_boxes(rng, r)
    scores = rng.rand(r, c + 1).astype(np.float32) * 0.5 + 0.25
    det, rows = multiclass_nms(jnp.asarray(boxes), jnp.asarray(scores),
                               jnp.ones(r, bool), score_thresh=0.05,
                               iou_threshold=0.99, topk=64)
    assert det.boxes.shape == (64, 4) and rows.shape == (64,)
    det_v = np.asarray(det.valid)
    assert det_v.sum() <= r * c
    assert np.all(np.asarray(rows)[~det_v] == -1)
    assert np.all(np.asarray(rows)[det_v] >= 0)


def test_decode_proposals_not_nms_topk_exceeds_locations():
    """not_nms branch with post_nms_topk > total FPN locations pads with
    valid=False instead of crashing (models/centernet.py not_nms top_k)."""
    import jax.numpy as jnp
    from embodied_object_detection_tpu.config import CenterNetConfig
    from embodied_object_detection_tpu.models.centernet import (
        decode_proposals)
    cfg = CenterNetConfig(pre_nms_topk_test=1000, post_nms_topk_test=256,
                          strides=(8, 16, 32), not_nms=True)
    rng = np.random.RandomState(0)
    shapes = [(8, 12), (4, 6), (2, 3)]  # 96+24+6 = 126 < 256
    hms = [jnp.asarray(rng.randn(h, w, 1).astype(np.float32))
           for h, w in shapes]
    regs = [jnp.asarray(np.abs(rng.randn(h, w, 4)).astype(np.float32))
            for h, w in shapes]
    out = decode_proposals(hms, regs, cfg, training=False)
    assert out.boxes.shape[0] == 256
    ov = np.asarray(out.valid)
    assert ov.sum() <= 126 and ov.sum() > 0
    assert np.all(np.asarray(out.scores)[~ov] == 0)


def test_decode_proposals_nms_topk_exceeds_locations():
    """Same miniature shape-crash scenario through the default (NMS) branch
    — the exact red-dryrun config class (post_nms_topk_test=256, 126
    candidate locations)."""
    import jax.numpy as jnp
    from embodied_object_detection_tpu.config import CenterNetConfig
    from embodied_object_detection_tpu.models.centernet import (
        decode_proposals)
    cfg = CenterNetConfig(pre_nms_topk_test=1000, post_nms_topk_test=256,
                          strides=(8, 16, 32))
    rng = np.random.RandomState(1)
    shapes = [(8, 12), (4, 6), (2, 3)]
    hms = [jnp.asarray(rng.randn(h, w, 1).astype(np.float32))
           for h, w in shapes]
    regs = [jnp.asarray(np.abs(rng.randn(h, w, 4)).astype(np.float32))
            for h, w in shapes]
    out = decode_proposals(hms, regs, cfg, training=False)
    assert out.boxes.shape[0] == 256
    assert 0 < int(np.asarray(out.valid).sum()) <= 126
