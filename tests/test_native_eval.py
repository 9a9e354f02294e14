"""Native C++ eval core == pure-Python evaluator paths, bit-for-bit."""

import numpy as np
import pytest

from embodied_object_detection_tpu import native
from embodied_object_detection_tpu.evaluation import coco_eval


pytestmark = pytest.mark.skipif(native.eval_core is None,
                                reason="native eval core unavailable")


def _random_eval_inputs(rng, n_imgs=6, n_cats=3):
    gt, dt = {}, {}
    for img in range(n_imgs):
        ng = rng.randint(0, 6)
        nd = rng.randint(0, 12)
        gt[img] = (rng.uniform(0, 400, (ng, 2)), rng.uniform(10, 120, (ng, 2)),
                   rng.randint(0, n_cats, ng))
        dt[img] = (rng.uniform(0, 400, (nd, 2)), rng.uniform(10, 120, (nd, 2)),
                   rng.randint(0, n_cats, nd), rng.rand(nd))
    return gt, dt


def _fill(ev, gt, dt):
    for img, (xy, wh, cls) in gt.items():
        ev.add_image(img)
        boxes = np.concatenate([xy, xy + wh], axis=1)
        ev.add_ground_truth(img, boxes, cls)
    for img, (xy, wh, cls, sc) in dt.items():
        boxes = np.concatenate([xy, xy + wh], axis=1)
        ev.add_detections(img, boxes, sc, cls)


def test_native_iou_matches_numpy(rng):
    dets = rng.uniform(0, 100, (17, 4))
    gts = rng.uniform(0, 100, (9, 4))
    dets[:, 2:] = np.abs(dets[:, 2:])
    gts[:, 2:] = np.abs(gts[:, 2:])
    native_iou = native.eval_core.iou_xywh(dets, gts)

    core = coco_eval._native_core
    try:
        coco_eval._native_core = lambda: None
        py_iou = coco_eval._iou_xywh(dets, gts)
    finally:
        coco_eval._native_core = core
    np.testing.assert_allclose(native_iou, py_iou, rtol=0, atol=1e-12)


def test_native_greedy_match_matches_python(rng):
    nd, ng = 15, 7
    ious = rng.rand(nd, ng)
    g_ignore = rng.rand(ng) > 0.6
    order = np.argsort(g_ignore, kind="stable")  # non-ignored first
    g_ignore = g_ignore[order]
    thrs = np.asarray(coco_eval.IOU_THRS)

    dt_m, gt_m, dt_ig = native.eval_core.greedy_match(ious, g_ignore, thrs)

    # reference loop (COCOeval.evaluateImg)
    nt = len(thrs)
    dt_m2 = np.zeros((nt, nd), np.int64)
    gt_m2 = np.zeros((nt, ng), np.int64)
    dt_ig2 = np.zeros((nt, nd), bool)
    for t, thr in enumerate(thrs):
        for d in range(nd):
            best_iou = min(thr, 1 - 1e-10)
            best_g = -1
            for g in range(ng):
                if gt_m2[t, g] > 0:
                    continue
                if best_g > -1 and not g_ignore[best_g] and g_ignore[g]:
                    break
                if ious[d, g] < best_iou:
                    continue
                best_iou = ious[d, g]
                best_g = g
            if best_g == -1:
                continue
            dt_ig2[t, d] = g_ignore[best_g]
            dt_m2[t, d] = best_g + 1
            gt_m2[t, best_g] = d + 1
    np.testing.assert_array_equal(dt_m, dt_m2)
    np.testing.assert_array_equal(gt_m, gt_m2)
    np.testing.assert_array_equal(dt_ig, dt_ig2)


def test_full_evaluator_native_equals_python(rng):
    gt, dt = _random_eval_inputs(rng)
    ev_native = coco_eval.COCOEvaluator([0, 1, 2], ["a", "b", "c"])
    _fill(ev_native, gt, dt)
    res_native = ev_native.evaluate()

    core = coco_eval._native_core
    try:
        coco_eval._native_core = lambda: None
        ev_py = coco_eval.COCOEvaluator([0, 1, 2], ["a", "b", "c"])
        _fill(ev_py, gt, dt)
        res_py = ev_py.evaluate()
    finally:
        coco_eval._native_core = core

    assert set(res_native) == set(res_py)
    for k in res_native:
        a, b = res_native[k], res_py[k]
        if np.isnan(a) and np.isnan(b):
            continue
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-9, err_msg=k)


def test_precision_at_recall_edge_cases():
    core = native.eval_core
    rec = np.asarray(coco_eval.REC_THRS)
    # no detections
    q = core.precision_at_recall(np.zeros(0), np.zeros(0), 3, rec)
    assert np.all(q == 0)
    # perfect detector: precision 1 at every achieved recall
    tp = np.arange(1.0, 4.0)
    fp = np.zeros(3)
    q = core.precision_at_recall(tp, fp, 3, rec)
    assert q[0] == 1.0 and q[-1] == 1.0
