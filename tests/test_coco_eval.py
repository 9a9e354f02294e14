"""COCO evaluator sanity tests against analytically known cases."""

import numpy as np
import pytest

from embodied_object_detection_tpu.evaluation import COCOEvaluator


def _box(x, y, w, h):
    return [x, y, x + w, y + h]


def test_perfect_detections_ap_100():
    ev = COCOEvaluator([0, 1])
    for img in range(3):
        gt = np.array([_box(10, 10, 50, 50), _box(100, 100, 30, 40)], float)
        cls = np.array([0, 1])
        ev.add_image(img)
        ev.add_ground_truth(img, gt, cls)
        ev.add_detections(img, gt, np.array([0.9, 0.8]), cls)
    res = ev.evaluate()
    assert abs(res["AP"] - 100.0) < 1e-6
    assert abs(res["AP50"] - 100.0) < 1e-6


def test_no_detections_ap_0():
    ev = COCOEvaluator([0])
    ev.add_image(0)
    ev.add_ground_truth(0, np.array([_box(0, 0, 10, 10)], float), np.array([0]))
    ev.add_detections(0, np.zeros((0, 4)), np.zeros(0), np.zeros(0))
    res = ev.evaluate()
    assert res["AP"] == 0.0


def test_half_recall():
    # 2 GTs, only one detected perfectly, no false positives:
    # precision = 1 up to recall 0.5 -> AP50 ~ 50.49 (51 of 101 recall points)
    ev = COCOEvaluator([0])
    ev.add_image(0)
    ev.add_ground_truth(0, np.array([_box(0, 0, 10, 10), _box(50, 50, 10, 10)],
                                    float), np.array([0, 0]))
    ev.add_detections(0, np.array([_box(0, 0, 10, 10)], float),
                      np.array([0.9]), np.array([0]))
    res = ev.evaluate()
    assert abs(res["AP50"] - 100 * 51 / 101) < 1e-6


def test_localization_quality_affects_high_ious():
    # det with IoU ~0.6 counts at thresholds 0.5, 0.55, 0.6 but not above
    ev = COCOEvaluator([0])
    ev.add_image(0)
    ev.add_ground_truth(0, np.array([_box(0, 0, 100, 100)], float),
                        np.array([0]))
    # shifted box with IoU = (100-20)*100 / (100*100*2 - 80*100) = 8000/12000 = 0.667
    ev.add_detections(0, np.array([_box(20, 0, 100, 100)], float),
                      np.array([0.9]), np.array([0]))
    res = ev.evaluate()
    assert abs(res["AP50"] - 100.0) < 1e-6
    assert res["AP75"] == 0.0
    # AP = mean over 10 thresholds: passes at 0.5,0.55,0.6,0.65 -> 4/10
    assert abs(res["AP"] - 40.0) < 1e-6


def test_false_positive_lowers_precision():
    ev = COCOEvaluator([0])
    ev.add_image(0)
    ev.add_ground_truth(0, np.array([_box(0, 0, 10, 10)], float), np.array([0]))
    # high-scoring FP before the TP
    ev.add_detections(0, np.array([_box(200, 200, 10, 10), _box(0, 0, 10, 10)],
                                  float),
                      np.array([0.95, 0.9]), np.array([0, 0]))
    res = ev.evaluate()
    # precision at full recall = 1/2 -> all recall points get 0.5
    assert abs(res["AP50"] - 50.0) < 1e-6


def test_subset_evaluation():
    ev = COCOEvaluator([0])
    for img in range(2):
        ev.add_image(img)
        ev.add_ground_truth(img, np.array([_box(0, 0, 10, 10)], float),
                            np.array([0]))
    # perfect on img 0, nothing on img 1
    ev.add_detections(0, np.array([_box(0, 0, 10, 10)], float),
                      np.array([0.9]), np.array([0]))
    res_all = ev.evaluate()
    res_0 = ev.evaluate(img_ids=[0])
    res_1 = ev.evaluate(img_ids=[1])
    assert abs(res_0["AP"] - 100.0) < 1e-6
    assert res_1["AP"] == 0.0
    assert res_1["AP"] < res_all["AP"] < res_0["AP"]


def test_area_zero_annotations_fall_in_all_range():
    # the reference writes area=0 for every GT (train_mp3d.py:237): the 'all'
    # range must still count them
    ev = COCOEvaluator([0])
    ev.add_image(0)
    ev.add_ground_truth(0, np.array([_box(0, 0, 50, 50)], float),
                        np.array([0]), areas=np.array([0.0]))
    ev.add_detections(0, np.array([_box(0, 0, 50, 50)], float),
                      np.array([0.9]), np.array([0]))
    res = ev.evaluate()
    assert abs(res["AP"] - 100.0) < 1e-6


def test_seen_unseen_split():
    from embodied_object_detection_tpu.evaluation import COCOEvaluator
    ev = COCOEvaluator([0, 1])
    ev.add_image(0)
    ev.add_ground_truth(0, np.array([_box(0, 0, 10, 10),
                                     _box(50, 50, 10, 10)], float),
                        np.array([0, 1]))
    # perfect on class 0, nothing on class 1
    ev.add_detections(0, np.array([_box(0, 0, 10, 10)], float),
                      np.array([0.9]), np.array([0]))
    res = ev.evaluate_split(seen_ids=[0])
    assert abs(res["AP-seen"] - 100.0) < 1e-6
    assert res["AP-unseen"] == 0.0
    assert abs(res["AP"] - 50.0) < 1e-6


def test_federated_lvis_mode():
    """LVIS-style federated filtering: unverified-class detections dropped."""
    from embodied_object_detection_tpu.evaluation import COCOEvaluator
    ev = COCOEvaluator([0, 1], max_dets=300, federated=True)
    ev.add_image(0, neg_category_ids=[])
    ev.add_ground_truth(0, np.array([_box(0, 0, 10, 10)], float), np.array([0]))
    # class-1 detection on an image with no class-1 annotation/negative: dropped
    ev.add_detections(0, np.array([_box(0, 0, 10, 10), _box(40, 40, 10, 10)],
                                  float),
                      np.array([0.9, 0.99]), np.array([0, 1]))
    res = ev.evaluate()
    assert abs(res["AP"] - 100.0) < 1e-6

    # with class 1 in the negative list, the detection counts as FP
    ev2 = COCOEvaluator([0, 1], max_dets=300, federated=True)
    ev2.add_image(0, neg_category_ids=[1])
    ev2.add_ground_truth(0, np.array([_box(0, 0, 10, 10)], float), np.array([0]))
    ev2.add_image(1)
    ev2.add_ground_truth(1, np.array([_box(0, 0, 10, 10)], float), np.array([1]))
    ev2.add_detections(0, np.array([_box(40, 40, 10, 10)], float),
                       np.array([0.99]), np.array([1]))
    ev2.add_detections(1, np.array([_box(0, 0, 10, 10)], float),
                       np.array([0.5]), np.array([1]))
    res2 = ev2.evaluate()
    assert res2["AP-1"] < 100.0


def test_federated_filter_is_order_independent(rng):
    """Detections added BEFORE their image's GT must still count once the
    positive set is complete (filtering happens at evaluate time)."""
    from embodied_object_detection_tpu.evaluation.coco_eval import (
        COCOEvaluator)

    def run(dets_first):
        ev = COCOEvaluator([0, 1], federated=True)
        ev.add_image(1, neg_category_ids=[])
        box = np.array([[10, 10, 50, 50]])
        if dets_first:
            ev.add_detections(1, box, np.array([0.9]), np.array([0]))
            ev.add_ground_truth(1, box, np.array([0]))
        else:
            ev.add_ground_truth(1, box, np.array([0]))
            ev.add_detections(1, box, np.array([0.9]), np.array([0]))
        return ev.evaluate()["AP"]

    assert run(True) == run(False) == pytest.approx(100.0)


def test_federated_reset_clears_label_sets():
    from embodied_object_detection_tpu.evaluation.coco_eval import (
        COCOEvaluator)
    ev = COCOEvaluator([0], federated=True)
    ev.add_image(5)
    ev.add_ground_truth(5, np.array([[0, 0, 10, 10]]), np.array([0]))
    ev.reset()
    assert ev._pos == {} and ev._neg == {}
    # duplicate registration counts the image once
    ev.add_image(5)
    ev.add_image(5)
    assert ev._seen_ids == {5}


def test_coco_ap_counts_fp_only_images():
    """False positives on an image with no GT must still enter the sweep
    (coco_ap registers det-only images; COCOeval would see them via the
    detections' image_id)."""
    from embodied_object_detection_tpu.evaluation.coco_eval import coco_ap
    box = np.array([[10, 10, 50, 50]], float)
    gt = {1: (box, np.array([0]))}
    fp_boxes = np.tile(box, (50, 1)) + np.arange(50)[:, None]
    clean = coco_ap(gt, {1: (box, np.array([0.9]), np.array([0]))}, [0])
    noisy = coco_ap(gt, {1: (box, np.array([0.9]), np.array([0])),
                         2: (fp_boxes, np.full(50, 0.99),
                             np.zeros(50, int))}, [0])
    assert clean["AP"] == pytest.approx(100.0)
    assert noisy["AP"] < 50.0


def test_evaluate_dedups_img_ids():
    from embodied_object_detection_tpu.evaluation.coco_eval import (
        COCOEvaluator)
    ev = COCOEvaluator([0])
    box = np.array([[10, 10, 50, 50]], float)
    ev.add_image(1)
    ev.add_ground_truth(1, box, np.array([0]))
    ev.add_detections(1, box, np.array([0.9]), np.array([0]))
    assert ev.evaluate(img_ids=[1, 1])["AP"] == \
        ev.evaluate(img_ids=[1])["AP"] == pytest.approx(100.0)


def test_evaluate_does_not_mutate_state_on_reads():
    """Evaluating ids with no stored entries must not grow the internal
    defaultdicts (read path stays a read)."""
    from embodied_object_detection_tpu.evaluation.coco_eval import (
        COCOEvaluator)
    ev = COCOEvaluator([0])
    ev.add_image(1)
    ev.add_ground_truth(1, np.array([[0, 0, 10, 10]], float), np.array([0]))
    ev.evaluate(img_ids=[1, 7, 8, 9])
    assert set(ev._gt) == {1} and set(ev._dt) == set()


def test_first_ann_id_zero_reproduces_pycocotools_quirk():
    """pycocotools stores gt['id'] in dtm where 0 doubles as 'unmatched':
    with annotation ids from 0 (the mp3d protocol, train_mp3d.py:149) the
    det matched to annotation 0 counts as a false positive. The default
    (1-based, standard COCO) has no quirk."""
    gt = np.array([_box(10, 10, 50, 50)], float)
    cls = np.array([0])

    def run(first_ann_id):
        ev = COCOEvaluator([0], first_ann_id=first_ann_id)
        ev.add_image(0)
        ev.add_ground_truth(0, gt, cls)
        ev.add_detections(0, gt, np.array([0.9]), cls)
        return ev.evaluate()["AP"]

    assert abs(run(1) - 100.0) < 1e-6      # standard COCO: perfect TP
    assert run(0) == 0.0                   # quirk: the only det reads FP
