"""OID evaluator tests: federated filtering, group-of handling, hierarchy."""

import numpy as np
import pytest

from embodied_object_detection_tpu.evaluation.oid_eval import (
    OIDEvaluator, hierarchy_parent_map, voc_average_precision)


def _box(x, y, w, h):
    return [x, y, x + w, y + h]


def test_voc_ap_perfect():
    p = np.array([1.0, 1.0])
    r = np.array([0.5, 1.0])
    assert abs(voc_average_precision(p, r) - 1.0) < 1e-9


def test_perfect_detection():
    ev = OIDEvaluator([0, 1])
    ev.add_image(0, pos_category_ids=[0])
    ev.add_ground_truth(0, np.array([_box(0, 0, 10, 10)]), np.array([0]))
    ev.add_detections(0, np.array([_box(0, 0, 10, 10)]), np.array([0.9]),
                      np.array([0]))
    res = ev.evaluate()
    assert abs(res["AP50"] - 100.0) < 1e-6


def test_federated_filtering_ignores_unverified():
    ev = OIDEvaluator([0, 1])
    ev.add_image(0, pos_category_ids=[0], neg_category_ids=[])
    ev.add_ground_truth(0, np.array([_box(0, 0, 10, 10)]), np.array([0]))
    # a wrong-class detection for an UNVERIFIED class (1): must be dropped,
    # not counted as FP
    ev.add_detections(0, np.array([_box(0, 0, 10, 10), _box(50, 50, 10, 10)]),
                      np.array([0.9, 0.95]), np.array([0, 1]))
    res = ev.evaluate()
    assert abs(res["AP50"] - 100.0) < 1e-6


def test_negative_labels_penalize():
    ev = OIDEvaluator([0, 1])
    ev.add_image(0, pos_category_ids=[0], neg_category_ids=[1])
    ev.add_ground_truth(0, np.array([_box(0, 0, 10, 10)]), np.array([0]))
    ev.add_image(1, pos_category_ids=[1])
    ev.add_ground_truth(1, np.array([_box(0, 0, 10, 10)]), np.array([1]))
    # detection of verified-absent class 1 on image 0 -> FP for class 1
    ev.add_detections(0, np.array([_box(0, 0, 10, 10), _box(5, 5, 10, 10)]),
                      np.array([0.9, 0.95]), np.array([0, 1]))
    ev.add_detections(1, np.array([_box(0, 0, 10, 10)]), np.array([0.5]),
                      np.array([1]))
    res = ev.evaluate()
    assert res["AP50-1"] < 100.0            # FP hurt class 1
    assert abs(res["AP50-0"] - 100.0) < 1e-6


def test_group_of_collapses_to_one_tp():
    ev = OIDEvaluator([0])
    ev.add_image(0, pos_category_ids=[0])
    # one group-of box covering two detections
    ev.add_ground_truth(0, np.array([_box(0, 0, 100, 100)]), np.array([0]),
                        group_of=np.array([True]))
    # both dets inside the group (IoA 1.0) -> one pseudo-TP, no FPs
    ev.add_detections(0, np.array([_box(10, 10, 20, 20), _box(50, 50, 20, 20)]),
                      np.array([0.8, 0.7]), np.array([0]))
    res = ev.evaluate()
    # 1 TP / 1 GT, no FP -> AP 100
    assert abs(res["AP50"] - 100.0) < 1e-6


def test_hierarchy_parent_map_and_expansion():
    hierarchy = {"LabelName": "root", "Subcategory": [
        {"LabelName": "/m/animal", "Subcategory": [
            {"LabelName": "/m/dog"}]}]}
    f2i = {"/m/animal": 1, "/m/dog": 2, "root": 0}
    parents = hierarchy_parent_map(hierarchy, f2i)
    assert parents[2] == {1}

    ev = OIDEvaluator([1, 2], hierarchy_parents=parents,
                      expand_pred_label=True)
    ev.add_image(0, pos_category_ids=[1, 2])
    ev.add_ground_truth(0, np.array([_box(0, 0, 10, 10), _box(0, 0, 10, 10)]),
                        np.array([1, 2]))
    # a single 'dog' detection expands to 'animal' too -> both classes AP 100
    ev.add_detections(0, np.array([_box(0, 0, 10, 10)]), np.array([0.9]),
                      np.array([2]))
    res = ev.evaluate()
    assert abs(res["AP50"] - 100.0) < 1e-6


def test_oid_filtering_is_order_independent():
    """Detections streamed before add_image must survive once the label
    sets are complete (filtering at evaluate time, like COCOEvaluator)."""
    def run(dets_first):
        ev = OIDEvaluator([0])
        box = np.array([_box(10, 10, 40, 40)])
        if dets_first:
            ev.add_detections(0, box, np.array([0.9]), np.array([0]))
            ev.add_image(0, pos_category_ids=[0])
        else:
            ev.add_image(0, pos_category_ids=[0])
            ev.add_detections(0, box, np.array([0.9]), np.array([0]))
        ev.add_ground_truth(0, box, np.array([0]))
        return ev.evaluate()["AP50"]

    assert run(True) == run(False) == pytest.approx(100.0)


def test_oid_add_image_unions_labels():
    ev = OIDEvaluator([0, 1])
    ev.add_image(0, pos_category_ids=[0])
    ev.add_image(0, pos_category_ids=[1], neg_category_ids=[])
    assert ev._pos[0] == {0, 1}
    box = np.array([_box(10, 10, 40, 40)])
    ev.add_ground_truth(0, box, np.array([0]))
    ev.add_detections(0, box, np.array([0.9]), np.array([0]))
    assert ev.evaluate()["AP50"] == pytest.approx(100.0)
