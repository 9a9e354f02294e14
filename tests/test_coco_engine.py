"""Vanilla single-frame COCO path: batches + eval smoke on tiny model."""

import dataclasses
import json

import numpy as np
import pytest

from common import tiny_config


@pytest.fixture(scope="module")
def coco_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco2")
    img_dir = root / "images"; img_dir.mkdir()
    from PIL import Image
    images, annotations = [], []
    for i in range(3):
        arr = np.random.RandomState(i).randint(0, 255, (128, 160, 3)).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"im{i}.jpg")
        images.append({"id": i, "file_name": f"im{i}.jpg",
                       "height": 128, "width": 160})
        annotations.append({"id": i, "image_id": i, "category_id": 1,
                            "bbox": [20, 20, 60, 50], "iscrowd": 0, "area": 3000})
    coco = {"images": images, "annotations": annotations,
            "categories": [{"id": 1, "name": "thing"}]}
    (root / "ann.json").write_text(json.dumps(coco))
    return str(root / "ann.json"), str(img_dir)


def test_items_to_train_batch(coco_fixture):
    from embodied_object_detection_tpu.data.catalog import (
        CocoDetectionDataset, DatasetEntry)
    from embodied_object_detection_tpu.engine.coco import items_to_train_batch
    cfg = tiny_config()
    jf, img_dir = coco_fixture
    ds = CocoDetectionDataset(DatasetEntry(jf, img_dir), height=128,
                              width=160, max_gt=8)
    batch = items_to_train_batch([ds[0], ds[1]], cfg)
    assert batch.image.shape == (2, 128, 160, 3)
    assert batch.gt_boxes.shape == (2, 8, 4)
    assert batch.gt_valid[:, 0].all()


@pytest.mark.slow
def test_evaluate_coco_smoke(coco_fixture):
    import jax
    from embodied_object_detection_tpu.data.catalog import (
        CocoDetectionDataset, DatasetEntry)
    from embodied_object_detection_tpu.engine.coco import evaluate_coco
    from embodied_object_detection_tpu.models.detector import build_detector

    cfg = tiny_config()
    cfg = cfg.replace(memory=dataclasses.replace(cfg.memory,
                                                 memory_type="",
                                                 write_memory=False))
    model, params = build_detector(cfg, jax.random.PRNGKey(0))
    jf, img_dir = coco_fixture
    ds = CocoDetectionDataset(DatasetEntry(jf, img_dir), height=128,
                              width=160, max_gt=8)
    zs = np.random.RandomState(0).randn(512, cfg.roi.num_classes + 1).astype(np.float32)
    res = evaluate_coco(model, params, cfg, ds, zs, batch=2, verbose=False)
    assert "AP" in res


@pytest.mark.slow
def test_evaluate_coco_res5_variant(coco_fixture):
    """The Res5 head variant runs the single-frame COCO path end-to-end
    through the same build_detector + evaluate_coco surfaces."""
    import jax
    from embodied_object_detection_tpu.data.catalog import (
        CocoDetectionDataset, DatasetEntry)
    from embodied_object_detection_tpu.engine.coco import evaluate_coco
    from embodied_object_detection_tpu.models.detector import build_detector
    from embodied_object_detection_tpu.models.res5_detector import (
        Res5Detector)

    cfg = tiny_config()
    cfg = cfg.replace(roi=dataclasses.replace(cfg.roi, head_type="res5"))
    model, params = build_detector(cfg, jax.random.PRNGKey(0))
    assert isinstance(model, Res5Detector)
    jf, img_dir = coco_fixture
    ds = CocoDetectionDataset(DatasetEntry(jf, img_dir), height=128,
                              width=160, max_gt=8)
    zs = np.random.RandomState(0).randn(
        512, cfg.roi.num_classes + 1).astype(np.float32)
    res = evaluate_coco(model, params, cfg, ds, zs, batch=2, verbose=False)
    assert "AP" in res
