"""Shared test helpers: a tiny config so model tests run quickly on CPU."""

import dataclasses

from embodied_object_detection_tpu.config import DetectorConfig


def tiny_config() -> DetectorConfig:
    cfg = DetectorConfig()
    cfg = cfg.replace(
        compute_dtype="float32",
        input=dataclasses.replace(cfg.input, height=128, width=160,
                                  max_gt_boxes=8),
        centernet=dataclasses.replace(cfg.centernet, pre_nms_topk_test=128,
                                      post_nms_topk_test=32,
                                      pre_nms_topk_train=128,
                                      post_nms_topk_train=64),
        roi=dataclasses.replace(cfg.roi, detections_per_image=16,
                                num_classes=5),
        memory=dataclasses.replace(cfg.memory, max_cells=64, write_topk=8),
    )
    return cfg
