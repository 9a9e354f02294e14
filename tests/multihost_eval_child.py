"""Child process for the 2-process multi-host SHARDED-EVAL test (launched
by test_multihost.py). Runs evaluate_dataset_sharded over a global
4-device mesh (2 virtual CPU devices per process) on a shared synthetic
dataset and compares against the in-process serial protocol — the
cross-process analog of the reference's AsyncPredictor result-queue drain
(Detic/detic/predictor.py:441-529; launch stack train_mp3d.py:747-857)."""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=2")

import jax

jax.config.update("jax_platforms", "cpu")


def main(process_id: int, port: str, data_root: str):
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=process_id)
    import numpy as np
    from jax.sharding import Mesh
    from embodied_object_detection_tpu.config import DetectorConfig
    from embodied_object_detection_tpu.data.episode_dataset import (
        EpisodeDataset)
    from embodied_object_detection_tpu.engine.eval import (
        evaluate_dataset, evaluate_dataset_sharded)
    from embodied_object_detection_tpu.models.detector import build_detector

    devices = jax.devices()
    assert len(devices) == 4, devices          # 2 local per process
    mesh = Mesh(np.asarray(devices).reshape(4, 1), ("data", "model"))

    cfg = DetectorConfig()
    cfg = cfg.replace(
        compute_dtype="float32",
        backbone=dataclasses.replace(cfg.backbone, depths=(1, 1, 1, 1)),
        input=dataclasses.replace(cfg.input, height=64, width=96,
                                  max_sequence_length=4, score_every=2,
                                  max_gt_boxes=8),
        centernet=dataclasses.replace(cfg.centernet, pre_nms_topk_test=32,
                                      post_nms_topk_test=8),
        roi=dataclasses.replace(cfg.roi, detections_per_image=8,
                                num_classes=5),
        memory=dataclasses.replace(cfg.memory, max_cells=64, write_topk=4,
                                   cls_score_thresh=0.05, mask_thresh=0.3),
    )
    model, params = build_detector(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    zs = rng.randn(cfg.roi.zs_weight_dim,
                   cfg.roi.num_classes + 1).astype(np.float32)
    ds = EpisodeDataset(data_root, max_sequence_length=4, max_gt=8)

    # serial reference protocol, computed locally by each process
    serial = evaluate_dataset(model, params, cfg, ds, zs, verbose=False,
                              num_workers=0)
    # sharded across the 2-process global mesh (4 streams)
    sharded = evaluate_dataset_sharded(model, params, cfg, ds, zs,
                                       mesh=mesh, streams=4, verbose=False,
                                       num_workers=0)
    assert sharded.num_images == serial.num_images > 0, \
        (sharded.num_images, serial.num_images)
    for k, v in serial.overall.items():
        assert abs(sharded.overall[k] - v) < 1e-6, \
            (k, sharded.overall[k], v)
    print(f"MULTIHOST_EVAL_OK process={process_id} "
          f"AP={sharded.overall['AP']:.6f} images={sharded.num_images}")


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2], sys.argv[3])
