"""embodied_object_detection_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
embodied object detection with spatial feature memory.

Re-designed from scratch with the capabilities of nhcha6/embodied-object-detection
(Detic = CenterNet2 proposals + cascade R-CNN heads + CLIP zero-shot classifier, run
recurrently over embodied video episodes with an allocentric spatial feature memory).

Layer map (mirrors reference SURVEY.md §1, re-architected TPU-first):
  geometry/   pinhole projection, pose transforms          (ref: Detic/SMNet/projector/)
  ops/        device-side NMS / ROIAlign / mask paste /
              memory read-write kernels                    (ref: detectron2 CUDA ops)
  models/     ResNet50 + FPN + CenterNet + cascade heads   (ref: Detic/detic/modeling/)
  data/       episode dataset, synthetic fixtures          (ref: Detic/SMNet/loader.py)
  evaluation/ native COCO mAP + mp3d episode protocol      (ref: Detic/train_mp3d.py)
  engine/     train / eval loops, checkpointing            (ref: Detic/train_mp3d.py)
  parallel/   mesh + sharded train/eval steps              (ref: DDP/NCCL launch code)
  convert/    PyTorch .pth -> JAX params converters
  demo/       streaming RGB-D+pose predictor               (ref: Detic/robot_demo.py)
"""

__version__ = "0.1.0"
