"""Vanilla Detic demo — image / video / webcam inference with vocabulary
choice (memory-free single-frame path).

ref: Detic/demo.py:1-230 (argument surface, glob input handling, video
codec plumbing) + detic/predictor.py:46-180 (VisualizationDemo). The
reference's detectron2 DefaultPredictor becomes a jitted frame_step with
memory writes disabled; `--parallel` maps to the thread-per-device
AsyncPredictor instead of one process per GPU.

Examples:
  python -m embodied_object_detection_tpu.demo.demo \
      --input 'images/*.jpg' --output out/ --vocabulary lvis \
      --weights model.pth
  python -m embodied_object_detection_tpu.demo.demo \
      --input img.jpg --vocabulary custom \
      --custom-vocabulary headphone,webcam,cup --output out.jpg
  python -m embodied_object_detection_tpu.demo.demo \
      --video-input in.mp4 --output out.mp4
"""

from __future__ import annotations

import argparse
import dataclasses
import glob
import os
import time
from typing import List, Optional, Tuple

import numpy as np

from ..config import DetectorConfig, apply_opts
from ..structures import Detections
from .visualizer import Visualizer

# vocabulary -> CLIP class-embedding .npy (ref: predictor.py:25-44 /
# predict.py:33-38 BUILDIN_CLASSIFIER). The embedding matrices are constant
# data assets vendored under data/metadata/, so a fresh clone resolves every
# builtin vocabulary with no external mounts.
_CLASSIFIER_FILES = {
    "mp3d": "mp3d_clip.npy",
    "lvis": "lvis_v1_clip_a+cname.npy",
    "objects365": "o365_clip_a+cnamefix.npy",
    "openimages": "oid_clip_a+cname.npy",
    "coco": "coco_clip_a+cname.npy",
}
_METADATA_ROOTS = [
    os.path.join(os.path.dirname(__file__), "..", "data", "metadata"),
    "datasets/metadata",
]


def find_classifier_npy(vocabulary: str) -> Optional[str]:
    fn = _CLASSIFIER_FILES.get(vocabulary)
    if fn is None:
        return None
    for root in _METADATA_ROOTS:
        p = os.path.join(root, fn)
        if os.path.exists(p):
            return p
    return None


def resolve_vocabulary(vocabulary: str, custom_vocabulary: str = "",
                       zs_weight_path: str = "") -> Tuple[np.ndarray, List[str]]:
    """-> (zs_weight [D, C+1], class names). ref: demo.py --vocabulary /
    predict.py:66-82 (builtin metadata vs on-the-fly CLIP embeddings)."""
    from ..data.catalog import builtin_class_names
    from .predictor import build_zs_weight, get_clip_embeddings, \
        load_zs_weight_npy

    if vocabulary == "custom":
        names = [x.strip() for x in custom_vocabulary.split(",") if x.strip()]
        assert names, ("Please provide your own vocabularies when vocabulary "
                       "is set to 'custom'.")
        emb = get_clip_embeddings(names)
        return build_zs_weight(emb), names

    names = builtin_class_names(vocabulary)
    path = zs_weight_path or find_classifier_npy(vocabulary)
    if path and os.path.exists(path):
        zs = load_zs_weight_npy(path)
        assert zs.shape[1] == len(names) + 1, (zs.shape, len(names))
        return zs, names
    print(f"WARNING: no classifier .npy for '{vocabulary}'; "
          "embedding names with the CLIP text encoder")
    emb = get_clip_embeddings(names)
    return build_zs_weight(emb), names


class VisualizationDemo:
    """Single-frame detector + visualizer (ref: detic/predictor.py:46-180).

    Memory machinery is off: memory_type image_only, no writes. With
    parallel=True frames are dispatched round-robin over all local devices
    (AsyncPredictor) with in-order results.
    """

    def __init__(self, cfg: DetectorConfig, zs_weight: np.ndarray,
                 class_names: List[str], params=None, parallel: bool = False):
        cfg = cfg.replace(
            roi=dataclasses.replace(cfg.roi, num_classes=len(class_names)),
            memory=dataclasses.replace(cfg.memory, memory_type="image_only",
                                       write_memory=False))
        self.cfg = cfg
        self.class_names = class_names
        self.visualizer = Visualizer(class_names)
        self.parallel = parallel
        if parallel:
            from .predictor import AsyncPredictor
            self.predictor = AsyncPredictor(cfg, params=params,
                                            zs_weight=zs_weight)
        else:
            from .predictor import EmbodiedPredictor
            self.predictor = EmbodiedPredictor(cfg, params=params,
                                               zs_weight=zs_weight,
                                               class_names=class_names)

    def _resize(self, image_rgb: np.ndarray) -> np.ndarray:
        h, w = self.cfg.input.height, self.cfg.input.width
        if image_rgb.shape[:2] != (h, w):
            from PIL import Image
            image_rgb = np.asarray(
                Image.fromarray(image_rgb.astype(np.uint8)).resize((w, h)))
        return image_rgb.astype(np.float32)

    def _postprocess(self, image_rgb: np.ndarray, dets: Detections,
                     confidence_threshold: float
                     ) -> Tuple[Detections, np.ndarray]:
        """Rescale boxes back to the original resolution (the reference's
        _postprocess rescale, custom_rcnn.py:579) and draw."""
        h, w = self.cfg.input.height, self.cfg.input.width
        sy = image_rgb.shape[0] / h
        sx = image_rgb.shape[1] / w
        boxes = np.asarray(dets.boxes) * np.array([sx, sy, sx, sy],
                                                  np.float32)
        dets = Detections(boxes=boxes, scores=np.asarray(dets.scores),
                          classes=np.asarray(dets.classes),
                          valid=np.asarray(dets.valid))
        vis = self.visualizer.draw_detections(
            image_rgb, dets, score_thresh=confidence_threshold)
        return dets, vis

    def run_on_image(self, image_rgb: np.ndarray,
                     confidence_threshold: float = 0.5
                     ) -> Tuple[Detections, np.ndarray]:
        """-> (detections, visualized RGB image)."""
        dets = self.predictor(self._resize(image_rgb))
        return self._postprocess(image_rgb, dets, confidence_threshold)

    def run_on_video(self, video, confidence_threshold: float = 0.5):
        """Generator of visualized BGR frames from a cv2.VideoCapture-like
        object (ref: predictor.py run_on_video + AsyncPredictor
        default_buffer_size). With parallel=True frames are submitted
        buffer_size ahead of results so every device worker stays busy —
        a synchronous put-then-get per frame would serialize the pool."""
        def frames():
            while True:
                ok, frame_bgr = video.read()
                if not ok:
                    return
                yield frame_bgr[:, :, ::-1]

        def to_bgr(vis):
            return np.ascontiguousarray(vis[:, :, ::-1])

        if not self.parallel:
            for rgb in frames():
                _, vis = self.run_on_image(rgb, confidence_threshold)
                yield to_bgr(vis)
            return

        from collections import deque
        buffer_size = self.predictor.default_buffer_size
        pending: deque = deque()
        for rgb in frames():
            pending.append(rgb)
            self.predictor.put(self._resize(rgb))
            if len(pending) > buffer_size:
                _, vis = self._postprocess(pending.popleft(),
                                           self.predictor.get(),
                                           confidence_threshold)
                yield to_bgr(vis)
        while pending:
            _, vis = self._postprocess(pending.popleft(),
                                       self.predictor.get(),
                                       confidence_threshold)
            yield to_bgr(vis)


def get_parser():
    parser = argparse.ArgumentParser(description="Detic demo (TPU-native)")
    parser.add_argument("--input", nargs="+",
                        help="space-separated image paths or one glob")
    parser.add_argument("--video-input", help="path to a video file")
    parser.add_argument("--webcam", help="webcam device index")
    parser.add_argument("--output", help="output file or directory")
    parser.add_argument("--vocabulary", default="lvis",
                        choices=["lvis", "openimages", "objects365", "coco",
                                 "mp3d", "custom"])
    parser.add_argument("--custom-vocabulary", "--custom_vocabulary",
                        dest="custom_vocabulary", default="")
    parser.add_argument("--confidence-threshold", type=float, default=0.5)
    parser.add_argument("--pred-all-class", "--pred_all_class",
                        dest="pred_all_class", action="store_true")
    parser.add_argument("--parallel", action="store_true",
                        help="round-robin frames over all local devices")
    parser.add_argument("--weights", default="",
                        help=".pth (converted) or orbax checkpoint dir")
    parser.add_argument("--zs-weight", default="",
                        help="override classifier .npy path")
    parser.add_argument("--opts", nargs="*", default=[],
                        help="config overrides: section.field=value")
    return parser


def _load_params(cfg, weights):
    import jax
    from ..models.detector import build_detector
    model, params = build_detector(cfg, jax.random.PRNGKey(0))
    if weights:
        if weights.endswith((".pth", ".pkl")):
            from ..convert.torch_weights import (load_torch_checkpoint,
                                                 verify_against_model)
            converted, _ = load_torch_checkpoint(weights)
            missing, extra, mismatch = verify_against_model(converted, params)
            print(f"converted {weights}: missing={len(missing)} "
                  f"extra={len(extra)} mismatch={len(mismatch)}")
            if missing or mismatch:
                # never fall back to random weights silently — garbage
                # detections with only a console line as a clue
                raise ValueError(
                    f"checkpoint {weights} does not match the model: "
                    f"{len(missing)} missing / {len(mismatch)} mismatched "
                    f"params (first: {(list(missing) + list(mismatch))[:3]})")
            import jax.numpy as jnp
            params = jax.tree_util.tree_map(
                jnp.asarray, {"params": converted["params"]})
        else:
            from ..engine.checkpoint import restore_checkpoint
            params = restore_checkpoint(weights, params)
    return params


def main(argv=None):
    args = get_parser().parse_args(argv)
    cfg = DetectorConfig()
    # the vanilla demo serves plain Detic checkpoints (no spatial memory):
    # init the image-only model or verify_against_model would demand the
    # map_merge_projection* params vanilla .pths don't have. --opts can
    # still re-enable a memory type explicitly.
    cfg = cfg.replace(memory=dataclasses.replace(
        cfg.memory, memory_type="", write_memory=False))
    # ref: demo.py:55-57 setup_cfg — the device score threshold IS the CLI
    # value (no cap: capping would make the printed instance count disagree
    # with what the visualization draws); ONE_CLASS_PER_PROPOSAL unless
    # --pred-all-class
    cfg = cfg.replace(roi=dataclasses.replace(
        cfg.roi, score_thresh_test=args.confidence_threshold,
        one_class_per_proposal=not args.pred_all_class))
    cfg = apply_opts(cfg, args.opts)

    zs_weight, class_names = resolve_vocabulary(
        args.vocabulary, args.custom_vocabulary, args.zs_weight)
    params = _load_params(
        cfg.replace(roi=dataclasses.replace(cfg.roi,
                                            num_classes=len(class_names))),
        args.weights)
    demo = VisualizationDemo(cfg, zs_weight, class_names, params=params,
                             parallel=args.parallel)

    if args.input:
        from PIL import Image
        paths = args.input
        if len(paths) == 1:
            expanded = glob.glob(os.path.expanduser(paths[0]))
            paths = expanded or paths
        assert paths, "The input path(s) was not found"
        results = []
        for path in paths:
            img = np.asarray(Image.open(path).convert("RGB"))
            t0 = time.time()
            dets, vis = demo.run_on_image(img, args.confidence_threshold)
            n = int(np.asarray(dets.valid).sum())
            print(f"{path}: detected {n} instances in {time.time() - t0:.2f}s")
            results.append((path, dets))
            if args.output:
                if len(paths) > 1 and not os.path.isdir(args.output) \
                        and os.path.splitext(args.output)[1]:
                    # ref demo.py: multiple inputs require a directory
                    raise ValueError(
                        "--output must be a directory for multiple inputs")
                if os.path.isdir(args.output) or len(paths) > 1:
                    os.makedirs(args.output, exist_ok=True)
                    out = os.path.join(args.output, os.path.basename(path))
                else:
                    out = args.output
                Image.fromarray(vis).save(out)
        return results

    if args.video_input or args.webcam is not None:
        import cv2
        cam = (cv2.VideoCapture(args.video_input) if args.video_input
               else cv2.VideoCapture(int(args.webcam)))
        writer = None
        shown = 0
        try:
            for vis_bgr in demo.run_on_video(cam, args.confidence_threshold):
                if args.output:
                    if writer is None:
                        fps = cam.get(cv2.CAP_PROP_FPS) or 30.0
                        h, w = vis_bgr.shape[:2]
                        writer = cv2.VideoWriter(
                            args.output, cv2.VideoWriter_fourcc(*"mp4v"),
                            float(fps), (w, h), True)
                    writer.write(vis_bgr)
                else:
                    cv2.imshow("Detic", vis_bgr)
                    if cv2.waitKey(1) == 27:
                        break
                shown += 1
        finally:
            cam.release()
            if writer is not None:
                writer.release()
        print(f"processed {shown} frames")
        return shown

    get_parser().print_help()


if __name__ == "__main__":
    main()
