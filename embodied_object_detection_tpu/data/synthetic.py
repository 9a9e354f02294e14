"""Synthetic embodied-episode fixture generator.

Stand-in for the habitat-sim data-generation pipeline (ref:
Detic/SMNet/build_data.py + build_memory_data.py + create_coco_mp3d.py),
which needs the external C++ renderer and Matterport3D assets. Generates
random "scenes" of colored rectangles observed by a panning camera, and
writes them in the *reference on-disk format* so EpisodeDataset and the whole
eval pipeline run unmodified:

  memory_data/<scene>_<k>.h5 : memory_features (zeros, ref:
      build_memory_data.py:147), proj_indices [T, H, W, 1], semmap_gt
  sensor_data/<scene>_<k>.h5 : rgb [T, H, W, 3], detection_data (stringified
      dicts with xywh gt_boxes, ref: build_data.py:275-286), segmentation_data
  JPEGImages/*.jpg           : per-frame JPEGs
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None


def _render_frame(rng: np.random.RandomState, h: int, w: int,
                  objects: List[dict], pan: float) -> Tuple[np.ndarray, list, list]:
    """Draw each scene object as a colored rectangle shifted by the camera pan."""
    img = np.full((h, w, 3), 60, np.uint8)
    img += (rng.rand(h, w, 3) * 20).astype(np.uint8)
    boxes, classes = [], []
    for obj in objects:
        x = int(obj["x"] - pan)
        y = int(obj["y"])
        bw, bh = obj["w"], obj["h"]
        x1, y1 = max(0, x), max(0, y)
        x2, y2 = min(w, x + bw), min(h, y + bh)
        if x2 - x1 < 8 or y2 - y1 < 8:
            continue
        img[y1:y2, x1:x2] = obj["color"]
        boxes.append([float(x1), float(y1), float(x2 - x1), float(y2 - y1)])  # xywh
        classes.append(int(obj["cls"]))
    return img, boxes, classes


class SyntheticRenderer:
    """Renderer-protocol backend for data/build_data.py: a panoramic wall of
    colored rectangles at fixed depth, panned by the agent heading — the
    habitat-free stand-in for HabitatUtils (habitat_utils.py:14-284)."""

    def __init__(self, height: int = 480, width: int = 640, seed: int = 0,
                 num_objects: int = 6, wall_depth: float = 3.0,
                 class_ids: Optional[List[int]] = None):
        self.h, self.w = height, width
        self.wall_depth = wall_depth
        self.rng = np.random.RandomState(seed)
        class_ids = class_ids or [0, 2, 3, 4, 5]
        self.objects = []
        for _ in range(num_objects):
            self.objects.append(dict(
                x=int(self.rng.rand() * width * 2),
                y=int(self.rng.rand() * (height - 120)),
                w=int(40 + self.rng.rand() * 120),
                h=int(40 + self.rng.rand() * 120),
                color=self.rng.randint(90, 255, 3,
                                       dtype=np.int64).astype(np.uint8),
                cls=int(class_ids[self.rng.randint(len(class_ids))])))
        self._pan = 0.0

    def set_agent_state(self, position, rotation_euler):
        # heading (rotation_euler[1], radians) pans the panorama
        self._pan = float(rotation_euler[1]) * self.w / 1.5 + \
            float(position[0]) * 40.0
        self._cached = None

    def _frame(self):
        # render once per pose: rgb/semantic/boxes must agree regardless
        # of render_* call order, and the rng must advance once per frame
        if getattr(self, "_cached", None) is None:
            self._cached = _render_frame(self.rng, self.h, self.w,
                                         self.objects, self._pan)
        return self._cached

    def render_rgb(self) -> np.ndarray:
        img, _, _ = self._frame()
        return img

    def render_depth(self) -> np.ndarray:
        return np.full((self.h, self.w), self.wall_depth, np.float32)

    def render_semantic(self) -> np.ndarray:
        img, boxes, classes = self._frame()
        seg = np.zeros((self.h, self.w), np.int32)
        for b, c in zip(boxes, classes):
            x, y, bw, bh = (int(v) for v in b)
            seg[y: y + bh, x: x + bw] = c + 1
        return seg

    def render_boxes(self) -> List[dict]:
        _, boxes, classes = self._frame()
        return [dict(box=[b[0], b[1], b[0] + b[2], b[1] + b[3]], id=c)
                for b, c in zip(boxes, classes)]


def generate_synthetic_dataset(root: str, num_scenes: int = 1,
                               chunks_per_scene: int = 2, frames: int = 20,
                               height: int = 480, width: int = 640,
                               map_h: int = 40, map_w: int = 40,
                               seed: int = 0,
                               class_ids: Optional[List[int]] = None) -> None:
    if h5py is None:
        raise RuntimeError("h5py required")
    rng = np.random.RandomState(seed)
    class_ids = class_ids or [0, 2, 3, 4, 5]
    os.makedirs(os.path.join(root, "memory_data"), exist_ok=True)
    os.makedirs(os.path.join(root, "sensor_data"), exist_ok=True)
    os.makedirs(os.path.join(root, "JPEGImages"), exist_ok=True)

    from PIL import Image

    num_cells = map_h * map_w
    for s in range(num_scenes):
        scene = f"scene{s:04d}_lvl0"
        # static scene objects in an extended panorama
        objects = []
        for _ in range(6):
            objects.append(dict(
                x=int(rng.rand() * width * 2), y=int(rng.rand() * (height - 120)),
                w=int(40 + rng.rand() * 120), h=int(40 + rng.rand() * 120),
                color=rng.randint(90, 255, 3, dtype=np.int64).astype(np.uint8),
                cls=int(class_ids[rng.randint(len(class_ids))])))

        for k in range(chunks_per_scene):
            seq = f"{scene}_{k}.h5"
            rgbs = np.zeros((frames, height, width, 3), np.uint8)
            det_strs = []
            proj = np.zeros((frames, height, width, 1), np.int64)
            for i in range(frames):
                pan = (k * frames + i) * 8.0
                img, boxes, classes = _render_frame(rng, height, width,
                                                    objects, pan)
                rgbs[i] = img
                fname = f"{scene}_{k}_{i}.jpg"
                Image.fromarray(img).save(
                    os.path.join(root, "JPEGImages", fname), quality=90)
                # the reference's stringified-dict format
                # (build_data.py:275-286 writes str(dict))
                rec = str({"file_name": fname, "image": 0,
                           "gt_boxes": boxes, "gt_classes": classes})
                det_strs.append(rec)
                # plausible smooth projection: pixel -> map cell following the pan
                ys, xs = np.meshgrid(np.arange(height), np.arange(width),
                                     indexing="ij")
                mx = ((xs + pan) / (width * 2) * (map_w - 1)).astype(np.int64)
                my = (ys / height * (map_h - 1)).astype(np.int64)
                proj[i, ..., 0] = np.clip(my, 0, map_h - 1) * map_w + \
                    np.clip(mx, 0, map_w - 1)

            with h5py.File(os.path.join(root, "sensor_data", seq), "w") as f:
                f.create_dataset("rgb", data=rgbs)
                f.create_dataset("detection_data",
                                 data=np.array(det_strs, dtype=object),
                                 dtype=h5py.string_dtype())
                f.create_dataset("segmentation_data",
                                 data=np.zeros((frames, height, width), np.int32))
            with h5py.File(os.path.join(root, "memory_data", seq), "w") as f:
                f.create_dataset("memory_features",
                                 data=np.zeros((num_cells, 512), np.float32))
                f.create_dataset("proj_indices", data=proj)
                d = f.create_dataset("semmap_gt",
                                     data=np.zeros((num_cells,), np.int32))
                # lvis-20+1 id space (all void here) — see build_memory.py
                d.attrs["class_space"] = "lvis21"
