"""Dataset catalog + COCO-json dataset for single-frame (vanilla Detic) paths.

ref: detectron2 DatasetCatalog/MetadataCatalog as used by the reference's
registrations (Detic/detic/data/datasets/*.py, ~1800 LoC of per-dataset
glue; mp3d_example registered at train_mp3d.py:81 via
register_coco_instances). Here: one registry mapping name ->
(annotations json, image root, metadata), plus a COCO-json reader producing
fixed-shape frames for the single-frame trainer/evaluator.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np


@dataclass
class DatasetEntry:
    json_file: str
    image_root: str
    thing_classes: List[str] = field(default_factory=list)
    # maps raw category_id -> contiguous [0, C) (detectron2's
    # thing_dataset_id_to_contiguous_id)
    id_map: Dict[int, int] = field(default_factory=dict)
    # per-class image counts for repeat-factor / federated sampling
    class_image_count: Dict[int, int] = field(default_factory=dict)


_CATALOG: Dict[str, DatasetEntry] = {}


def register_coco_instances(name: str, json_file: str, image_root: str):
    """ref: detectron2 register_coco_instances (train_mp3d.py:81)."""
    _CATALOG[name] = DatasetEntry(json_file=json_file, image_root=image_root)


def get_dataset(name: str) -> DatasetEntry:
    return _CATALOG[name]


def list_datasets() -> List[str]:
    return sorted(_CATALOG)


class CocoDetectionDataset:
    """COCO-format detection dataset with padded fixed-shape outputs.

    Frames: dict(image [H, W, 3] uint8, gt_boxes [G, 4] xyxy, gt_classes [G],
    gt_valid [G], image_id, file_name). Images are letterbox-resized to the
    target (height, width) with GT boxes scaled accordingly (the analog of
    ResizeShortestEdge to a fixed canvas; the mp3d path uses raw 480x640)."""

    def __init__(self, name_or_entry, height: int = 480, width: int = 640,
                 max_gt: int = 64, filter_empty: bool = False):
        entry = (get_dataset(name_or_entry)
                 if isinstance(name_or_entry, str) else name_or_entry)
        self.entry = entry
        self.height = height
        self.width = width
        self.max_gt = max_gt
        with open(entry.json_file) as f:
            coco = json.load(f)
        cats = sorted(coco.get("categories", []), key=lambda c: c["id"])
        entry.thing_classes = [c.get("name", str(c["id"])) for c in cats]
        entry.id_map = {c["id"]: i for i, c in enumerate(cats)}
        self.images = {im["id"]: im for im in coco["images"]}
        self.anns_by_image: Dict[int, List[dict]] = {}
        counts: Dict[int, int] = {}
        for ann in coco.get("annotations", []):
            if ann.get("iscrowd", 0):
                continue
            self.anns_by_image.setdefault(ann["image_id"], []).append(ann)
        for img_id, anns in self.anns_by_image.items():
            for c in {entry.id_map[a["category_id"]] for a in anns}:
                counts[c] = counts.get(c, 0) + 1
        entry.class_image_count = counts
        self.ids = [i for i in self.images
                    if not filter_empty or self.anns_by_image.get(i)]

    def __len__(self):
        return len(self.ids)

    def class_repeat_factors(self, repeat_thresh: float) -> np.ndarray:
        """RepeatFactorTrainingSampler factors (detectron2 / ref yaml
        REPEAT_THRESHOLD): r(img) = max over categories in img of
        max(1, sqrt(t / f_c))."""
        n = max(len(self.ids), 1)
        freq = {c: cnt / n for c, cnt in self.entry.class_image_count.items()}
        cat_rep = {c: max(1.0, np.sqrt(repeat_thresh / max(f, 1e-12)))
                   for c, f in freq.items()}
        factors = []
        for img_id in self.ids:
            cats = {self.entry.id_map[a["category_id"]]
                    for a in self.anns_by_image.get(img_id, [])}
            factors.append(max([cat_rep.get(c, 1.0) for c in cats], default=1.0))
        return np.asarray(factors)

    def __getitem__(self, index: int) -> dict:
        img_id = self.ids[index]
        info = self.images[img_id]
        path = os.path.join(self.entry.image_root, info["file_name"])
        from PIL import Image
        with open(path, "rb") as f:
            img = np.asarray(Image.open(f).convert("RGB"))
        h0, w0 = img.shape[:2]
        scale = min(self.height / h0, self.width / w0)
        nh, nw = int(round(h0 * scale)), int(round(w0 * scale))
        if (nh, nw) != (h0, w0):
            from PIL import Image as I
            img = np.asarray(I.fromarray(img).resize((nw, nh)))
        canvas = np.zeros((self.height, self.width, 3), np.uint8)
        canvas[:nh, :nw] = img

        boxes = np.zeros((self.max_gt, 4), np.float32)
        classes = np.zeros((self.max_gt,), np.int32)
        valid = np.zeros((self.max_gt,), bool)
        for i, ann in enumerate(self.anns_by_image.get(img_id, [])[: self.max_gt]):
            x, y, w, h = ann["bbox"]
            boxes[i] = np.array([x, y, x + w, y + h]) * scale
            classes[i] = self.entry.id_map[ann["category_id"]]
            valid[i] = True
        return dict(image=canvas, gt_boxes=boxes, gt_classes=classes,
                    gt_valid=valid, image_id=img_id,
                    file_name=info["file_name"], scale=scale,
                    orig_hw=(h0, w0))


class MultiDatasetSampler:
    """Ratio-weighted multi-dataset sampling with optional repeat-factor
    (RFS) within each dataset.

    ref: Detic/detic/data/custom_dataset_dataloader.py:195-266
    (MultiDatasetSampler with DATASET_RATIO + USE_RFS). Yields
    (dataset_index, item_index) pairs."""

    def __init__(self, datasets: List[CocoDetectionDataset],
                 ratios: List[float], use_rfs: Optional[List[bool]] = None,
                 repeat_thresh: float = 0.001, seed: int = 0):
        self.datasets = datasets
        ratios = np.asarray(ratios, np.float64)
        self.p_dataset = ratios / ratios.sum()
        self.rng = np.random.RandomState(seed)
        self.item_p = []
        for i, ds in enumerate(datasets):
            if use_rfs and use_rfs[i]:
                f = ds.class_repeat_factors(repeat_thresh)
                self.item_p.append(f / f.sum())
            else:
                self.item_p.append(None)

    def sample(self, n: int) -> List[Tuple[int, int]]:
        out = []
        for _ in range(n):
            d = int(self.rng.choice(len(self.datasets), p=self.p_dataset))
            p = self.item_p[d]
            i = int(self.rng.choice(len(self.datasets[d]), p=p))
            out.append((d, i))
        return out
