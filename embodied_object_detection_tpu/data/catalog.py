"""Dataset catalog + COCO-json dataset for single-frame (vanilla Detic) paths.

ref: detectron2 DatasetCatalog/MetadataCatalog as used by the reference's
registrations (Detic/detic/data/datasets/*.py, ~1800 LoC of per-dataset
glue; mp3d_example registered at train_mp3d.py:81 via
register_coco_instances). Here: one registry mapping name ->
(annotations json, image root, metadata), plus a COCO-json reader producing
fixed-shape frames for the single-frame trainer/evaluator.
"""

from __future__ import annotations

import dataclasses
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
    # extra per-dataset metadata (e.g. OID freebase ids, zeroshot split)
    extras: Dict[str, object] = field(default_factory=dict)


_CATALOG: Dict[str, DatasetEntry] = {}

METADATA_DIR = os.path.join(os.path.dirname(__file__), "metadata")


def register_coco_instances(name: str, json_file: str, image_root: str):
    """ref: detectron2 register_coco_instances (train_mp3d.py:81)."""
    _CATALOG[name] = DatasetEntry(json_file=json_file, image_root=image_root)


def register_dataset(name: str, entry: DatasetEntry):
    _CATALOG[name] = entry


def get_dataset(name: str) -> DatasetEntry:
    return _CATALOG[name]


def list_datasets() -> List[str]:
    return sorted(_CATALOG)


# ---------------------------------------------------------------------------
# built-in category metadata (vendored JSON extracted from the reference's
# literal tables by tools/extract_category_metadata.py)
# ref: Detic/detic/data/datasets/{lvis_v1,oid,objects365,coco_zeroshot}.py
# ---------------------------------------------------------------------------

# the standard 80 COCO-2017 thing classes (public schema)
COCO_CLASSES = [
    "person", "bicycle", "car", "motorcycle", "airplane", "bus", "train",
    "truck", "boat", "traffic light", "fire hydrant", "stop sign",
    "parking meter", "bench", "bird", "cat", "dog", "horse", "sheep", "cow",
    "elephant", "bear", "zebra", "giraffe", "backpack", "umbrella", "handbag",
    "tie", "suitcase", "frisbee", "skis", "snowboard", "sports ball", "kite",
    "baseball bat", "baseball glove", "skateboard", "surfboard",
    "tennis racket", "bottle", "wine glass", "cup", "fork", "knife", "spoon",
    "bowl", "banana", "apple", "sandwich", "orange", "broccoli", "carrot",
    "hot dog", "pizza", "donut", "cake", "chair", "couch", "potted plant",
    "bed", "dining table", "toilet", "tv", "laptop", "mouse", "remote",
    "keyboard", "cell phone", "microwave", "oven", "toaster", "sink",
    "refrigerator", "book", "clock", "vase", "scissors", "teddy bear",
    "hair drier", "toothbrush"]


def load_categories(table: str) -> List[dict]:
    """Load a vendored category table: one of 'lvis_v1', 'oid',
    'objects365', 'lvis_22k', or 'coco_zeroshot' (dict of seen/unseen)."""
    path = os.path.join(METADATA_DIR, f"{table}_categories.json")
    with open(path) as f:
        return json.load(f)


def load_class_freq(path: str = "", freq_weight: float = 0.5) -> np.ndarray:
    """Per-class image-count**freq_weight for federated-loss sampling.

    ref: detic/modeling/utils.py:load_class_freq — reads the LVIS
    cat-info json (vendored: data/metadata/lvis_v1_train_cat_info.json)
    and raises counts to CAT_FREQ_PATH weight (default 0.5). Feed the
    result to models.losses.fed_loss_class_weight."""
    if not path:
        path = os.path.join(METADATA_DIR, "lvis_v1_train_cat_info.json")
    with open(path) as f:
        cat_info = json.load(f)
    counts = np.asarray([c["image_count"] for c in
                         sorted(cat_info, key=lambda x: x["id"])],
                        np.float32)
    return counts ** freq_weight


def builtin_class_names(vocabulary: str) -> List[str]:
    """Class-name list for a built-in vocabulary (demo/predict surface).

    ref: the BUILDIN_METADATA_PATH thing_classes lookups in
    Detic/predict.py:38-43 / demo VisualizationDemo."""
    if vocabulary == "coco":
        return list(COCO_CLASSES)
    if vocabulary == "mp3d":
        from .episode_dataset import OBJECT_LVIS
        return list(OBJECT_LVIS)
    table = {"lvis": "lvis_v1", "openimages": "oid",
             "objects365": "objects365", "in21k": "lvis_22k"}[vocabulary]
    cats = load_categories(table)
    return [c["name"] for c in sorted(cats, key=lambda c: c["id"])]


def register_builtin_datasets(root: str = "datasets"):
    """Register the reference's predefined splits with vendored metadata.

    ref: _PREDEFINED_SPLITS_* in Detic/detic/data/datasets/lvis_v1.py:119,
    objects365.py:757, oid.py:518, coco_zeroshot.py:95, imagenet.py:19.
    Registration is lazy (json files may not exist until downloaded), as in
    detectron2."""

    def entry(json_file, image_root, cats, extras=None):
        cats = sorted(cats, key=lambda c: c["id"])
        return DatasetEntry(
            json_file=os.path.join(root, json_file),
            image_root=os.path.join(root, image_root),
            thing_classes=[c["name"] for c in cats],
            id_map={c["id"]: i for i, c in enumerate(cats)},
            class_image_count={i: c["image_count"]
                               for i, c in enumerate(cats)
                               if "image_count" in c},
            extras=extras or {})

    lvis = load_categories("lvis_v1")
    for name, (img, js) in {
        "lvis_v1_train": ("coco/", "lvis/lvis_v1_train.json"),
        "lvis_v1_val": ("coco/", "lvis/lvis_v1_val.json"),
        "lvis_v1_train+coco": ("coco/", "lvis/lvis_v1_train+coco_mask.json"),
        "lvis_v1_train_norare": ("coco/", "lvis/lvis_v1_train_norare.json"),
    }.items():
        register_dataset(name, entry(js, img, lvis))

    o365 = load_categories("objects365")
    for name, (img, js) in {
        "objects365_v2_train": (
            "objects365/train",
            "objects365/annotations/zhiyuan_objv2_train_fixname_fixmiss.json"),
        "objects365_v2_val": (
            "objects365/val",
            "objects365/annotations/zhiyuan_objv2_val_fixname.json"),
    }.items():
        register_dataset(name, entry(js, img, o365))

    oid = load_categories("oid")
    for name, (img, js) in {
        "oid_train": ("oid/images/",
                      "oid/annotations/oid_challenge_2019_train_bbox.json"),
        "oid_val_expanded": (
            "oid/images/validation/",
            "oid/annotations/oid_challenge_2019_val_expanded.json"),
    }.items():
        register_dataset(name, entry(
            js, img, oid,
            extras={"freebase_id": [c["freebase_id"] for c in
                                    sorted(oid, key=lambda c: c["id"])]}))

    zs = load_categories("coco_zeroshot")
    register_dataset("coco_zeroshot_train", entry(
        "coco/zero-shot/instances_train2017_seen_2.json", "coco/train2017",
        zs["seen"], extras={"split": "seen"}))
    register_dataset("coco_zeroshot_val", entry(
        "coco/zero-shot/instances_val2017_unseen_2.json", "coco/val2017",
        zs["unseen"], extras={"split": "unseen"}))
    # generalized zeroshot eval: the reference registers the ORIORDER json
    # (full original-order 80-class COCO table, produced by
    # tools/get_coco_zeroshot_oriorder.py) with plain COCO metadata —
    # a seen+unseen 65-class list would align zs_weight columns to a
    # different label space (coco_zeroshot.py:95-110). Categories are
    # enriched from the json itself at load (the oriorder table IS the
    # label space).
    for name in ("coco_generalized_zeroshot_val", "coco_zeroshot_val_all"):
        register_dataset(name, entry(
            "coco/zero-shot/instances_val2017_all_2_oriorder.json",
            "coco/val2017", [], extras={"split": "all"}))

    register_dataset("imagenet_lvis_v1", entry(
        "imagenet/annotations/imagenet_lvis_image_info.json",
        "imagenet/ImageNet-LVIS/", lvis, extras={"ann_type": "image"}))
    lvis22k = load_categories("lvis_22k")
    register_dataset("imagenet_lvis-22k", entry(
        "imagenet/annotations/imagenet-22k_image_info_lvis-22k.json",
        "imagenet/ImageNet-LVIS/", lvis22k, extras={"ann_type": "image"}))

    # Conceptual Captions (caption co-training data source).
    # ref: Detic/detic/data/datasets/cc.py:9-22 — cc3m splits registered
    # with the LVIS-v1 category space; image dicts carry `captions`, the
    # tags variant additionally `pos_category_ids` (lvis_v1.py:84-96).
    for name, (img, js, ann) in {
        "cc3m_v1_val": ("cc3m/validation/", "cc3m/val_image_info.json",
                        "caption"),
        "cc3m_v1_train": ("cc3m/training/", "cc3m/train_image_info.json",
                          "caption"),
        "cc3m_v1_train_tags": ("cc3m/training/",
                               "cc3m/train_image_info_tags.json",
                               "captiontag"),
    }.items():
        register_dataset(name, entry(js, img, lvis,
                                     extras={"ann_type": ann}))

    register_coco_instances(
        "mp3d_example",
        os.path.join(root, "../embodied_data/mp3d_example/annotations.json"),
        os.path.join(root, "../embodied_data/mp3d_example"))


class CocoDetectionDataset:
    """COCO-format detection dataset with padded fixed-shape outputs.

    Frames: dict(image [H, W, 3] uint8, gt_boxes [G, 4] xyxy, gt_classes [G],
    gt_valid [G], image_id, file_name). Images are letterbox-resized to the
    target (height, width) with GT boxes scaled accordingly (the analog of
    ResizeShortestEdge to a fixed canvas; the mp3d path uses raw 480x640)."""

    def __init__(self, name_or_entry, height: int = 480, width: int = 640,
                 max_gt: int = 64, filter_empty: bool = False,
                 remap_ids: bool = True):
        """remap_ids=True maps category ids to contiguous [0, C) (the
        detectron2 convention for training); False keeps raw ids — needed
        when the json's ids ARE the model's vocabulary indices (the mp3d
        jsons from create_coco.py) so eval compares matching label
        spaces."""
        entry = (get_dataset(name_or_entry)
                 if isinstance(name_or_entry, str) else name_or_entry)
        self.remap_ids = remap_ids
        self.height = height
        self.width = width
        self.max_gt = max_gt
        with open(entry.json_file) as f:
            coco = json.load(f)
        cats = sorted(coco.get("categories", []), key=lambda c: c["id"])
        # work on a copy — mutating the registered entry would clobber
        # vendored metadata (names, federated image counts) for every
        # later consumer of the catalog; EMPTY registered fields are still
        # enriched from the json as a convenience
        registered = entry
        entry = dataclasses.replace(entry)
        self.entry = entry
        entry.thing_classes = [c.get("name", str(c["id"])) for c in cats]
        if not registered.thing_classes:
            registered.thing_classes = list(entry.thing_classes)
        if self.remap_ids:
            entry.id_map = {c["id"]: i for i, c in enumerate(cats)}
        else:
            # raw-id label space: the mp3d jsons (create_coco.py) use
            # vocabulary indices as category ids, which must line up with
            # the model's zs_weight columns un-remapped
            entry.id_map = {c["id"]: c["id"] for c in cats}
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
        max(1, sqrt(t / f_c)). For image-info datasets (no box annotations
        — tag/caption sources) the frequencies come from pos_category_ids
        like the reference's repeat_factors_from_tag_frequency
        (custom_dataset_dataloader.py:233-239, :308-330) — the box-count
        variant would silently degenerate to uniform sampling there."""
        n = max(len(self.ids), 1)
        if not self.anns_by_image or not any(self.anns_by_image.values()):
            from collections import defaultdict
            tag_freq: Dict[int, int] = defaultdict(int)
            per_img_tags = []
            for img_id in self.ids:
                tags = [int(c)
                        for c in self.images[img_id].get("pos_category_ids",
                                                         [])]
                per_img_tags.append(tags)
                for c in set(tags):
                    tag_freq[c] += 1
            cat_rep = {c: max(1.0, np.sqrt(repeat_thresh / (cnt / n)))
                       for c, cnt in tag_freq.items()}
            return np.asarray([
                max([cat_rep.get(c, 1.0) for c in tags], default=1.0)
                for tags in per_img_tags])
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
        from PIL import Image, ImageOps
        with open(path, "rb") as f:
            # EXIF orientation like detectron2's read_image — web-sourced
            # jpegs (cc3m) are annotated on the ROTATED image
            img = np.asarray(ImageOps.exif_transpose(
                Image.open(f)).convert("RGB"))
        h0, w0 = img.shape[:2]
        scale = min(self.height / h0, self.width / w0)
        nh, nw = int(round(h0 * scale)), int(round(w0 * scale))
        if (nh, nw) != (h0, w0):
            from PIL import Image as I
            # bilinear like detectron2 ResizeTransform (and augment.py:57);
            # PIL's default is bicubic
            img = np.asarray(I.fromarray(img).resize((nw, nh), I.BILINEAR))
        canvas = np.zeros((self.height, self.width, 3), np.uint8)
        canvas[:nh, :nw] = img

        boxes = np.zeros((self.max_gt, 4), np.float32)
        classes = np.zeros((self.max_gt,), np.int32)
        valid = np.zeros((self.max_gt,), bool)
        anns = self.anns_by_image.get(img_id, [])
        if len(anns) > self.max_gt:
            # the reference keeps every annotation; silent truncation turns
            # detections on the dropped objects into false positives
            print(f"WARNING: image {img_id}: {len(anns)} annotations exceed "
                  f"max_gt={self.max_gt}; {len(anns) - self.max_gt} dropped "
                  "— raise input.max_gt_boxes")
        for i, ann in enumerate(self.anns_by_image.get(img_id, [])[: self.max_gt]):
            x, y, w, h = ann["bbox"]
            boxes[i] = np.array([x, y, x + w, y + h]) * scale
            classes[i] = self.entry.id_map[ann["category_id"]]
            valid[i] = True
        out = dict(image=canvas, gt_boxes=boxes, gt_classes=classes,
                   gt_valid=valid, image_id=img_id,
                   file_name=info["file_name"], scale=scale,
                   orig_hw=(h0, w0))
        # caption / image-label co-training fields riding on the image dict
        # (ref: custom_load_lvis_json, lvis_v1.py:84-96). pos/neg category
        # ids are REMAPPED to contiguous [0, C) at load time like the
        # reference (lvis_v1.py:83-88) — raw 1-based LVIS ids fed straight
        # into the tag loss would train the class AFTER the true one
        for k in ("captions", "caption_features"):
            if k in info:
                out[k] = info[k]
        for k in ("pos_category_ids", "neg_category_ids"):
            if k in info:
                out[k] = [self.entry.id_map.get(int(c), int(c))
                          if self.remap_ids else int(c) for c in info[k]]
        return out


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
            d = self.sample_source()
            out.append((d, self.sample_items(d, 1)[0]))
        return out

    def sample_source(self) -> int:
        """Pick one dataset by ratio — per-source homogeneous batches are
        the reference's design (custom_dataset_dataloader.py:268-306
        per-dataset batch sizes; custom_rcnn.py:203-206 asserts one
        ann_type per batch)."""
        return int(self.rng.choice(len(self.datasets), p=self.p_dataset))

    def sample_items(self, d: int, n: int) -> List[int]:
        p = self.item_p[d]
        return [int(self.rng.choice(len(self.datasets[d]), p=p))
                for _ in range(n)]
