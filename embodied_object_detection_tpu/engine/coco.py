"""Vanilla single-frame train / eval over COCO-format datasets.

ref: Detic/train_net.py (the non-embodied Detic trainer: standard
detectron2 loop over LVIS/COCO with CustomRCNN — same model layer as the
embodied path, no memory, no recurrence; train_net.py:92, 164, 264) and
detectron2 inference_on_dataset for the eval side.

The single-frame model is the embodied detector with memory_type "" — the
fusion and write paths compile away; frames batch via vmap.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DetectorConfig
from ..data.catalog import CocoDetectionDataset, MultiDatasetSampler
from ..data.prefetch import prefetch_iterator
from ..evaluation.coco_eval import COCOEvaluator
from ..models.detector import EmbodiedDetector
from ..parallel.train_step import TrainBatch


def items_to_train_batch(items: List[dict], cfg: DetectorConfig,
                         pad_to_multiple: int = 1) -> TrainBatch:
    cells, d = cfg.memory.max_cells, cfg.memory.memory_dim
    b = len(items)
    pad = (-b) % max(pad_to_multiple, 1)
    h, w = cfg.input.height, cfg.input.width
    images = np.zeros((b + pad, h, w, 3), np.float32)
    # datasets in a multi-source batch may carry different max_gt paddings
    g = max(it["gt_boxes"].shape[0] for it in items)
    gt_boxes = np.zeros((b + pad, g, 4), np.float32)
    gt_classes = np.zeros((b + pad, g), np.int32)
    gt_valid = np.zeros((b + pad, g), bool)
    for i, it in enumerate(items):
        images[i] = it["image"].astype(np.float32)
        gi = it["gt_boxes"].shape[0]
        gt_boxes[i, :gi] = it["gt_boxes"]
        gt_classes[i, :gi] = it["gt_classes"]
        gt_valid[i, :gi] = it["gt_valid"]
    return TrainBatch(
        image=images,
        proj_indices=np.zeros((b + pad, h, w), np.int32),
        mem_features=np.zeros((b + pad, cells, d), np.float32),
        mem_obs=np.zeros((b + pad, cells), np.float32),
        gt_boxes=gt_boxes, gt_classes=gt_classes, gt_valid=gt_valid,
        weight=np.asarray([1.0] * b + [0.0] * pad, np.float32))


def coco_train_batches(sampler: MultiDatasetSampler,
                       datasets: List[CocoDetectionDataset],
                       cfg: DetectorConfig, batch_size: int):
    """Infinite batch generator for the vanilla trainer (pair with
    engine.train's step function or parallel.train_step directly).

    Each batch is SINGLE-SOURCE: the reference's MultiDatasetSampler +
    MDAspectRatioGroupedDataset group items per dataset so every batch
    carries one ann_type (custom_rcnn.py:203-206 asserts it) — mixing
    sources per batch would change the per-source training statistics."""
    while True:
        d = sampler.sample_source()
        items = [datasets[d][i] for i in sampler.sample_items(d, batch_size)]
        yield items_to_train_batch(items, cfg)


def caption_items_to_batch(items: List[dict], embed_fn, rng=None):
    """Assemble a caption co-training batch from catalog items.

    ref: CustomRCNN caption branch (custom_rcnn.py:226-232): one caption
    sampled per image (torch.randint), embedded by the CLIP text tower.
    `embed_fn(list[str]) -> [B, D]` is the text encoder (or a stub in
    tests — the real weights are an external asset, as in the reference).
    Returns (images [B,H,W,3] f32, caption_features [B,D] f32, weight [B])
    for parallel.train_step.make_caption_train_step."""
    if rng is None:
        # a FRESH draw per call, like the reference's torch.randint — a
        # per-call RandomState(0) would pick the identical caption index
        # sequence every batch, so an image's other captions never train
        rng = np.random
    caps = []
    for it in items:
        if "caption" in it:              # pre-sampled by MultiSourceMapper
            caps.append(it["caption"])
        else:
            cc = it.get("captions", [])
            caps.append(cc[rng.randint(len(cc))] if cc else "")
    feats = np.asarray(embed_fn(caps), np.float32)
    images = np.stack([np.asarray(it["image"], np.float32) for it in items])
    weight = np.asarray([1.0 if c else 0.0 for c in caps], np.float32)
    return images, feats, weight


def multi_source_train_batches(sampler: MultiDatasetSampler,
                               datasets: List[CocoDetectionDataset],
                               ann_types: List[str], cfg: DetectorConfig,
                               batch_size: int, embed_fn=None, seed: int = 0):
    """Per-source homogeneous batches over the full Detic data matrix:
    detection ('box'), image-label ('image'/'prop'/'proptag') and caption
    ('caption'/'captiontag') sources.

    ref: the reference trains with one ann_type per global batch
    (custom_rcnn.py:203-206 assert) drawn by MultiDatasetSampler ratios
    (custom_dataset_dataloader.py:195-266). Yields (ann_type, batch):
      'box'        -> TrainBatch
      'caption'    -> (images, caption_features, weight)
      'image'      -> (images, labels [B,L], labels_valid [B,L])
      'captiontag' -> (images, caption_features, weight, labels,
                       labels_valid) — BOTH losses apply: only
                       ann_type=='caption' skips the tag loop in the
                       reference (detic_fast_rcnn.py:370-375), so
                       captiontag sources get the caption loss AND the
                       image-label tag loss
    """
    rng = np.random.RandomState(seed)

    def pad_image_labels(items):
        # raw catalog items carry ragged pos_category_ids; mapper
        # items carry fixed [L] labels + labels_valid — pad both to
        # the batch max
        raw = [np.asarray(it.get("labels",
                                 it.get("pos_category_ids", [])),
                          np.int32).reshape(-1) for it in items]
        ln = max([len(r) for r in raw] + [1])
        labels = np.zeros((len(items), ln), np.int32)
        lv = np.zeros((len(items), ln), bool)
        for i, (it, r) in enumerate(zip(items, raw)):
            labels[i, :len(r)] = r
            v = np.asarray(it.get("labels_valid",
                                  np.ones(len(r), bool))).reshape(-1)
            lv[i, :len(v)] = v[:ln]
        return labels, lv

    while True:
        d = sampler.sample_source()
        items = [datasets[d][i] for i in sampler.sample_items(d, batch_size)]
        at = ann_types[d]
        if at == "box":
            yield "box", items_to_train_batch(items, cfg)
        elif at == "captiontag":
            assert embed_fn is not None, "caption source needs a text encoder"
            images, feats, wt = caption_items_to_batch(items, embed_fn, rng)
            labels, lv = pad_image_labels(items)
            yield "captiontag", (images, feats, wt, labels, lv)
        elif "caption" in at:
            assert embed_fn is not None, "caption source needs a text encoder"
            yield "caption", caption_items_to_batch(items, embed_fn, rng)
        else:
            images = np.stack([np.asarray(it["image"], np.float32)
                               for it in items])
            labels, lv = pad_image_labels(items)
            yield "image", (images, labels, lv)


def evaluate_coco(model: EmbodiedDetector, params, cfg: DetectorConfig,
                  dataset: CocoDetectionDataset, zs_weight: np.ndarray,
                  batch: int = 8, max_images: Optional[int] = None,
                  verbose: bool = True,
                  federated: bool = False) -> Dict[str, float]:
    """Single-frame inference + COCO bbox AP (inference_on_dataset analog).

    Images are letterboxed by the dataset; predictions are rescaled back to
    original coordinates (detector_postprocess analog). federated=True
    selects the LVIS protocol (LVISEvaluator analog: federated category
    drop + maxDets 300) — scoring an LVIS-vocabulary dataset with the COCO
    protocol penalizes detections of unannotated categories and caps at
    100 dets, producing numbers incomparable to the reference."""
    zs = jnp.asarray(zs_weight, jnp.float32)
    h, w = cfg.input.height, cfg.input.width
    dummy_proj = jnp.zeros((h, w), jnp.int32)
    dummy_out = jnp.zeros((h, w), bool)
    memf = jnp.zeros((cfg.memory.max_cells, cfg.memory.memory_dim), jnp.float32)
    memo = jnp.zeros((cfg.memory.max_cells,), jnp.float32)

    from ..models.res5_detector import Res5Detector

    if isinstance(model, Res5Detector):
        # single-frame Res5 variant: frame_step(image, zs) only
        def one(params, image):
            out = model.apply(params, image, zs,
                              method=Res5Detector.frame_step)
            return out.detections
    else:
        def one(params, image):
            out = model.apply(params, image, zs, memf, memo, dummy_proj,
                              dummy_out, method=EmbodiedDetector.frame_step)
            return out.detections

    batched = jax.jit(jax.vmap(one, in_axes=(None, 0)))

    n = len(dataset) if max_images is None else min(max_images, len(dataset))
    ev = COCOEvaluator(list(range(cfg.roi.num_classes)),
                       dataset.entry.thing_classes or None,
                       max_dets=300 if federated else 100,
                       federated=federated)
    t0 = time.perf_counter()
    items_iter = prefetch_iterator(dataset.__getitem__, range(n))
    done = 0
    while done < n:
        items = [next(items_iter) for _ in range(min(batch, n - done))]
        pad = batch - len(items)
        images = np.stack([it["image"].astype(np.float32) for it in items] +
                          [np.zeros((h, w, 3), np.float32)] * pad)
        dets = batched(params, jnp.asarray(images))
        boxes = np.asarray(dets.boxes)
        scores = np.asarray(dets.scores)
        classes = np.asarray(dets.classes)
        valid = np.asarray(dets.valid)
        for k, it in enumerate(items):
            img_id = it["image_id"]
            ev.add_image(img_id, it.get("neg_category_ids", ()))
            gv = it["gt_valid"]
            s = it["scale"]
            oh, ow = it["orig_hw"]
            ev.add_ground_truth(img_id, it["gt_boxes"][gv] / s,
                                it["gt_classes"][gv])
            v = valid[k]
            # detector_postprocess clips output boxes to the original
            # image size; unclipped boxes in the letterbox padding would
            # change border-object IoU vs the reference protocol
            db = np.clip(boxes[k][v] / s,
                         0, [ow, oh, ow, oh]).astype(np.float32)
            ev.add_detections(img_id, db, scores[k][v],
                              classes[k][v])
        done += len(items)
        if verbose and done % (batch * 10) == 0:
            print(f"eval {done}/{n} ({(time.perf_counter()-t0)/done:.3f}s/img)")
    return ev.evaluate()
