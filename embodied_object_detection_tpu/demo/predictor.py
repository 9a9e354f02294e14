"""Streaming inference with persistent spatial memory (the serving layer).

ref: Detic/detic/predictor.py (EmbodiedVisualizationDemo :183,
EmbodiedPredictor :361) and the vocabulary registry (:25-65). The reference
holds memory as module state and feeds 1-frame episodes per call
(predictor.py:406-439, custom_rcnn.py:472-477); here the predictor owns an
explicit MemoryState and calls the jitted frame_step — identical recurrence,
no host round-trip inside the model.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DetectorConfig
from ..data.episode_dataset import OBJECT_LVIS
from ..models.detector import EmbodiedDetector, build_detector
from ..ops.memory_ops import semmap_classes
from ..structures import Detections, MemoryState
# ONE palette for every drawing surface (visualizer.color_palette): a
# legend rendered by Visualizer must label the same colors this predictor
# paints (the reference hard-codes one 41-color list, custom_rcnn.py:36-78)
from .visualizer import Visualizer

# The builtin vocabulary -> classifier-.npy registry lives in
# demo.demo._CLASSIFIER_FILES / find_classifier_npy (it also resolves the
# vendored data/metadata/ root; ref: predictor.py:25-44 BUILDIN_CLASSIFIER).


def get_clip_embeddings(vocabulary: List[str], prompt: str = "a ",
                        text_encoder=None) -> np.ndarray:
    """Embed an arbitrary vocabulary with the CLIP text encoder.

    ref: predictor.py:61-65 (get_clip_embeddings). Requires CLIP text-encoder
    weights (models/text_encoder.py); returns [C, 512]."""
    if text_encoder is None:
        from ..models.text_encoder import load_default_text_encoder
        text_encoder = load_default_text_encoder()
    texts = [prompt + x.replace("_", " ") for x in vocabulary]
    return np.asarray(text_encoder(texts), np.float32)


def build_zs_weight(class_embeddings: np.ndarray,
                    normalize: bool = True) -> np.ndarray:
    """[C, D] class embeddings -> the [D, C+1] zs_weight input
    (bg column zero, column-normalized).

    ref: reset_cls_test (detic/modeling/utils.py:32-50) — in this framework
    the vocabulary swap is just passing a different zs_weight array."""
    w = np.asarray(class_embeddings, np.float32).T          # D x C
    w = np.concatenate([w, np.zeros((w.shape[0], 1), np.float32)], axis=1)
    if normalize:
        n = np.linalg.norm(w, axis=0, keepdims=True)
        w = w / np.maximum(n, 1e-12)
    return w


def load_zs_weight_npy(path: str) -> np.ndarray:
    """Load a metadata .npy ([C, D] CLIP embeddings, e.g. mp3d_clip.npy)."""
    return build_zs_weight(np.load(path).astype(np.float32))


class AsyncPredictor:
    """Multi-device single-frame inference with in-order results.

    ref: detic/predictor.py:441-529 (AsyncPredictor — one worker *process*
    per GPU with task/result queues). TPU-native analog: one worker thread
    per device; params are replicated to each device once and frames
    round-robin over them. Memory-free (vanilla-demo) inference only — the
    embodied recurrence is serial by construction and uses EmbodiedPredictor.
    """

    def __init__(self, cfg: DetectorConfig, params=None,
                 zs_weight: Optional[np.ndarray] = None,
                 devices=None):
        import queue
        import threading

        self.cfg = cfg
        devices = devices or jax.devices()
        if params is None:
            model, params = build_detector(cfg)
        else:
            model = EmbodiedDetector(cfg)
        if zs_weight is None:
            zs_weight = np.zeros((cfg.roi.zs_weight_dim,
                                  cfg.roi.num_classes + 1), np.float32)
        h, w = cfg.input.height, cfg.input.width

        def make_step(device):
            p = jax.device_put(params, device)
            zs = jax.device_put(jnp.asarray(zs_weight, jnp.float32), device)
            memf = jax.device_put(
                jnp.zeros((cfg.memory.max_cells, cfg.memory.memory_dim)), device)
            memo = jax.device_put(jnp.zeros((cfg.memory.max_cells,)), device)
            proj = jax.device_put(jnp.zeros((h, w), jnp.int32), device)
            outl = jax.device_put(jnp.zeros((h, w), bool), device)

            @jax.jit
            def step(image):
                out = model.apply(p, image, zs, memf, memo, proj, outl,
                                  method=EmbodiedDetector.frame_step)
                return out.detections

            def run(image_np):
                img = jax.device_put(jnp.asarray(image_np, jnp.float32), device)
                return jax.device_get(step(img))
            return run

        self._tasks: "queue.Queue" = queue.Queue()
        self._results: dict = {}
        self._lock = threading.Lock()
        self._cv = threading.Condition(self._lock)
        self._next_put = 0
        self._next_get = 0

        def worker(run):
            while True:
                item = self._tasks.get()
                if item is None:
                    return
                idx, image = item
                try:
                    det = run(image)
                except Exception as e:  # surface in get(), don't kill pool
                    det = e
                with self._cv:
                    self._results[idx] = det
                    self._cv.notify_all()

        self._threads = []
        for d in devices:
            t = threading.Thread(target=worker, args=(make_step(d),),
                                 daemon=True)
            t.start()
            self._threads.append(t)
        # how far ahead a pipelined caller should submit (put before get)
        # to keep every device busy; ref: predictor.py:455
        # (default_buffer_size = num_gpus * 3)
        self.default_buffer_size = len(self._threads) * 3

    def put(self, image_rgb: np.ndarray):
        self._tasks.put((self._next_put, image_rgb))
        self._next_put += 1

    def get(self) -> Detections:
        with self._cv:
            while self._next_get not in self._results:
                self._cv.wait()
            det = self._results.pop(self._next_get)
            self._next_get += 1
        if isinstance(det, Exception):
            raise det  # worker failure propagates instead of hanging get()
        return det

    def __call__(self, image_rgb: np.ndarray) -> Detections:
        self.put(image_rgb)
        return self.get()

    def shutdown(self):
        for _ in self._threads:
            self._tasks.put(None)


class EmbodiedPredictor:
    """Persistent-memory streaming predictor.

    Usage:
        pred = EmbodiedPredictor(cfg, params, zs_weight)
        dets = pred(image_rgb, proj_indices)        # memory persists
        pred.reset_memory()                         # new scene
        semmap = pred.semantic_map(map_h, map_w)    # live map snapshot
    """

    def __init__(self, cfg: DetectorConfig, params=None,
                 zs_weight: Optional[np.ndarray] = None,
                 class_names: Optional[List[str]] = None):
        self.cfg = cfg
        if params is None:
            self.model, self.params = build_detector(cfg)
        else:
            self.model = EmbodiedDetector(cfg)
            self.params = params
        if zs_weight is None:
            zs_weight = np.zeros((cfg.roi.zs_weight_dim,
                                  cfg.roi.num_classes + 1), np.float32)
        self.zs_weight = jnp.asarray(zs_weight, jnp.float32)
        self.class_names = class_names or OBJECT_LVIS[:cfg.roi.num_classes]
        self._visualizer = Visualizer(self.class_names)

        model = self.model

        def _step(params, image, zs, memf, memo, proj, outl, vis):
            return model.apply(params, image, zs, memf, memo, proj, outl, vis,
                               method=EmbodiedDetector.frame_step)

        self._step = jax.jit(_step)
        self._semmap = jax.jit(
            lambda f, o, zs: semmap_classes(f, o, zs,
                                            cfg.memory.obs_score_thresh,
                                            cfg.roi.norm_temperature))
        self.reset_memory()

    def reset_memory(self):
        """ref: custom_rcnn.py:470-479 (memory reset)."""
        self.memory = MemoryState.zeros(self.cfg.memory.max_cells,
                                        self.cfg.memory.memory_dim)

    def set_vocabulary(self, zs_weight: np.ndarray,
                       class_names: Optional[List[str]] = None):
        """Runtime vocabulary swap (reset_cls_test analog)."""
        self.zs_weight = jnp.asarray(zs_weight, jnp.float32)
        if class_names:
            self.class_names = class_names
            self._visualizer = Visualizer(class_names)

    def _prep_image(self, image: np.ndarray) -> np.ndarray:
        h, w = self.cfg.input.height, self.cfg.input.width
        if image.shape[:2] != (h, w):
            from PIL import Image
            image = np.asarray(
                Image.fromarray(image.astype(np.uint8)).resize((w, h)))
        return image.astype(np.float32)

    def __call__(self, image_rgb: np.ndarray,
                 proj_indices: Optional[np.ndarray] = None,
                 outlier_mask: Optional[np.ndarray] = None) -> Detections:
        """Run one frame; memory persists across calls
        (ref: EmbodiedPredictor.__call__, predictor.py:406-439)."""
        h, w = self.cfg.input.height, self.cfg.input.width
        cells = self.cfg.memory.max_cells
        image = jnp.asarray(self._prep_image(image_rgb))
        if proj_indices is None:
            proj_indices = np.zeros((h, w), np.int32)
        if outlier_mask is None:
            outlier_mask = np.zeros((h, w), bool)
        proj_np = np.asarray(proj_indices)
        if int(proj_np.max()) >= cells:
            # on device an out-of-range cell silently aliases (read clips,
            # write drops) — the robot map must fit memory.max_cells
            raise ValueError(
                f"proj index {int(proj_np.max())} >= memory.max_cells="
                f"{cells}; raise memory.max_cells for this map size")
        vis = (np.bincount(proj_np.reshape(-1), minlength=cells)[:cells] > 0
               ).astype(np.float32)
        out = self._step(self.params, image, self.zs_weight,
                         self.memory.features, self.memory.obs_count,
                         jnp.asarray(proj_np, jnp.int32),
                         jnp.asarray(outlier_mask), jnp.asarray(vis))
        self.memory = MemoryState(
            features=self.memory.features + out.write.features_update,
            obs_count=self.memory.obs_count + out.write.obs_update)
        return out.detections

    def semantic_map(self, map_h: int, map_w: int) -> np.ndarray:
        """Live CLIP-argmax class map [map_h, map_w] int32 (-1 = unobserved).

        ref: visualise_clip_image_features via update_implicit_memory
        (custom_rcnn.py:756, 938-1017)."""
        cls = self._semmap(self.memory.features, self.memory.obs_count,
                           self.zs_weight)
        cls = np.asarray(cls)[: map_h * map_w]
        return cls.reshape(map_h, map_w)

    def render_map(self, map_h: int, map_w: int, scale: int = 4) -> np.ndarray:
        """RGB visualization of the semantic map (Visualizer.draw_semmap)."""
        return self._visualizer.draw_semmap(self.semantic_map(map_h, map_w),
                                            scale=scale)

    def frame_step_detections(self, image_rgb, proj_indices=None,
                              outlier_mask=None):
        return self(image_rgb, proj_indices, outlier_mask)

    def render_detections(self, image_rgb: np.ndarray, dets: Detections,
                          score_thresh: float = 0.3) -> np.ndarray:
        """Draw boxes + labels (Visualizer.draw_detections — same palette
        as render_map and any legend strip)."""
        return self._visualizer.draw_detections(image_rgb, dets,
                                                score_thresh=score_thresh)
