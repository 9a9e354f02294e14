"""One-call cloud-serving predictor (the cog wrapper analog).

ref: Detic/predict.py:21-97 (cog.Predictor): setup() builds the model once;
predict(image, vocabulary, custom_vocabulary) swaps the vocabulary, runs one
image and returns the path of a rendered visualization. The cog decorators
become plain keyword arguments; everything else keeps the same surface.

Usage:
    from embodied_object_detection_tpu.demo.predict_api import Predictor
    p = Predictor()
    p.setup(weights="model.pth")
    out_path = p.predict("image.jpg", vocabulary="lvis")
    out_path = p.predict("image.jpg", vocabulary="custom",
                         custom_vocabulary="headphone,webcam,cup")
"""

from __future__ import annotations

import dataclasses
import os
import tempfile
from typing import List, Optional

import numpy as np

from ..config import DetectorConfig
from ..structures import Detections


class Predictor:
    """cog.Predictor-style wrapper around the single-frame detector."""

    def setup(self, cfg: Optional[DetectorConfig] = None, weights: str = "",
              params=None):
        """Build the model once (ref: predict.py:23-43: score thresh 0.5,
        ONE_CLASS_PER_PROPOSAL=True, vocabulary loaded per predict call)."""
        cfg = cfg or DetectorConfig()
        self.cfg = cfg.replace(
            roi=dataclasses.replace(cfg.roi, score_thresh_test=0.3,
                                    one_class_per_proposal=True),
            memory=dataclasses.replace(cfg.memory, memory_type="image_only",
                                       write_memory=False))
        self._weights = weights
        self._params = params
        self._demo = None
        self._vocab_key = None

    def _ensure_vocab(self, vocabulary: str, custom_vocabulary: str):
        from .demo import VisualizationDemo, resolve_vocabulary, _load_params
        key = (vocabulary, custom_vocabulary)
        if self._vocab_key == key:
            return
        zs, names = resolve_vocabulary(vocabulary, custom_vocabulary)
        if self._demo is None:
            if self._params is None:
                cfg = self.cfg.replace(roi=dataclasses.replace(
                    self.cfg.roi, num_classes=len(names)))
                self._params = _load_params(cfg, self._weights)
            self._demo = VisualizationDemo(self.cfg, zs, names,
                                           params=self._params)
        else:
            # runtime vocabulary swap (reset_cls_test analog): the
            # zs_weight is a model INPUT, so a different class count just
            # triggers one re-jit of the frame step (the reference
            # predictor rebuilds the classifier per call too,
            # predict.py:60-83)
            self._demo.predictor.set_vocabulary(zs, names)
            self._demo.class_names = names
            from .visualizer import Visualizer
            self._demo.visualizer = Visualizer(names)
        self._vocab_key = key

    def predict(self, image: str, vocabulary: str = "lvis",
                custom_vocabulary: Optional[str] = None,
                confidence_threshold: float = 0.5,
                output_path: Optional[str] = None) -> str:
        """Run one image; returns the visualization path
        (ref: predict.py:45-90). Custom vocabularies lower the score
        threshold to 0.3 like the reference (:83-86)."""
        from PIL import Image
        self._ensure_vocab(vocabulary, custom_vocabulary or "")
        thresh = 0.3 if vocabulary == "custom" else confidence_threshold
        img = np.asarray(Image.open(image).convert("RGB"))
        self.last_detections, vis = self._demo.run_on_image(img, thresh)
        if output_path is None:
            output_path = os.path.join(tempfile.mkdtemp(), "out.png")
        Image.fromarray(vis).save(output_path)
        return output_path

    def detect(self, image_rgb: np.ndarray, vocabulary: str = "lvis",
               custom_vocabulary: Optional[str] = None) -> Detections:
        """Programmatic variant: detections only, no file IO."""
        self._ensure_vocab(vocabulary, custom_vocabulary or "")
        dets, _ = self._demo.run_on_image(image_rgb)
        return dets
