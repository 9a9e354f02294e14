"""Ahead-of-time model export for production serving.

Serializes the jitted recurrent frame step to a portable StableHLO
artifact via `jax.export`: the serving process deserializes and calls it
without the model code, flax, or a Python retrace — the TPU-native
deployment story (the reference serves by reconstructing the full
detectron2 model + checkpoint in-process, `Detic/predict.py:30-60`).

The exported callable is the persistent-memory streaming step the demo
predictor runs (demo/predictor.py): params are baked as constants,
inputs are (image, zs_weight, memory_features, memory_obs, proj_indices,
outlier_mask) and outputs are (boxes, scores, classes, valid, updated
memory) — vocabulary swap stays a runtime input. `valid` marks the real
detections among the fixed detections_per_image rows; the rest are
shape padding and must be dropped by the consumer.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional, Tuple

import numpy as np


def export_frame_step(model, params, cfg, num_classes: Optional[int] = None,
                      platforms: Tuple[str, ...] = ("tpu", "cpu")) -> bytes:
    """Serialize the frame step (params baked in) to a StableHLO blob."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from embodied_object_detection_tpu.models.detector import (
        EmbodiedDetector)

    h, w = cfg.input.height, cfg.input.width
    cells = cfg.memory.max_cells
    zs_dim = cfg.roi.zs_weight_dim
    mem_dim = cfg.memory.memory_dim
    nc = num_classes or cfg.roi.num_classes

    def step(image, zs_weight, mem_features, mem_obs, proj_indices,
             outlier_mask):
        out = model.apply(
            params, image, zs_weight, mem_features, mem_obs, proj_indices,
            outlier_mask, method=EmbodiedDetector.frame_step)
        dets = out.detections
        # recurrent memory update (make_episode_runner step semantics)
        new_feat = mem_features + out.write.features_update
        new_obs = mem_obs + out.write.obs_update
        return (dets.boxes, dets.scores, dets.classes, dets.valid,
                new_feat, new_obs)

    args = (
        jax.ShapeDtypeStruct((h, w, 3), jnp.float32),
        jax.ShapeDtypeStruct((zs_dim, nc + 1), jnp.float32),
        jax.ShapeDtypeStruct((cells, mem_dim), jnp.float32),
        jax.ShapeDtypeStruct((cells,), jnp.float32),
        jax.ShapeDtypeStruct((h, w), jnp.int32),
        jax.ShapeDtypeStruct((h, w), jnp.bool_),
    )
    exp = jexport.export(jax.jit(step), platforms=list(platforms))(*args)
    return exp.serialize()


def save_frame_step(path: str, model, params, cfg, **kw) -> str:
    blob = export_frame_step(model, params, cfg, **kw)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_frame_step(path_or_blob):
    """Deserialize an exported frame step; returns a callable
    (image, zs_weight, mem_features, mem_obs, proj_indices, outlier_mask)
    -> (boxes, scores, classes, valid, mem_features', mem_obs')."""
    from jax import export as jexport
    blob = path_or_blob
    if isinstance(blob, (str, os.PathLike)):
        with open(blob, "rb") as f:
            blob = f.read()
    exp = jexport.deserialize(bytearray(blob))
    return exp.call
