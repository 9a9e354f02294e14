"""Regenerate tests/golden/tiny_frame_outputs.npz (run on CPU).

Run deliberately when frame-step semantics change:
    JAX_PLATFORMS=cpu python tools/gen_golden.py
Inputs mirror tests/test_golden.py exactly.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from common import tiny_config
from embodied_object_detection_tpu.models.detector import (
    EmbodiedDetector, build_detector)
from embodied_object_detection_tpu.structures import MemoryState


def main():
    cfg = tiny_config()
    model, params = build_detector(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    h, w = cfg.input.height, cfg.input.width
    image = jnp.asarray(rng.randint(0, 255, (h, w, 3)).astype(np.float32))
    zs = jnp.asarray(rng.randn(cfg.roi.zs_weight_dim,
                               cfg.roi.num_classes + 1).astype(np.float32))
    proj = jnp.asarray(rng.randint(0, cfg.memory.max_cells, (h, w)).astype(np.int32))
    mem = MemoryState.zeros(cfg.memory.max_cells, cfg.memory.memory_dim)
    out = model.apply(params, image, zs, mem.features, mem.obs_count, proj,
                      jnp.zeros((h, w), bool),
                      method=EmbodiedDetector.frame_step)
    path = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                        "tiny_frame_outputs.npz")
    np.savez(
        path,
        scores=np.asarray(out.detections.scores),
        boxes=np.asarray(out.detections.boxes),
        classes=np.asarray(out.detections.classes),
        valid=np.asarray(out.detections.valid),
        prop_scores=np.asarray(out.proposals.scores),
        mem_update_sum=np.float64(jnp.sum(out.write.features_update)),
        obs_update_sum=np.float64(jnp.sum(out.write.obs_update)),
    )
    print("wrote", path,
          "n_valid_dets:", int(np.asarray(out.detections.valid).sum()),
          "mem_update_sum:", float(jnp.sum(out.write.features_update)))


if __name__ == "__main__":
    main()
