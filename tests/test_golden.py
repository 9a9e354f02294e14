"""Golden-output regression: the tiny model's full frame step must reproduce
checked-in outputs bit-closely (the pinned-metric integration-test pattern,
SURVEY.md §4). Regenerate tests/golden/tiny_frame_outputs.npz deliberately
when semantics change (see the generator snippet in git history)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from common import tiny_config

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "tiny_frame_outputs.npz")


@pytest.mark.slow
def test_frame_step_matches_golden():
    from embodied_object_detection_tpu.models.detector import (
        EmbodiedDetector, build_detector)
    from embodied_object_detection_tpu.structures import MemoryState

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

    g = np.load(GOLDEN)
    np.testing.assert_allclose(np.asarray(out.detections.scores), g["scores"],
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.detections.boxes), g["boxes"],
                               atol=0.05)
    np.testing.assert_array_equal(np.asarray(out.detections.classes),
                                  g["classes"])
    np.testing.assert_array_equal(np.asarray(out.detections.valid), g["valid"])
    np.testing.assert_allclose(np.asarray(out.proposals.scores),
                               g["prop_scores"], atol=1e-4)
    np.testing.assert_allclose(float(jnp.sum(out.write.features_update)),
                               g["mem_update_sum"], rtol=1e-3)
    np.testing.assert_allclose(float(jnp.sum(out.write.obs_update)),
                               g["obs_update_sum"])
