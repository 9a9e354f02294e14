"""AOT export: serialized frame step == live model, vocabulary swappable."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from common import tiny_config


@pytest.mark.slow
def test_export_roundtrip_matches_live_model(tmp_path):
    from embodied_object_detection_tpu.models.detector import (
        EmbodiedDetector, build_detector)
    from embodied_object_detection_tpu.serve import (
        export_frame_step, load_frame_step)
    from embodied_object_detection_tpu.serve.export import save_frame_step

    cfg = tiny_config()
    model, params = build_detector(cfg, jax.random.PRNGKey(0))
    path = save_frame_step(str(tmp_path / "frame_step.stablehlo"),
                           model, params, cfg, platforms=("cpu",))
    step = load_frame_step(path)

    h, w = cfg.input.height, cfg.input.width
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.randint(0, 255, (h, w, 3)).astype(np.float32))
    zs = jnp.asarray(rng.randn(cfg.roi.zs_weight_dim,
                               cfg.roi.num_classes + 1).astype(np.float32))
    memf = jnp.zeros((cfg.memory.max_cells, cfg.memory.memory_dim),
                     jnp.float32)
    memo = jnp.zeros((cfg.memory.max_cells,), jnp.float32)
    proj = jnp.asarray(rng.randint(0, cfg.memory.max_cells, (h, w)),
                       dtype=jnp.int32)
    outl = jnp.zeros((h, w), bool)

    boxes, scores, classes, valid, memf2, memo2 = step(image, zs, memf,
                                                       memo, proj, outl)

    out = model.apply(params, image, zs, memf, memo, proj, outl,
                      method=EmbodiedDetector.frame_step)
    np.testing.assert_allclose(np.asarray(boxes),
                               np.asarray(out.detections.boxes),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(scores),
                               np.asarray(out.detections.scores),
                               rtol=1e-5, atol=1e-5)
    # consumers need the padding mask — identical to the live model's
    np.testing.assert_array_equal(np.asarray(valid),
                                  np.asarray(out.detections.valid))
    np.testing.assert_allclose(
        np.asarray(memf2),
        np.asarray(memf + out.write.features_update), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(memo2),
        np.asarray(memo + out.write.obs_update), rtol=1e-5, atol=1e-5)

    # vocabulary swap stays a runtime input on the exported artifact
    zs2 = jnp.asarray(rng.randn(*zs.shape).astype(np.float32))
    scores_b = step(image, zs2, memf, memo, proj, outl)[1]
    assert not np.allclose(np.asarray(scores_b), np.asarray(scores))
