"""Swin backbone: shapes, shift-mask structure, detector integration."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from embodied_object_detection_tpu.models.swin import (
    SwinTransformer, window_partition, window_reverse, relative_position_index,
    _shift_mask)


def test_window_partition_roundtrip(rng):
    x = jnp.asarray(rng.randn(14, 28, 4).astype(np.float32))
    w = window_partition(x, 7)
    assert w.shape == (2 * 4, 49, 4)
    back = window_reverse(w, 7, 14, 28)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_relative_position_index_range():
    idx = relative_position_index(7)
    assert idx.shape == (49, 49)
    assert idx.min() >= 0 and idx.max() < (2 * 7 - 1) ** 2
    # symmetric pairs map to transposed entries
    assert idx[0, 1] != idx[1, 0] or 7 == 1


def test_shift_mask_blocks():
    m = np.asarray(_shift_mask(14, 14, 7, 3))
    assert m.shape == (4, 49, 49)
    # the un-shifted top-left window has no masking
    np.testing.assert_allclose(m[0], 0.0)
    # some window must mask cross-region attention
    assert (m < -1).any()


def test_swin_backbone_shapes(rng):
    model = SwinTransformer(embed_dim=32, depths=(1, 1, 1, 1),
                            num_heads=(1, 2, 4, 8), dtype=jnp.float32)
    x = jnp.asarray(rng.randn(64, 96, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    c3, c4, c5 = model.apply(params, x)
    assert c3.shape == (8, 12, 64)     # stride 8, 2*embed
    assert c4.shape == (4, 6, 128)
    assert c5.shape == (2, 3, 256)


@pytest.mark.slow
def test_detector_with_swin(rng):
    from common import tiny_config
    from embodied_object_detection_tpu.models.detector import (
        EmbodiedDetector, build_detector)
    from embodied_object_detection_tpu.structures import MemoryState

    cfg = tiny_config()
    cfg = cfg.replace(backbone=dataclasses.replace(cfg.backbone, name="swin_b"))
    model, params = build_detector(cfg, jax.random.PRNGKey(0))
    h, w = cfg.input.height, cfg.input.width
    mem = MemoryState.zeros(cfg.memory.max_cells, cfg.memory.memory_dim)
    zs = jnp.asarray(rng.randn(512, cfg.roi.num_classes + 1).astype(np.float32))
    out = model.apply(params,
                      jnp.asarray(rng.randint(0, 255, (h, w, 3)).astype(np.float32)),
                      zs, mem.features, mem.obs_count,
                      jnp.zeros((h, w), jnp.int32), jnp.zeros((h, w), bool),
                      method=EmbodiedDetector.frame_step)
    assert out.detections.boxes.shape == (cfg.roi.detections_per_image, 4)
