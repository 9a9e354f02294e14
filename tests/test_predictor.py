"""Predictor layer: persistent memory, vocabulary swap, async dispatch."""

import dataclasses

import numpy as np
import jax
import pytest

from common import tiny_config


@pytest.fixture(scope="module")
def pred():
    from embodied_object_detection_tpu.demo.predictor import EmbodiedPredictor
    cfg = tiny_config()
    zs = np.random.RandomState(0).randn(
        cfg.roi.zs_weight_dim, cfg.roi.num_classes + 1).astype(np.float32)
    return EmbodiedPredictor(cfg, zs_weight=zs)


@pytest.mark.slow
def test_memory_persists_and_resets(pred, rng):
    cfg = pred.cfg
    h, w = cfg.input.height, cfg.input.width
    img = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
    proj = rng.randint(0, cfg.memory.max_cells, (h, w)).astype(np.int32)
    pred.reset_memory()
    pred(img, proj)
    obs1 = np.asarray(pred.memory.obs_count).sum()
    pred(img, proj)
    obs2 = np.asarray(pred.memory.obs_count).sum()
    assert obs2 >= obs1
    pred.reset_memory()
    assert np.asarray(pred.memory.obs_count).sum() == 0


@pytest.mark.slow
def test_vocabulary_swap_and_map_render(pred, rng):
    from embodied_object_detection_tpu.demo.predictor import build_zs_weight
    emb = rng.randn(pred.cfg.roi.num_classes, 512).astype(np.float32)
    pred.set_vocabulary(build_zs_weight(emb), class_names=[f"c{i}" for i in
                                                           range(pred.cfg.roi.num_classes)])
    m = pred.render_map(8, 8, scale=2)
    assert m.shape == (16, 16, 3)


def test_build_zs_weight_normalized(rng):
    from embodied_object_detection_tpu.demo.predictor import build_zs_weight
    w = build_zs_weight(rng.randn(5, 16).astype(np.float32))
    assert w.shape == (16, 6)
    norms = np.linalg.norm(w, axis=0)
    np.testing.assert_allclose(norms[:5], 1.0, rtol=1e-5)
    assert norms[5] == 0.0                       # bg column zero


@pytest.mark.slow
def test_async_predictor_order(rng):
    from embodied_object_detection_tpu.demo.predictor import AsyncPredictor
    cfg = tiny_config()
    cfg = cfg.replace(memory=dataclasses.replace(cfg.memory, memory_type="",
                                                 write_memory=False))
    ap = AsyncPredictor(cfg, devices=jax.devices()[:2])
    h, w = cfg.input.height, cfg.input.width
    images = [rng.randint(0, 255, (h, w, 3)).astype(np.uint8) for _ in range(4)]
    for im in images:
        ap.put(im)
    dets = [ap.get() for _ in images]
    assert len(dets) == 4
    # identical inputs give identical outputs regardless of worker device
    for im in (images[0], images[0]):
        ap.put(im)
    d1, d2 = ap.get(), ap.get()
    np.testing.assert_allclose(np.asarray(d1.scores), np.asarray(d2.scores),
                               atol=1e-5)
    ap.shutdown()
