"""CLIP text encoder: architecture shape test + converter coverage
(weights themselves are external assets, same as the reference)."""

import numpy as np
import jax
import pytest

from embodied_object_detection_tpu.models.text_encoder import (
    _make_model, convert_clip_text_weights, CONTEXT_LENGTH, VOCAB_SIZE)


def _fake_clip_sd(width=64, layers=2, heads=8):
    rng = np.random.RandomState(0)
    sd = {
        "token_embedding.weight": rng.randn(VOCAB_SIZE, width).astype(np.float32) * 0.01,
        "positional_embedding": rng.randn(CONTEXT_LENGTH, width).astype(np.float32) * 0.01,
        "text_projection": rng.randn(width, width).astype(np.float32) * 0.01,
        "ln_final.weight": np.ones(width, np.float32),
        "ln_final.bias": np.zeros(width, np.float32),
    }
    for i in range(layers):
        pre = f"transformer.resblocks.{i}"
        sd[f"{pre}.ln_1.weight"] = np.ones(width, np.float32)
        sd[f"{pre}.ln_1.bias"] = np.zeros(width, np.float32)
        sd[f"{pre}.ln_2.weight"] = np.ones(width, np.float32)
        sd[f"{pre}.ln_2.bias"] = np.zeros(width, np.float32)
        sd[f"{pre}.attn.in_proj_weight"] = rng.randn(3 * width, width).astype(np.float32) * 0.01
        sd[f"{pre}.attn.in_proj_bias"] = np.zeros(3 * width, np.float32)
        sd[f"{pre}.attn.out_proj.weight"] = rng.randn(width, width).astype(np.float32) * 0.01
        sd[f"{pre}.attn.out_proj.bias"] = np.zeros(width, np.float32)
        sd[f"{pre}.mlp.c_fc.weight"] = rng.randn(4 * width, width).astype(np.float32) * 0.01
        sd[f"{pre}.mlp.c_fc.bias"] = np.zeros(4 * width, np.float32)
        sd[f"{pre}.mlp.c_proj.weight"] = rng.randn(width, 4 * width).astype(np.float32) * 0.01
        sd[f"{pre}.mlp.c_proj.bias"] = np.zeros(width, np.float32)
    return sd


def test_converted_weights_run_through_model():
    width, layers = 64, 2
    sd = _fake_clip_sd(width, layers)
    params = convert_clip_text_weights(sd)
    model = _make_model(width=width, layers=layers, heads=8)
    tokens = np.zeros((2, CONTEXT_LENGTH), np.int32)
    tokens[:, 0] = 49406          # sot
    tokens[0, 1] = 320
    tokens[0, 2] = 49407          # eot
    tokens[1, 1] = 49407
    out = model.apply(params, tokens)
    assert out.shape == (2, width)
    norms = np.linalg.norm(np.asarray(out), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # different token sequences give different embeddings
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))
