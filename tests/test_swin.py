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


# ---------------------------------------------------------------------------
# torch oracle: full swin block (+shifted variant) through the converter
# (ref: detic/modeling/backbone/swintransformer.py SwinTransformerBlock /
#  WindowAttention :88-256)
# ---------------------------------------------------------------------------

def _torch_swin_block(x_hwc, sd_prefix_params, dim, heads, ws, shift,
                      rel_index):
    """Independent torch re-derivation of one swin block forward."""
    import torch
    import torch.nn.functional as tF

    p = sd_prefix_params
    x = torch.tensor(x_hwc)
    h, w, c = x.shape

    def ln(t, wgt, b):
        return tF.layer_norm(t, (c,), torch.tensor(wgt), torch.tensor(b))

    shortcut = x
    y = ln(x, p["norm1.weight"], p["norm1.bias"])
    if shift > 0:
        y = torch.roll(y, (-shift, -shift), dims=(0, 1))
    # partition
    yw = y.reshape(h // ws, ws, w // ws, ws, c).permute(0, 2, 1, 3, 4)
    yw = yw.reshape(-1, ws * ws, c)                       # [nW, N, C]
    nw, n, _ = yw.shape
    qkv = yw @ torch.tensor(p["attn.qkv.weight"]).T + \
        torch.tensor(p["attn.qkv.bias"])
    qkv = qkv.reshape(nw, n, 3, heads, c // heads).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = (q * (c // heads) ** -0.5) @ k.transpose(-2, -1)
    table = torch.tensor(p["attn.relative_position_bias_table"])
    bias = table[rel_index.reshape(-1)].reshape(n, n, heads).permute(2, 0, 1)
    attn = attn + bias[None]
    if shift > 0:
        import numpy as _np
        img = _np.zeros((h, w), _np.int32)
        cnt = 0
        for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            for wsl in (slice(0, -ws), slice(-ws, -shift),
                        slice(-shift, None)):
                img[hs, wsl] = cnt
                cnt += 1
        imgw = torch.tensor(img).reshape(h // ws, ws, w // ws, ws) \
            .permute(0, 2, 1, 3).reshape(-1, ws * ws)
        mask = (imgw[:, None, :] - imgw[:, :, None]) != 0
        attn = attn + torch.where(mask, torch.tensor(-100.0),
                                  torch.tensor(0.0))[:, None]
    attn = attn.softmax(dim=-1)
    out = (attn @ v).permute(0, 2, 1, 3).reshape(nw, n, c)
    out = out @ torch.tensor(p["attn.proj.weight"]).T + \
        torch.tensor(p["attn.proj.bias"])
    y = out.reshape(h // ws, w // ws, ws, ws, c).permute(0, 2, 1, 3, 4) \
        .reshape(h, w, c)
    if shift > 0:
        y = torch.roll(y, (shift, shift), dims=(0, 1))
    x = shortcut + y
    z = ln(x, p["norm2.weight"], p["norm2.bias"])
    z = z @ torch.tensor(p["mlp.fc1.weight"]).T + \
        torch.tensor(p["mlp.fc1.bias"])
    z = tF.gelu(z)
    z = z @ torch.tensor(p["mlp.fc2.weight"]).T + \
        torch.tensor(p["mlp.fc2.bias"])
    return (x + z).numpy()


@pytest.mark.parametrize("shift", [0, 2])
def test_swin_block_vs_torch_oracle(rng, shift):
    torch = pytest.importorskip("torch")
    from embodied_object_detection_tpu.convert.torch_weights import (
        convert_state_dict)
    from embodied_object_detection_tpu.models.swin import (
        SwinBlock, relative_position_index)

    dim, heads, ws = 32, 4, 4
    h, w = 8, 12
    raw = {
        "norm1.weight": rng.rand(dim).astype(np.float32) + 0.5,
        "norm1.bias": rng.randn(dim).astype(np.float32) * 0.1,
        "attn.qkv.weight": rng.randn(3 * dim, dim).astype(np.float32) * 0.1,
        "attn.qkv.bias": rng.randn(3 * dim).astype(np.float32) * 0.1,
        "attn.proj.weight": rng.randn(dim, dim).astype(np.float32) * 0.1,
        "attn.proj.bias": rng.randn(dim).astype(np.float32) * 0.1,
        "attn.relative_position_bias_table":
            rng.randn((2 * ws - 1) ** 2, heads).astype(np.float32) * 0.1,
        "norm2.weight": rng.rand(dim).astype(np.float32) + 0.5,
        "norm2.bias": rng.randn(dim).astype(np.float32) * 0.1,
        "mlp.fc1.weight": rng.randn(4 * dim, dim).astype(np.float32) * 0.1,
        "mlp.fc1.bias": rng.randn(4 * dim).astype(np.float32) * 0.1,
        "mlp.fc2.weight": rng.randn(dim, 4 * dim).astype(np.float32) * 0.1,
        "mlp.fc2.bias": rng.randn(dim).astype(np.float32) * 0.1,
    }
    x = rng.randn(h, w, dim).astype(np.float32)
    want = _torch_swin_block(x, raw, dim, heads, ws, shift,
                             relative_position_index(ws))

    sd = {f"backbone.bottom_up.layers.0.blocks.0.{k}": v
          for k, v in raw.items()}
    tree, _ = convert_state_dict(sd)
    params = {"params": tree["params"]["backbone"]["stage0_block0"]}
    blk = SwinBlock(dim=dim, num_heads=heads, window_size=ws, shift=shift,
                    dtype=jnp.float32)
    got = np.asarray(blk.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_swin_drop_path_train_only(rng):
    """Stochastic depth (ref: swintransformer.py:254-255, SwinB rate 0.2):
    train=False is bit-identical to a drop_path_rate=0 model (no inference
    regression), train=True perturbs outputs stochastically, and the keep
    branch preserves the expectation via the 1/keep scale."""
    x = jnp.asarray(rng.randn(64, 96, 3).astype(np.float32))
    kw = dict(embed_dim=32, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8),
              dtype=jnp.float32)
    m0 = SwinTransformer(drop_path_rate=0.0, **kw)
    m5 = SwinTransformer(drop_path_rate=0.5, **kw)
    params = m0.init(jax.random.PRNGKey(0), x)

    # eval: identical regardless of the rate (shared converter weights)
    a = m0.apply(params, x)
    b = m5.apply(params, x)
    for ai, bi in zip(a, b):
        np.testing.assert_array_equal(np.asarray(ai), np.asarray(bi))

    # train with rate 0.5: differs from eval for some rng, and two rngs
    # differ from each other (blocks actually drop)
    t1 = m5.apply(params, x, train=True,
                  rngs={"drop_path": jax.random.PRNGKey(1)})
    t2 = m5.apply(params, x, train=True,
                  rngs={"drop_path": jax.random.PRNGKey(2)})
    d_eval = max(float(jnp.max(jnp.abs(u - v))) for u, v in zip(t1, a))
    d_rng = max(float(jnp.max(jnp.abs(u - v))) for u, v in zip(t1, t2))
    assert d_eval > 0 and d_rng > 0

    # rate 0 in train mode == eval exactly (no rng even consumed)
    t0 = m0.apply(params, x, train=True)
    for ai, ti in zip(a, t0):
        np.testing.assert_array_equal(np.asarray(ai), np.asarray(ti))


def test_swin_drop_path_linear_decay():
    """Per-block rates follow the torch linspace decay rule
    (swintransformer.py:520): 0 at the first block, rate at the last."""
    m = SwinTransformer(embed_dim=32, depths=(2, 2, 2, 2),
                        num_heads=(1, 2, 4, 8), drop_path_rate=0.35,
                        dtype=jnp.float32)
    total = sum(m.depths)
    want = np.linspace(0, 0.35, total)
    got = [0.35 * i / (total - 1) for i in range(total)]
    np.testing.assert_allclose(got, want, atol=1e-9)


@pytest.mark.slow
def test_swin_frame_train_applies_drop_path(rng):
    """The standard train path reaches swin stochastic depth: frame_train
    with a swin backbone consumes the 'drop_path' rng, two rngs give
    different losses, and rate 0 is deterministic."""
    from embodied_object_detection_tpu.config import DetectorConfig
    from embodied_object_detection_tpu.models.detector import EmbodiedDetector
    from embodied_object_detection_tpu.structures import GroundTruth

    cfg = DetectorConfig()
    cfg = cfg.replace(
        compute_dtype="float32",
        backbone=dataclasses.replace(cfg.backbone, name="swin_b",
                                     drop_path_rate=0.8),
        input=dataclasses.replace(cfg.input, height=64, width=96,
                                  max_gt_boxes=4),
        centernet=dataclasses.replace(cfg.centernet, pre_nms_topk_train=32,
                                      post_nms_topk_train=8),
        roi=dataclasses.replace(cfg.roi, detections_per_image=8,
                                num_classes=5),
        memory=dataclasses.replace(cfg.memory, max_cells=32, write_topk=4,
                                   memory_type="image_only"),
    )
    h, w = 64, 96
    model = EmbodiedDetector(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        np.zeros((h, w, 3), np.float32),
        np.zeros((cfg.roi.zs_weight_dim, cfg.roi.num_classes + 1),
                 np.float32),
        np.zeros((cfg.memory.max_cells, cfg.memory.memory_dim), np.float32),
        np.zeros((cfg.memory.max_cells,), np.float32),
        np.zeros((h, w), np.int32),
        np.zeros((h, w), bool),
        method=EmbodiedDetector.frame_step)
    img = jnp.asarray(rng.randint(0, 255, (h, w, 3)).astype(np.float32))
    zs = jnp.asarray(rng.randn(cfg.roi.zs_weight_dim,
                               cfg.roi.num_classes + 1).astype(np.float32))
    memf = jnp.zeros((cfg.memory.max_cells, cfg.memory.memory_dim),
                     jnp.float32)
    memo = jnp.zeros((cfg.memory.max_cells,), jnp.float32)
    proj = jnp.asarray(rng.randint(0, cfg.memory.max_cells, (h, w))
                       .astype(np.int32))
    gt = GroundTruth(boxes=jnp.asarray([[8.0, 8.0, 40.0, 40.0]]),
                     classes=jnp.asarray([1], jnp.int32),
                     valid=jnp.ones(1, bool))

    def loss(rng_key, model_cfg):
        m = EmbodiedDetector(model_cfg)
        out = m.apply(params, img, zs, memf, memo, proj, gt,
                      jax.random.PRNGKey(1),
                      method=EmbodiedDetector.frame_train,
                      rngs={"drop_path": rng_key})
        return float(sum(v for v in out.values()))

    l1 = loss(jax.random.PRNGKey(10), cfg)
    l2 = loss(jax.random.PRNGKey(20), cfg)
    assert l1 != l2, "drop_path rng had no effect"
    cfg0 = cfg.replace(backbone=dataclasses.replace(cfg.backbone,
                                                    drop_path_rate=0.0))
    l0a = loss(jax.random.PRNGKey(10), cfg0)
    l0b = loss(jax.random.PRNGKey(20), cfg0)
    assert l0a == l0b
