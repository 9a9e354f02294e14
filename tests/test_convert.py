"""Weight-converter tests: every flax param must be reachable from the
reference's torch naming, with correct layout transposes."""

import re

import numpy as np
import jax
import pytest

from embodied_object_detection_tpu.convert.torch_weights import (
    convert_state_dict, verify_against_model)

from common import tiny_config


def flax_path_to_torch_name(path: str) -> str:
    """Inverse of the converter's rename table (test-side oracle)."""
    p = path
    m = re.match(r"backbone/conv1/kernel", p)
    if m:
        return "backbone.bottom_up.base.conv1.weight"
    m = re.match(r"backbone/bn1/(\w+)", p)
    if m:
        return f"backbone.bottom_up.base.bn1.{m.group(1)}"
    m = re.match(r"backbone/layer(\d)_(\d+)/conv(\d)/kernel", p)
    if m:
        return f"backbone.bottom_up.base.layer{m.group(1)}.{m.group(2)}.conv{m.group(3)}.weight"
    m = re.match(r"backbone/layer(\d)_(\d+)/bn(\d)/(\w+)", p)
    if m:
        return f"backbone.bottom_up.base.layer{m.group(1)}.{m.group(2)}.bn{m.group(3)}.{m.group(4)}"
    m = re.match(r"backbone/layer(\d)_(\d+)/downsample_conv/kernel", p)
    if m:
        return f"backbone.bottom_up.base.layer{m.group(1)}.{m.group(2)}.downsample.0.weight"
    m = re.match(r"backbone/layer(\d)_(\d+)/downsample_bn/(\w+)", p)
    if m:
        return f"backbone.bottom_up.base.layer{m.group(1)}.{m.group(2)}.downsample.1.{m.group(3)}"
    m = re.match(r"fpn/lateral(\d)/(kernel|bias)", p)
    if m:
        return f"backbone.fpn_lateral{int(m.group(1)) + 2}." + \
            ("weight" if m.group(2) == "kernel" else "bias")
    m = re.match(r"fpn/output(\d)/(kernel|bias)", p)
    if m:
        return f"backbone.fpn_output{int(m.group(1)) + 2}." + \
            ("weight" if m.group(2) == "kernel" else "bias")
    m = re.match(r"fpn/p([67])/(kernel|bias)", p)
    if m:
        return f"backbone.top_block.p{m.group(1)}." + \
            ("weight" if m.group(2) == "kernel" else "bias")
    m = re.match(r"fpn/map_merge_projection(\d)/(kernel|bias)", p)
    if m:
        return f"backbone.map_merge_projection{m.group(1)}." + \
            ("weight" if m.group(2) == "kernel" else "bias")
    m = re.match(r"centernet/bbox_tower_conv(\d)/(kernel|bias)", p)
    if m:
        return f"proposal_generator.centernet_head.bbox_tower.{int(m.group(1)) * 3}." + \
            ("weight" if m.group(2) == "kernel" else "bias")
    m = re.match(r"centernet/bbox_tower_gn(\d)/(scale|bias)", p)
    if m:
        return f"proposal_generator.centernet_head.bbox_tower.{int(m.group(1)) * 3 + 1}." + \
            ("weight" if m.group(2) == "scale" else "bias")
    m = re.match(r"centernet/(agn_hm|bbox_pred)/(kernel|bias)", p)
    if m:
        return f"proposal_generator.centernet_head.{m.group(1)}." + \
            ("weight" if m.group(2) == "kernel" else "bias")
    m = re.match(r"centernet/scale(\d)/scale", p)
    if m:
        return f"proposal_generator.centernet_head.scales.{m.group(1)}.scale"
    m = re.match(r"roi_heads/box_head(\d)/fc(\d)/(kernel|bias)", p)
    if m:
        return f"roi_heads.box_head.{m.group(1)}.fc{m.group(2)}." + \
            ("weight" if m.group(3) == "kernel" else "bias")
    m = re.match(r"roi_heads/box_predictor(\d)/cls_linear/(kernel|bias)", p)
    if m:
        return f"roi_heads.box_predictor.{m.group(1)}.cls_score.linear." + \
            ("weight" if m.group(2) == "kernel" else "bias")
    m = re.match(r"roi_heads/box_predictor(\d)/bbox_fc(\d)/(kernel|bias)", p)
    if m:
        idx = {1: 0, 2: 2}[int(m.group(2))]
        return f"roi_heads.box_predictor.{m.group(1)}.bbox_pred.{idx}." + \
            ("weight" if m.group(3) == "kernel" else "bias")
    m = re.match(r"roi_heads/mask_head/mask_fcn(\d)/(kernel|bias)", p)
    if m:
        return f"roi_heads.mask_head.mask_fcn{m.group(1)}." + \
            ("weight" if m.group(2) == "kernel" else "bias")
    if p == "roi_heads/mask_head/deconv_kernel":
        return "roi_heads.mask_head.deconv.weight"
    if p == "roi_heads/mask_head/deconv_bias":
        return "roi_heads.mask_head.deconv.bias"
    m = re.match(r"roi_heads/mask_head/predictor/(kernel|bias)", p)
    if m:
        return "roi_heads.mask_head.predictor." + \
            ("weight" if m.group(1) == "kernel" else "bias")
    raise KeyError(p)


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, p))
        else:
            out[p] = np.asarray(v)
    return out


def _inverse_transform(path, arr):
    """our layout -> torch layout (for fabricating the torch state dict)."""
    if path.endswith("/kernel") and arr.ndim == 4:
        return np.transpose(arr, (3, 2, 0, 1))     # HWIO -> OIHW
    if re.search(r"box_head\d/fc1/kernel$", path):
        # inverse of _fc_after_pool: (res*res*c, out) -> (out, c*res*res)
        in_dim, out_dim = arr.shape
        c = in_dim // 49
        w = arr.T.reshape(out_dim, 7, 7, c).transpose(0, 3, 1, 2)
        return np.ascontiguousarray(w.reshape(out_dim, in_dim))
    if path.endswith("/kernel") and arr.ndim == 2:
        return np.transpose(arr)
    if path.endswith("deconv_kernel"):
        return np.transpose(arr, (2, 3, 0, 1))     # HWIO -> (in,out,kh,kw)
    return arr


@pytest.mark.slow
def test_converter_round_trip_covers_all_params():
    from embodied_object_detection_tpu.models.detector import build_detector
    cfg = tiny_config()
    model, params = build_detector(cfg, jax.random.PRNGKey(0))
    flat = _flatten(params["params"])

    rng = np.random.RandomState(0)
    torch_sd = {}
    expected = {}
    for path, arr in flat.items():
        val = rng.randn(*arr.shape).astype(np.float32)
        expected[path] = val
        torch_sd[flax_path_to_torch_name(path)] = _inverse_transform(path, val)
    # add a zs_weight buffer + an unrelated key
    torch_sd["roi_heads.box_predictor.0.cls_score.zs_weight"] = \
        rng.randn(cfg.roi.zs_weight_dim, cfg.roi.num_classes + 1).astype(np.float32)
    torch_sd["text_encoder.some.weight"] = np.zeros(3, np.float32)

    converted, zs = convert_state_dict(torch_sd)
    assert zs is not None and zs.shape == (cfg.roi.zs_weight_dim,
                                           cfg.roi.num_classes + 1)
    missing, extra, mismatch = verify_against_model(converted, params)
    assert missing == [], f"missing: {missing[:10]}"
    assert extra == [], f"extra: {extra[:10]}"
    assert mismatch == [], f"mismatch: {mismatch[:10]}"
    assert converted["_unmapped"] == ["text_encoder.some.weight"]
    # values survive the layout round trip
    got = _flatten(converted["params"])
    for path in expected:
        np.testing.assert_allclose(got[path], expected[path])


def test_swin_rule_coverage():
    """Swin rename rules: a representative torch state dict lands on the
    flax Swin param tree paths with correct layouts."""
    rng = np.random.RandomState(0)
    sd = {
        "backbone.bottom_up.patch_embed.proj.weight": rng.randn(32, 3, 4, 4).astype(np.float32),
        "backbone.bottom_up.patch_embed.proj.bias": rng.randn(32).astype(np.float32),
        "backbone.bottom_up.patch_embed.norm.weight": np.ones(32, np.float32),
        "backbone.bottom_up.patch_embed.norm.bias": np.zeros(32, np.float32),
        "backbone.bottom_up.layers.0.blocks.0.norm1.weight": np.ones(32, np.float32),
        "backbone.bottom_up.layers.0.blocks.0.attn.qkv.weight": rng.randn(96, 32).astype(np.float32),
        "backbone.bottom_up.layers.0.blocks.0.attn.relative_position_bias_table":
            rng.randn(169, 4).astype(np.float32),
        "backbone.bottom_up.layers.0.blocks.0.mlp.fc1.weight": rng.randn(128, 32).astype(np.float32),
        "backbone.bottom_up.layers.0.downsample.reduction.weight": rng.randn(64, 128).astype(np.float32),
        "backbone.bottom_up.norm1.weight": np.ones(64, np.float32),
    }
    from embodied_object_detection_tpu.convert.torch_weights import convert_state_dict
    tree, _ = convert_state_dict(sd)
    p = tree["params"]["backbone"]
    assert p["patch_embed"]["kernel"].shape == (4, 4, 3, 32)
    assert p["patch_norm"]["scale"].shape == (32,)
    blk = p["stage0_block0"]
    assert blk["norm1"]["scale"].shape == (32,)
    assert blk["attn"]["qkv"]["kernel"].shape == (32, 96)
    assert blk["attn"]["relative_position_bias_table"].shape == (169, 4)
    assert blk["mlp_fc1"]["kernel"].shape == (32, 128)
    assert p["merge_reduction0"]["kernel"].shape == (128, 64)
    assert p["out_norm1"]["scale"].shape == (64,)
    assert "_unmapped" not in tree
