"""PyTorch checkpoint -> JAX parameter conversion.

Maps the reference's detectron2 state_dict (the four golden checkpoints:
Detic_LCOCOI21k_...max-size.pth, vanilla_training.pth, detic_finetuned.pth,
implicit_object_memory.pth; ref: README.md:44-62 and
tools/convert-thirdparty-pretrained-model-to-d2.py) onto the flax param tree
of models.detector.EmbodiedDetector.

Layout conversions:
  conv     OIHW -> HWIO         (transpose 2,3,1,0)
  linear   (out,in) -> (in,out) (transpose)
  deconv   (in,out,kh,kw) -> (kh,kw,in,out)
  FrozenBN weight/bias/running_mean/running_var copied verbatim
  zs_weight buffers are *not* parameters — returned separately (they are a
  runtime input, enabling reset_cls_test vocabulary swaps;
  ref: detic/modeling/utils.py:32-50)
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import numpy as np


def _conv(w):   # OIHW -> HWIO
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _linear(w):
    return np.ascontiguousarray(np.transpose(w))


def _deconv(w):  # (in, out, kh, kw) -> (kh, kw, in, out)
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))


def _fc_after_pool(w, res=7):
    """First FC after ROI pooling: torch flattens NCHW (c-major) while the
    flax BoxHead flattens NHWC — permute the input dims before transposing.
    (out, C*res*res) -> (res*res*C, out). `res` is the box pooler resolution
    (ROI_BOX_HEAD.POOLER_RESOLUTION=7 in every reference config)."""
    out_dim, in_dim = w.shape
    c = in_dim // (res * res)
    assert c * res * res == in_dim, (w.shape, res)
    w = w.reshape(out_dim, c, res, res).transpose(0, 2, 3, 1)
    return np.ascontiguousarray(w.reshape(out_dim, in_dim).T)


def _set(tree: Dict, path: str, value: np.ndarray):
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


# (regex over torch names) -> (flax path template, transform)
_RULES = [
    # ---- backbone stem (backbone.bottom_up.base.* in detectron2 naming)
    (r"backbone\.bottom_up\.base\.conv1\.weight",
     "backbone/conv1/kernel", _conv),
    (r"backbone\.bottom_up\.base\.bn1\.(weight|bias|running_mean|running_var)",
     "backbone/bn1/{0}", None),
    # ---- residual stages
    (r"backbone\.bottom_up\.base\.layer(\d)\.(\d+)\.conv(\d)\.weight",
     "backbone/layer{0}_{1}/conv{2}/kernel", _conv),
    (r"backbone\.bottom_up\.base\.layer(\d)\.(\d+)\.bn(\d)\.(weight|bias|running_mean|running_var)",
     "backbone/layer{0}_{1}/bn{2}/{3}", None),
    (r"backbone\.bottom_up\.base\.layer(\d)\.(\d+)\.downsample\.0\.weight",
     "backbone/layer{0}_{1}/downsample_conv/kernel", _conv),
    (r"backbone\.bottom_up\.base\.layer(\d)\.(\d+)\.downsample\.1\.(weight|bias|running_mean|running_var)",
     "backbone/layer{0}_{1}/downsample_bn/{2}", None),
    # ---- FPN (detectron2: fpn_lateral{3,4,5} / fpn_output{3,4,5})
    (r"backbone\.fpn_lateral3\.(weight)", "fpn/lateral1/kernel", _conv),
    (r"backbone\.fpn_lateral3\.(bias)", "fpn/lateral1/bias", None),
    (r"backbone\.fpn_lateral4\.(weight)", "fpn/lateral2/kernel", _conv),
    (r"backbone\.fpn_lateral4\.(bias)", "fpn/lateral2/bias", None),
    (r"backbone\.fpn_lateral5\.(weight)", "fpn/lateral3/kernel", _conv),
    (r"backbone\.fpn_lateral5\.(bias)", "fpn/lateral3/bias", None),
    (r"backbone\.fpn_output3\.(weight)", "fpn/output1/kernel", _conv),
    (r"backbone\.fpn_output3\.(bias)", "fpn/output1/bias", None),
    (r"backbone\.fpn_output4\.(weight)", "fpn/output2/kernel", _conv),
    (r"backbone\.fpn_output4\.(bias)", "fpn/output2/bias", None),
    (r"backbone\.fpn_output5\.(weight)", "fpn/output3/kernel", _conv),
    (r"backbone\.fpn_output5\.(bias)", "fpn/output3/bias", None),
    (r"backbone\.top_block\.p6\.weight", "fpn/p6/kernel", _conv),
    (r"backbone\.top_block\.p6\.bias", "fpn/p6/bias", None),
    (r"backbone\.top_block\.p7\.weight", "fpn/p7/kernel", _conv),
    (r"backbone\.top_block\.p7\.bias", "fpn/p7/bias", None),
    # ---- memory merge projections (CustomRecurrentFPN, timm.py:78-88)
    (r"backbone\.map_merge_projection(\d)\.weight",
     "fpn/map_merge_projection{0}/kernel", _conv),
    (r"backbone\.map_merge_projection(\d)\.bias",
     "fpn/map_merge_projection{0}/bias", None),
    # ---- CenterNet head (centernet_head.py): the bbox_tower conv/GN
    # triplets are handled by the dedicated branch in convert_state_dict
    # (indices 0,3,6,9 convs / 1,4,7,10 GNs) — no rule here
    (r"proposal_generator\.centernet_head\.agn_hm\.weight",
     "centernet/agn_hm/kernel", _conv),
    (r"proposal_generator\.centernet_head\.agn_hm\.bias",
     "centernet/agn_hm/bias", None),
    (r"proposal_generator\.centernet_head\.bbox_pred\.weight",
     "centernet/bbox_pred/kernel", _conv),
    (r"proposal_generator\.centernet_head\.bbox_pred\.bias",
     "centernet/bbox_pred/bias", None),
    (r"proposal_generator\.centernet_head\.scales\.(\d)\.scale",
     "centernet/scale{0}/scale", None),
    # ---- cascade box heads (box_head.0.fc1 / fc2); fc1 consumes the pooled
    # 7x7x256 map, whose flatten order differs between torch (NCHW) and the
    # flax BoxHead (NHWC)
    (r"roi_heads\.box_head\.(\d)\.fc1\.weight",
     "roi_heads/box_head{0}/fc1/kernel", _fc_after_pool),
    (r"roi_heads\.box_head\.(\d)\.fc1\.bias",
     "roi_heads/box_head{0}/fc1/bias", None),
    (r"roi_heads\.box_head\.(\d)\.fc2\.weight",
     "roi_heads/box_head{0}/fc2/kernel", _linear),
    (r"roi_heads\.box_head\.(\d)\.fc2\.bias",
     "roi_heads/box_head{0}/fc2/bias", None),
    # ---- predictors: zero-shot classifier linear + bbox MLP
    (r"roi_heads\.box_predictor\.(\d)\.cls_score\.linear\.weight",
     "roi_heads/box_predictor{0}/cls_linear/kernel", _linear),
    (r"roi_heads\.box_predictor\.(\d)\.cls_score\.linear\.bias",
     "roi_heads/box_predictor{0}/cls_linear/bias", None),
    (r"roi_heads\.box_predictor\.(\d)\.bbox_pred\.0\.weight",
     "roi_heads/box_predictor{0}/bbox_fc1/kernel", _linear),
    (r"roi_heads\.box_predictor\.(\d)\.bbox_pred\.0\.bias",
     "roi_heads/box_predictor{0}/bbox_fc1/bias", None),
    (r"roi_heads\.box_predictor\.(\d)\.bbox_pred\.2\.weight",
     "roi_heads/box_predictor{0}/bbox_fc2/kernel", _linear),
    (r"roi_heads\.box_predictor\.(\d)\.bbox_pred\.2\.bias",
     "roi_heads/box_predictor{0}/bbox_fc2/bias", None),
    # ---- Swin backbone (ref: detic/modeling/backbone/swintransformer.py
    # naming under backbone.bottom_up.*)
    (r"backbone\.bottom_up\.patch_embed\.proj\.weight",
     "backbone/patch_embed/kernel", _conv),
    (r"backbone\.bottom_up\.patch_embed\.proj\.bias",
     "backbone/patch_embed/bias", None),
    (r"backbone\.bottom_up\.patch_embed\.norm\.weight",
     "backbone/patch_norm/scale", None),
    (r"backbone\.bottom_up\.patch_embed\.norm\.bias",
     "backbone/patch_norm/bias", None),
    (r"backbone\.bottom_up\.layers\.(\d)\.blocks\.(\d+)\.norm(\d)\.weight",
     "backbone/stage{0}_block{1}/norm{2}/scale", None),
    (r"backbone\.bottom_up\.layers\.(\d)\.blocks\.(\d+)\.norm(\d)\.bias",
     "backbone/stage{0}_block{1}/norm{2}/bias", None),
    (r"backbone\.bottom_up\.layers\.(\d)\.blocks\.(\d+)\.attn\.qkv\.weight",
     "backbone/stage{0}_block{1}/attn/qkv/kernel", _linear),
    (r"backbone\.bottom_up\.layers\.(\d)\.blocks\.(\d+)\.attn\.qkv\.bias",
     "backbone/stage{0}_block{1}/attn/qkv/bias", None),
    (r"backbone\.bottom_up\.layers\.(\d)\.blocks\.(\d+)\.attn\.proj\.weight",
     "backbone/stage{0}_block{1}/attn/proj/kernel", _linear),
    (r"backbone\.bottom_up\.layers\.(\d)\.blocks\.(\d+)\.attn\.proj\.bias",
     "backbone/stage{0}_block{1}/attn/proj/bias", None),
    (r"backbone\.bottom_up\.layers\.(\d)\.blocks\.(\d+)\.attn\.relative_position_bias_table",
     "backbone/stage{0}_block{1}/attn/relative_position_bias_table", None),
    (r"backbone\.bottom_up\.layers\.(\d)\.blocks\.(\d+)\.mlp\.fc(\d)\.weight",
     "backbone/stage{0}_block{1}/mlp_fc{2}/kernel", _linear),
    (r"backbone\.bottom_up\.layers\.(\d)\.blocks\.(\d+)\.mlp\.fc(\d)\.bias",
     "backbone/stage{0}_block{1}/mlp_fc{2}/bias", None),
    (r"backbone\.bottom_up\.layers\.(\d)\.downsample\.norm\.weight",
     "backbone/merge_norm{0}/scale", None),
    (r"backbone\.bottom_up\.layers\.(\d)\.downsample\.norm\.bias",
     "backbone/merge_norm{0}/bias", None),
    (r"backbone\.bottom_up\.layers\.(\d)\.downsample\.reduction\.weight",
     "backbone/merge_reduction{0}/kernel", _linear),
    (r"backbone\.bottom_up\.norm(\d)\.weight",
     "backbone/out_norm{0}/scale", None),
    (r"backbone\.bottom_up\.norm(\d)\.bias",
     "backbone/out_norm{0}/bias", None),
    # ---- mask head
    (r"roi_heads\.mask_head\.mask_fcn(\d)\.weight",
     "roi_heads/mask_head/mask_fcn{0}/kernel", _conv),
    (r"roi_heads\.mask_head\.mask_fcn(\d)\.bias",
     "roi_heads/mask_head/mask_fcn{0}/bias", None),
    (r"roi_heads\.mask_head\.deconv\.weight",
     "roi_heads/mask_head/deconv_kernel", _deconv),
    (r"roi_heads\.mask_head\.deconv\.bias",
     "roi_heads/mask_head/deconv_bias", None),
    (r"roi_heads\.mask_head\.predictor\.weight",
     "roi_heads/mask_head/predictor/kernel", _conv),
    (r"roi_heads\.mask_head\.predictor\.bias",
     "roi_heads/mask_head/predictor/bias", None),
]


def convert_state_dict(state_dict: Dict[str, np.ndarray]
                       ) -> Tuple[Dict[str, Any], Optional[np.ndarray]]:
    """torch state_dict (numpy values) -> ({'params': tree}, zs_weight or None).

    Unrecognized keys are collected under the returned tree's '_unmapped'
    entry for inspection (momentum buffers, text-encoder weights, etc.)."""
    tree: Dict[str, Any] = {}
    unmapped = []
    zs_weight = None

    for name, value in state_dict.items():
        value = np.asarray(value)
        if re.match(r"roi_heads\.box_predictor\.\d\.cls_score\.zs_weight", name):
            zs_weight = value  # D x (C+1), already normalized w/ bg column
            continue
        # CenterNet tower: indices 0/3/6/9 are convs, 1/4/7/10 are GroupNorms
        m = re.match(
            r"proposal_generator\.centernet_head\.bbox_tower\.(\d+)\.(weight|bias)",
            name)
        if m:
            idx, leaf = int(m.group(1)), m.group(2)
            layer, role = divmod(idx, 3)
            if role == 0:
                path = f"centernet/bbox_tower_conv{layer}/" + \
                    ("kernel" if leaf == "weight" else "bias")
                _set(tree, path, _conv(value) if leaf == "weight" else value)
            else:
                path = f"centernet/bbox_tower_gn{layer}/" + \
                    ("scale" if leaf == "weight" else "bias")
                _set(tree, path, value)
            continue
        for pattern, template, transform in _RULES:
            m = re.match(pattern + r"$", name)
            if m and template:
                path = template.format(*m.groups())
                _set(tree, path, transform(value) if transform else value)
                break
        else:
            unmapped.append(name)

    out = {"params": tree}
    if unmapped:
        out["_unmapped"] = unmapped
    return out, zs_weight


def load_torch_checkpoint(path: str):
    """Load a .pth checkpoint (host-side, torch cpu) and convert."""
    import torch
    data = torch.load(path, map_location="cpu", weights_only=False)
    sd = data.get("model", data.get("state_dict", data))
    def _to_np(v):
        if hasattr(v, "numpy"):
            # torch bf16 tensors reject .numpy(); upcast first
            if "bfloat16" in str(getattr(v, "dtype", "")):
                return v.float().numpy()
            return v.numpy()
        return np.asarray(v)

    sd_np = {k: _to_np(v)
             for k, v in sd.items()}
    return convert_state_dict(sd_np)


def verify_against_model(converted: Dict[str, Any], params: Dict[str, Any]
                         ) -> Tuple[list, list, list]:
    """Compare a converted tree against a model's init params.

    Returns (missing_in_ckpt, extra_in_ckpt, shape_mismatches)."""
    import jax

    def flatten(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            if k == "_unmapped":
                continue
            p = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                out.update(flatten(v, p))
            else:
                out[p] = np.asarray(v)
        return out

    got = flatten(converted.get("params", {}))
    want = flatten(params.get("params", params))
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    mismatch = [(k, got[k].shape, want[k].shape)
                for k in set(got) & set(want)
                if got[k].shape != tuple(want[k].shape)]
    return missing, extra, mismatch
