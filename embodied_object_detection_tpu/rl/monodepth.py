"""Monocular depth estimation net for the SLAM agents.

ref: habitat_baselines/slambased/monodepth.py (679 LoC) — the "Revisiting
Single Image Depth Estimation" (Hu et al. 2018) network the reference's
ORB-SLAM agents use when no depth sensor exists: a ResNet-50 encoder's four
block outputs feed (a) a decoder of four UpProjection modules (bilinear
upsample + two conv branches summed) and (b) an MFF block fusing all four
scales at 16 channels each, concatenated and refined to a 1-channel depth
map (model/D/MFF/R, monodepth.py:263-499).

The reference ships this as a pretrained torch asset (`model_resnet`
checkpoint, absent in-env); here the ARCHITECTURE is ported (flax, NHWC,
eval-mode BN as FrozenBN) with a state_dict converter so real weights are
drop-in, and the SLAM stack keeps using depth sensors by default
(rl/slam.py). Oracle-tested against an independent torch re-derivation
in tests/test_monodepth.py.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..models.resnet import Bottleneck, FrozenBN

__all__ = ["MonoDepthNet", "MonoDepthEstimator", "convert_monodepth_torch"]


def _bilinear_resize(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """F.upsample(mode='bilinear', align_corners=False) analog —
    jax.image 'linear' uses the same half-pixel-center convention."""
    return jax.image.resize(x, (size[0], size[1], x.shape[-1]),
                            method="linear")


class UpProjection(nn.Module):
    """ref: _UpProjection (monodepth.py:288-330): bilinear upsample ->
    [5x5 conv + BN + relu -> 3x3 conv + BN] + [5x5 conv + BN] -> relu(sum)."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, size: Tuple[int, int]) -> jax.Array:
        x = _bilinear_resize(x, size)
        b1 = nn.Conv(self.features, (5, 5), padding=2, use_bias=False,
                     dtype=self.dtype, name="conv1")(x)
        b1 = FrozenBN(self.features, name="bn1")(b1)
        b1 = nn.relu(b1)
        b1 = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                     dtype=self.dtype, name="conv1_2")(b1)
        b1 = FrozenBN(self.features, name="bn1_2")(b1)
        b2 = nn.Conv(self.features, (5, 5), padding=2, use_bias=False,
                     dtype=self.dtype, name="conv2")(x)
        b2 = FrozenBN(self.features, name="bn2")(b2)
        return nn.relu(b1 + b2)


class MonoDepthNet(nn.Module):
    """Full encoder-decoder depth net (monodepth.py `model`, R50 encoder).

    Input [H, W, 3] (normalized RGB); output [H/2, W/2] depth (the
    reference predicts at half resolution and resizes outside)."""
    depths: Sequence[int] = (3, 4, 6, 3)
    num_features: int = 2048
    block_channel: Sequence[int] = (256, 512, 1024, 2048)
    dtype: Any = jnp.float32

    def setup(self):
        self.conv1 = nn.Conv(64, (7, 7), strides=(2, 2), padding=3,
                             use_bias=False, dtype=self.dtype, name="conv1")
        self.bn1 = FrozenBN(64, name="bn1")
        planes = (64, 128, 256, 512)
        blocks = []
        for stage, (depth, p) in enumerate(zip(self.depths, planes)):
            stride = 1 if stage == 0 else 2
            blocks.append(tuple(
                Bottleneck(p, stride=stride if i == 0 else 1,
                           downsample=(i == 0), dtype=self.dtype,
                           name=f"layer{stage + 1}_{i}")
                for i in range(depth)))
        self.blocks = tuple(blocks)

        nf = self.num_features
        self.d_conv = nn.Conv(nf // 2, (1, 1), use_bias=False,
                              dtype=self.dtype, name="d_conv")
        self.d_bn = FrozenBN(nf // 2, name="d_bn")
        self.d_ups = tuple(
            UpProjection(nf // (4 << i), dtype=self.dtype, name=f"d_up{i + 1}")
            for i in range(4))
        self.mff_ups = tuple(
            UpProjection(16, dtype=self.dtype, name=f"mff_up{i + 1}")
            for i in range(4))
        self.mff_conv = nn.Conv(64, (5, 5), padding=2, use_bias=False,
                                dtype=self.dtype, name="mff_conv")
        self.mff_bn = FrozenBN(64, name="mff_bn")
        rf = 64 + self.block_channel[3] // 32
        self.r_conv0 = nn.Conv(rf, (5, 5), padding=2, use_bias=False,
                               dtype=self.dtype, name="r_conv0")
        self.r_bn0 = FrozenBN(rf, name="r_bn0")
        self.r_conv1 = nn.Conv(rf, (5, 5), padding=2, use_bias=False,
                               dtype=self.dtype, name="r_conv1")
        self.r_bn1 = FrozenBN(rf, name="r_bn1")
        self.r_conv2 = nn.Conv(1, (5, 5), padding=2, use_bias=True,
                               dtype=self.dtype, name="r_conv2")

    def __call__(self, x: jax.Array) -> jax.Array:
        # encoder (E_resnet, monodepth.py:333-357)
        x = self.conv1(x)
        x = self.bn1(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats = []
        for stage_blocks in self.blocks:
            for b in stage_blocks:
                x = b(x)
            feats.append(x)
        b1, b2, b3, b4 = feats

        # decoder D (monodepth.py:360-404)
        d = nn.relu(self.d_bn(self.d_conv(b4)))
        d = self.d_ups[0](d, (b3.shape[0], b3.shape[1]))
        d = self.d_ups[1](d, (b2.shape[0], b2.shape[1]))
        d = self.d_ups[2](d, (b1.shape[0], b1.shape[1]))
        d = self.d_ups[3](d, (b1.shape[0] * 2, b1.shape[1] * 2))

        # MFF (monodepth.py:407-447)
        size = (d.shape[0], d.shape[1])
        m = jnp.concatenate([up(b, size)
                             for up, b in zip(self.mff_ups,
                                              (b1, b2, b3, b4))], axis=-1)
        m = nn.relu(self.mff_bn(self.mff_conv(m)))

        # refinement R (monodepth.py:450-499)
        y = jnp.concatenate([d, m], axis=-1)
        y = nn.relu(self.r_bn0(self.r_conv0(y)))
        y = nn.relu(self.r_bn1(self.r_conv1(y)))
        return self.r_conv2(y)[..., 0]


# -------------------------------------------------------------- converter

def convert_monodepth_torch(state_dict) -> dict:
    """monodepth checkpoint state_dict -> flax param tree.

    ref: MonoDepthEstimator loads {'model': state_dict} with `module.`
    prefixes (monodepth.py:636-662). Names: E.<resnet>, D.conv/bn/up{1-4},
    MFF.up{1-4}/conv/bn, R.conv0/bn0/conv1/bn1/conv2."""
    import re

    def conv_t(w):
        return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))

    tree: dict = {}

    def put(path, v):
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v

    def map_up(src, dst, name, value):
        m = re.match(rf"{src}\.(conv1|conv1_2|conv2|bn1|bn1_2|bn2)\.(.*)",
                     name)
        if not m:
            return False
        sub, l = m.groups()
        if sub.startswith("conv"):
            put(f"{dst}/{sub}/kernel", conv_t(value))
        else:
            put(f"{dst}/{sub}/{l}", value)
        return True

    for name, value in state_dict.items():
        name = name.replace("module.", "")
        value = np.asarray(value)
        if "num_batches" in name:
            continue
        # encoder
        if name == "E.conv1.weight":
            put("conv1/kernel", conv_t(value))
            continue
        m = re.match(r"E\.bn1\.(.*)", name)
        if m:
            put(f"bn1/{m.group(1)}", value)
            continue
        m = re.match(r"E\.layer(\d)\.(\d+)\.conv(\d)\.weight", name)
        if m:
            put(f"layer{m.group(1)}_{m.group(2)}/conv{m.group(3)}/kernel",
                conv_t(value))
            continue
        m = re.match(r"E\.layer(\d)\.(\d+)\.bn(\d)\.(.*)", name)
        if m:
            put(f"layer{m.group(1)}_{m.group(2)}/bn{m.group(3)}/{m.group(4)}",
                value)
            continue
        m = re.match(r"E\.layer(\d)\.(\d+)\.downsample\.0\.weight", name)
        if m:
            put(f"layer{m.group(1)}_{m.group(2)}/downsample_conv/kernel",
                conv_t(value))
            continue
        m = re.match(r"E\.layer(\d)\.(\d+)\.downsample\.1\.(.*)", name)
        if m:
            put(f"layer{m.group(1)}_{m.group(2)}/downsample_bn/{m.group(3)}",
                value)
            continue
        # decoder D
        if name == "D.conv.weight":
            put("d_conv/kernel", conv_t(value))
            continue
        m = re.match(r"D\.bn\.(.*)", name)
        if m:
            put(f"d_bn/{m.group(1)}", value)
            continue
        handled = False
        for i in range(1, 5):
            if map_up(rf"D\.up{i}", f"d_up{i}", name, value):
                handled = True
                break
            if map_up(rf"MFF\.up{i}", f"mff_up{i}", name, value):
                handled = True
                break
        if handled:
            continue
        if name == "MFF.conv.weight":
            put("mff_conv/kernel", conv_t(value))
            continue
        m = re.match(r"MFF\.bn\.(.*)", name)
        if m:
            put(f"mff_bn/{m.group(1)}", value)
            continue
        m = re.match(r"R\.conv(\d)\.weight", name)
        if m:
            put(f"r_conv{m.group(1)}/kernel", conv_t(value))
            continue
        m = re.match(r"R\.conv2\.bias", name)
        if m:
            put("r_conv2/bias", value)
            continue
        m = re.match(r"R\.bn(\d)\.(.*)", name)
        if m:
            put(f"r_bn{m.group(1)}/{m.group(2)}", value)
            continue
    return {"params": tree}


class MonoDepthEstimator:
    """Preprocess + predict + resize (MonoDepthEstimator,
    monodepth.py:636-678): ImageNet-normalize the RGB frame, run the net,
    bilinear-resize the half-res prediction back to the input size."""

    MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
    STD = np.asarray([0.229, 0.224, 0.225], np.float32)

    def __init__(self, params=None, depths=(3, 4, 6, 3)):
        self.net = MonoDepthNet(depths=depths)
        self.params = params
        self._jitted = jax.jit(self.net.apply)

    def init(self, rng, height=228, width=304):
        self.params = self.net.init(
            rng, jnp.zeros((height, width, 3), jnp.float32))
        return self.params

    def compute_depth(self, rgb_uint8: np.ndarray) -> np.ndarray:
        assert self.params is not None, "init() or load converted weights"
        x = rgb_uint8.astype(np.float32) / 255.0
        x = (x - self.MEAN) / self.STD
        pred = self._jitted(self.params, jnp.asarray(x))
        out = jax.image.resize(pred, rgb_uint8.shape[:2], method="linear")
        return np.asarray(out)
