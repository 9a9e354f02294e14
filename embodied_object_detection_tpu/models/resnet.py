"""ResNet-50 backbone (timm `resnet50_in21k` layout) in flax/linen, NHWC.

ref: Detic/detic/modeling/backbone/timm.py:215-345 (CustomResNet/-Map over
timm Bottleneck [3, 4, 6, 3]) with FrozenBatchNorm2d conversion
(timm.py:412-413). TPU-first choices: NHWC layout (XLA's native conv layout),
bfloat16 compute with float32 parameters, and FrozenBN folded into a single
scale/bias affine at apply time (it is never trained — detectron2 freezes it).

Module / parameter naming intentionally mirrors the torch state_dict
(conv1, bn1, layer{1..4}.{i}.conv{1..3}/bn{1..3}/downsample) so the
checkpoint converter (convert/torch_weights.py) is a mechanical rename.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class FrozenBN(nn.Module):
    """Frozen batch norm: y = (x - mean) / sqrt(var + eps) * gamma + beta.

    Stats and affine are parameters (loaded from checkpoints, never updated
    by the optimizer — the solver masks them out; ref: detectron2
    FrozenBatchNorm2d)."""
    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param("weight", nn.initializers.ones, (self.features,))
        beta = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("running_mean", nn.initializers.zeros, (self.features,))
        var = self.param("running_var", nn.initializers.ones, (self.features,))
        scale = gamma * jax.lax.rsqrt(var + self.eps)
        bias = beta - mean * scale
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


class Bottleneck(nn.Module):
    """timm Bottleneck: 1x1 -> 3x3 (stride) -> 1x1 x4, FrozenBN, residual."""
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = FrozenBN(self.planes, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=1, use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = FrozenBN(self.planes, name="bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv3")(out)
        out = FrozenBN(self.planes * 4, name="bn3")(out)
        if self.downsample:
            sc = nn.Conv(self.planes * 4, (1, 1),
                         strides=(self.stride, self.stride), use_bias=False,
                         dtype=self.dtype, name="downsample_conv")(x)
            sc = FrozenBN(self.planes * 4, name="downsample_bn")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class ResNet50(nn.Module):
    """Returns the stride-8/16/32 stage outputs (C3, C4, C5) — the reference's
    FPN in_features ["layer3", "layer4", "layer5"] which index the timm stage
    list [stem, layer1..layer4] (timm.py:221-244, out_indices [2, 3, 4]).

    setup-based so stage 4 is shareable: the Res5 ROI heads
    (res5_roi_heads.py:20-172) run `res5` on pooled per-ROI C4 features with
    the SAME parameters the full forward uses. Param names are unchanged
    (layer{stage}_{i}) — the checkpoint converter is unaffected."""
    depths: Sequence[int] = (3, 4, 6, 3)
    dtype: Any = jnp.bfloat16

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

    def stem_to_c4(self, x) -> Tuple[jax.Array, jax.Array]:
        """Stem + stages 1-3 -> (C3 stride 8, C4 stride 16)."""
        x = x.astype(self.dtype)
        x = self.conv1(x)
        x = self.bn1(x)
        x = nn.relu(x)
        # torch maxpool 3x3 s2 p1
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        outs = []
        for stage_blocks in self.blocks[:3]:
            for b in stage_blocks:
                x = b(x)
            outs.append(x)
        return outs[1], outs[2]

    def res5(self, x) -> jax.Array:
        """Stage 4 (stride 2 inside) — applied to the full C4 map in the
        standard forward, or to pooled [R, 14, 14, 1024] ROI features by the
        Res5 heads (the detectron2 Res5ROIHeads _shared_roi_transform)."""
        x = x.astype(self.dtype)
        for b in self.blocks[3]:
            x = b(x)
        return x

    def __call__(self, x) -> Tuple[jax.Array, jax.Array, jax.Array]:
        c3, c4 = self.stem_to_c4(x)
        return c3, c4, self.res5(c4)   # C3 (512), C4 (1024), C5 (2048)
