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
    list [stem, layer1..layer4] (timm.py:221-244, out_indices [2, 3, 4])."""
    depths: Sequence[int] = (3, 4, 6, 3)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x) -> Tuple[jax.Array, jax.Array, jax.Array]:
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = FrozenBN(64, name="bn1")(x)
        x = nn.relu(x)
        # torch maxpool 3x3 s2 p1
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        planes = (64, 128, 256, 512)
        for stage, (depth, p) in enumerate(zip(self.depths, planes)):
            stride = 1 if stage == 0 else 2
            for i in range(depth):
                x = Bottleneck(p, stride=stride if i == 0 else 1,
                               downsample=(i == 0), dtype=self.dtype,
                               name=f"layer{stage + 1}_{i}")(x)
            outs.append(x)
        return outs[1], outs[2], outs[3]   # C3 (512), C4 (1024), C5 (2048)
