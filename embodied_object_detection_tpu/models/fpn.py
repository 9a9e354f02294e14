"""FPN (p3-p7) with optional spatial-memory fusion, flax/linen NHWC.

ref: detectron2 FPN as subclassed by CustomRecurrentFPN
(Detic/detic/modeling/backbone/timm.py:54-213) and the p6/p7 top block
LastLevelP6P7_P5 (timm.py:347-364). The memory read path (gather + pyramid
pooling) lives in ops/memory_ops.py; this module applies the per-level 1x1
merge projections (map_merge_projection1-3, timm.py:78-88) and the fusion
arithmetic (timm.py:174-189).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.memory_ops import pyramid_pool


def _upsample_nearest2x(x: jax.Array) -> jax.Array:
    h, w, c = x.shape[-3], x.shape[-2], x.shape[-1]
    x = jnp.repeat(x, 2, axis=-3)
    return jnp.repeat(x, 2, axis=-2)


class RecurrentFPN(nn.Module):
    """FPN whose p3-p5 outputs are fused with egocentric memory features.

    ref: CustomRecurrentFPN.forward (timm.py:91-213). `ego_memory` is the
    [H/4, W/4, 512] gathered+pooled memory image produced by
    ops.memory_ops.memory_read; per level it is 2x2-mean-pooled again, passed
    through a 1x1 projection (512 -> 256), scaled by map_feature_weight and
    fused (sum | mem_only | image_only). When ego_memory is None the module
    degrades to the plain FPN (memory_type != implicit_memory path).
    """
    out_channels: int = 256
    feat_fusion: str = "sum"
    map_feature_weight: float = 1.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, c3, c4, c5,
                 ego_memory: Optional[jax.Array] = None) -> Tuple[jax.Array, ...]:
        lat5 = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="lateral3")(c5)
        lat4 = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="lateral2")(c4)
        lat3 = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="lateral1")(c3)
        m5 = lat5
        m4 = lat4 + _upsample_nearest2x(m5)
        m3 = lat3 + _upsample_nearest2x(m4)
        p5 = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="output3")(m5)
        p4 = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="output2")(m4)
        p3 = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="output1")(m3)

        if ego_memory is not None:
            # per-level memory images at p3/p4/p5 resolution.
            # ref: timm.py:168 — pooled 2x2 before *each* level's merge.
            mems = pyramid_pool(ego_memory.astype(jnp.float32), 3)
            fused = []
            for i, (p, mem) in enumerate(zip((p3, p4, p5), mems)):
                # ref: timm.py:78-88 map_merge_projection{1,2,3}: 1x1 conv,
                # bias=True, norm="" (merge_norm resolves to None for FPN
                # norm '').
                proj = nn.Conv(self.out_channels, (1, 1), dtype=jnp.float32,
                               name=f"map_merge_projection{i + 1}")(mem)
                proj = proj * self.map_feature_weight
                if self.feat_fusion == "sum":
                    new_p = proj.astype(p.dtype) + p
                elif self.feat_fusion == "mem_only":
                    new_p = proj.astype(p.dtype)
                elif self.feat_fusion == "image_only":
                    new_p = p
                else:
                    raise ValueError(f"unknown fusion {self.feat_fusion!r}")
                fused.append(new_p)
            p3, p4, p5 = fused

        p6 = nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding=1,
                     dtype=self.dtype, name="p6")(p5)
        p7 = nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding=1,
                     dtype=self.dtype, name="p7")(nn.relu(p6))
        return p3, p4, p5, p6, p7
