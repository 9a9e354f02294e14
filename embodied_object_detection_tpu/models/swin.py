"""Swin Transformer backbone (alternative to ResNet50).

ref: Detic/detic/modeling/backbone/swintransformer.py (749 LoC vendored Swin
used by the SwinB_896b32 configs, e.g.
Detic_LCOCOI21k_CLIP_SwinB_896b32_4x_ft4x_max-size.yaml). TPU-first notes:
window attention is expressed over NHWC with static window partitioning
(reshape/transpose only — no dynamic shapes), relative position bias tables
match the torch layout for the weight converter, and compute runs in
bfloat16 with float32 layernorms/softmax.

Returns the stride-8/16/32 stage outputs like models/resnet.ResNet50, so the
same FPN + heads stack on top unchanged.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def window_partition(x: jax.Array, ws: int) -> jax.Array:
    """[H, W, C] -> [nW, ws*ws, C]."""
    h, w, c = x.shape
    x = x.reshape(h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 2, 1, 3, 4).reshape(-1, ws * ws, c)


def window_reverse(windows: jax.Array, ws: int, h: int, w: int) -> jax.Array:
    c = windows.shape[-1]
    x = windows.reshape(h // ws, w // ws, ws, ws, c)
    return x.transpose(0, 2, 1, 3, 4).reshape(h, w, c)


def relative_position_index(ws: int) -> np.ndarray:
    """The torch swin relative_position_index [ws*ws, ws*ws]."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))         # [2, ws, ws]
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]             # [2, N, N]
    rel = rel.transpose(1, 2, 0)
    rel[..., 0] += ws - 1
    rel[..., 1] += ws - 1
    rel[..., 0] *= 2 * ws - 1
    return rel.sum(-1)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, mask=None):
        # x: [nW, N, C]; mask: [nW_types, N, N] or None
        nw, n, c = x.shape
        h = self.num_heads
        ws = self.window_size
        qkv = nn.Dense(c * 3, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(nw, n, 3, h, c // h).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]                  # [nW, h, N, d]
        scale = (c // h) ** -0.5
        attn = jnp.einsum("whnd,whmd->whnm", q * scale, k,
                          preferred_element_type=jnp.float32)

        table = self.param("relative_position_bias_table",
                           nn.initializers.normal(0.02),
                           ((2 * ws - 1) ** 2, h))
        idx = jnp.asarray(relative_position_index(ws).reshape(-1))
        bias = table[idx].reshape(n, n, h).transpose(2, 0, 1)
        attn = attn + bias[None].astype(attn.dtype)
        if mask is not None:
            attn = attn + mask[:, None].astype(attn.dtype)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
        out = jnp.einsum("whnm,whmd->whnd", attn.astype(self.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(nw, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    dtype: Any = jnp.bfloat16

    def _drop_path(self, y: jax.Array, train: bool) -> jax.Array:
        """Stochastic depth on a residual branch (ref: swintransformer.py
        DropPath, applied to both branches at :254-255). Train-mode only;
        the whole (unbatched) frame is one stochastic-depth sample, scaled
        by 1/keep as in timm's drop_path."""
        if not train or self.drop_path <= 0.0:
            return y
        keep = 1.0 - self.drop_path
        rng = self.make_rng("drop_path")
        coin = jax.random.bernoulli(rng, keep)
        return jnp.where(coin, y / keep, jnp.zeros_like(y))

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [H, W, C] (already padded to a multiple of window_size)
        h, w, c = x.shape
        ws = self.window_size
        shortcut = x
        y = nn.LayerNorm(dtype=jnp.float32, name="norm1")(
            x.astype(jnp.float32)).astype(self.dtype)
        if self.shift > 0:
            y = jnp.roll(y, (-self.shift, -self.shift), axis=(0, 1))
            mask = _shift_mask(h, w, ws, self.shift)
        else:
            mask = None
        windows = window_partition(y, ws)
        attn = WindowAttention(self.dim, self.num_heads, ws,
                               dtype=self.dtype, name="attn")(windows, mask)
        y = window_reverse(attn, ws, h, w)
        if self.shift > 0:
            y = jnp.roll(y, (self.shift, self.shift), axis=(0, 1))
        x = shortcut + self._drop_path(y, train)
        z = nn.LayerNorm(dtype=jnp.float32, name="norm2")(
            x.astype(jnp.float32)).astype(self.dtype)
        z = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(z)
        z = nn.gelu(z, approximate=False)
        z = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(z)
        return x + self._drop_path(z, train)


def _shift_mask(h: int, w: int, ws: int, shift: int) -> jnp.ndarray:
    """Attention mask for shifted windows (torch swin img_mask logic)."""
    img = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wsl] = cnt
            cnt += 1
    img = jnp.asarray(img)[..., None]
    win = window_partition(img.astype(jnp.float32), ws)[..., 0]  # [nW, N]
    diff = win[:, None, :] - win[:, :, None]
    return jnp.where(diff != 0, -100.0, 0.0)


class SwinTransformer(nn.Module):
    """Swin-B defaults (ref: swintransformer.py / SwinB config):
    embed 128, depths (2,2,18,2), heads (4,8,16,32), window 7, patch 4."""
    embed_dim: int = 128
    depths: Sequence[int] = (2, 2, 18, 2)
    num_heads: Sequence[int] = (4, 8, 16, 32)
    window_size: int = 7
    # stochastic-depth rate, linearly decayed over all blocks (ref:
    # swintransformer.py:486,520 — SwinB default 0.2); train-mode only,
    # needs an rngs={"drop_path": key} at apply time
    drop_path_rate: float = 0.2
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x,
                 train: bool = False) -> Tuple[jax.Array, jax.Array,
                                               jax.Array]:
        # x: [H, W, 3]; H, W divisible by 32
        total_blocks = sum(self.depths)
        dpr = [self.drop_path_rate * i / max(total_blocks - 1, 1)
               for i in range(total_blocks)]
        x = x.astype(self.dtype)
        x = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4),
                    dtype=self.dtype, name="patch_embed")(x)
        x = nn.LayerNorm(dtype=jnp.float32, name="patch_norm")(
            x.astype(jnp.float32)).astype(self.dtype)

        outs = []
        dim = self.embed_dim
        for stage, depth in enumerate(self.depths):
            h, w, _ = x.shape
            ws = self.window_size
            pad_h = (-h) % ws
            pad_w = (-w) % ws
            xp = jnp.pad(x, ((0, pad_h), (0, pad_w), (0, 0)))
            for blk in range(depth):
                shift = 0 if blk % 2 == 0 else ws // 2
                xp = SwinBlock(dim, self.num_heads[stage], ws, shift,
                               drop_path=dpr[sum(self.depths[:stage]) + blk],
                               dtype=self.dtype,
                               name=f"stage{stage}_block{blk}")(xp, train)
            x = xp[:h, :w]
            out = nn.LayerNorm(dtype=jnp.float32, name=f"out_norm{stage}")(
                x.astype(jnp.float32)).astype(self.dtype)
            outs.append(out)
            if stage < len(self.depths) - 1:
                # patch merging: 2x2 concat + linear (torch swin layout:
                # x0=x[0::2,0::2], x1=x[1::2,0::2], x2=x[0::2,1::2], x3=[1,1])
                hh, ww, cc = x.shape
                x0 = x[0::2, 0::2]
                x1 = x[1::2, 0::2]
                x2 = x[0::2, 1::2]
                x3 = x[1::2, 1::2]
                merged = jnp.concatenate([x0, x1, x2, x3], axis=-1)
                merged = nn.LayerNorm(dtype=jnp.float32,
                                      name=f"merge_norm{stage}")(
                    merged.astype(jnp.float32)).astype(self.dtype)
                x = nn.Dense(dim * 2, use_bias=False, dtype=self.dtype,
                             name=f"merge_reduction{stage}")(merged)
                dim *= 2
        # stages output strides 4/8/16/32; FPN consumes 8/16/32
        return outs[1], outs[2], outs[3]
