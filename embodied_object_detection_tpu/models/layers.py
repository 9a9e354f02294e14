"""Shared layers."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class GroupNorm(nn.Module):
    """GroupNorm over an *unbatched* [..., C] tensor.

    flax.linen.GroupNorm treats the leading axis as batch, which silently
    normalizes per-row when given the unbatched [H, W, C] feature maps this
    framework uses. This version matches torch.nn.GroupNorm: statistics over
    all spatial positions and the channels within each group.
    """
    num_groups: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        g = self.num_groups
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        orig_shape = x.shape
        xf = x.astype(jnp.float32).reshape(-1, g, c // g)     # [HW, G, C/G]
        mean = jnp.mean(xf, axis=(0, 2), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(0, 2), keepdims=True)
        xn = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        xn = xn.reshape(orig_shape)
        return xn * scale + bias
