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


# detectron2/caffe2 weight-init fills (fvcore.nn.weight_init) so
# from-scratch training starts from the reference's weight distribution —
# flax's lecun_normal default is ~2x wider than e.g. normal(std=0.01)
# tower fills and would diverge early-training dynamics.
# c2_xavier_fill = kaiming_uniform_(w, a=1): bound = sqrt(3 / fan_in)
c2_xavier_init = nn.initializers.variance_scaling(1.0, "fan_in", "uniform")
# c2_msra_fill = kaiming_normal_(w, mode=fan_out, nonlinearity=relu)
c2_msra_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
# torch nn.Linear default = kaiming_uniform_(w, a=sqrt(5)):
# bound = sqrt(1 / fan_in)
torch_linear_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in",
                                                     "uniform")
