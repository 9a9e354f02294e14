"""Modulated deformable convolution (DCNv2) as a gather-interpolate kernel.

TPU-native equivalent of the reference's vendored CUDA layer
(ref: third_party/CenterNet2/centernet/modeling/layers/deform_conv.py
`DFConv2d` over detectron2 ModulatedDeformConv — the optional DLA-backbone
path; SURVEY §2.3). The CUDA kernel's im2col-with-offsets becomes a batched
bilinear gather: every output location samples its kh*kw taps at
`base + dilation*k + offset`, scales them by the sigmoid modulation mask, and
the tap-stack contracts with the weights on the MXU via one einsum.

Semantics (mmcv/detectron2 ModulatedDeformConv):
  * offset channels are (dy, dx) pairs per tap, tap-major:
    offset[..., 2k] = dy_k, offset[..., 2k+1] = dx_k
  * bilinear sampling with implicit zero padding outside the input
  * out(p) = sum_k w_k . x(p0 + p_k + dp_k) * m_k   (+ bias)

Not wired into any default config (the embodied pipeline never uses it —
capability parity for the DLA/CenterNet configs only).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def bilinear_sample_zero_pad(img: jax.Array, y: jax.Array, x: jax.Array
                             ) -> jax.Array:
    """img [H, W, C]; y, x [...] continuous coords -> [..., C] with zero
    padding outside [0, H-1] x [0, W-1] (grid_sample-style hat weights —
    border pixels fade out over the last unit, exactly the CUDA
    `dmcn_im2col_bilinear` behavior)."""
    h, w, c = img.shape
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    ly = y - y0
    lx = x - x0

    def tap(yi, xi, wgt):
        ok = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        v = img[yi_c, xi_c]
        return v * (wgt * ok.astype(wgt.dtype))[..., None]

    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    return (tap(y0i, x0i, (1 - ly) * (1 - lx)) +
            tap(y0i, x0i + 1, (1 - ly) * lx) +
            tap(y0i + 1, x0i, ly * (1 - lx)) +
            tap(y0i + 1, x0i + 1, ly * lx))


@partial(jax.jit, static_argnames=("stride", "padding", "dilation"))
def modulated_deform_conv(x: jax.Array, offset: jax.Array,
                          mask: Optional[jax.Array], weight: jax.Array,
                          bias: Optional[jax.Array] = None,
                          stride: int = 1, padding: int = 1,
                          dilation: int = 1) -> jax.Array:
    """DCNv2 forward.

    x:      [H, W, Cin]
    offset: [Ho, Wo, 2*K] (dy, dx) tap-major
    mask:   [Ho, Wo, K] post-sigmoid modulation (None = DCNv1)
    weight: [kh, kw, Cin, Cout]
    returns [Ho, Wo, Cout]
    """
    kh, kw, cin, cout = weight.shape
    k = kh * kw
    ho, wo = offset.shape[0], offset.shape[1]

    # base sampling lattice: output pixel (i, j), tap (a, b) samples
    # (i*stride - padding + a*dilation + dy, ...)
    oy = jnp.arange(ho, dtype=jnp.float32) * stride - padding
    ox = jnp.arange(wo, dtype=jnp.float32) * stride - padding
    ky = jnp.arange(kh, dtype=jnp.float32) * dilation
    kx = jnp.arange(kw, dtype=jnp.float32) * dilation
    base_y = oy[:, None, None, None] + ky[None, None, :, None]   # [Ho,1,kh,1]
    base_x = ox[None, :, None, None] + kx[None, None, None, :]   # [1,Wo,1,kw]

    off = offset.reshape(ho, wo, k, 2).reshape(ho, wo, kh, kw, 2)
    sy = base_y + off[..., 0]
    sx = base_x + off[..., 1]

    vals = bilinear_sample_zero_pad(x.astype(jnp.float32), sy, sx)
    if mask is not None:
        m = mask.reshape(ho, wo, kh, kw)
        vals = vals * m[..., None]
    # contract taps x Cin with the weights on the MXU
    # precision=HIGHEST: the CUDA ModulatedDeformConv reference is fp32-only
    # and TPU matmuls otherwise round inputs to bf16 even after the f32
    # casts above (preferred_element_type only fixes the accumulator)
    out = jnp.einsum("hwabc,abcd->hwd", vals, weight.astype(jnp.float32),
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    return out


class DeformConvBlock(nn.Module):
    """DFConv2d analog: a zero-init offset/mask conv + modulated deform conv.

    ref: deform_conv.py:19-104 — offset conv outputs 3*K channels
    (2K offsets + K mask logits) when modulated; offsets/weights zero-init
    so the layer starts as a plain conv (nn.init.constant_ 0, :66-67).
    """
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    with_modulated_dcn: bool = True
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel_size * self.kernel_size
        pad = self.dilation * (self.kernel_size - 1) // 2
        off_ch = k * 3 if self.with_modulated_dcn else k * 2
        raw = nn.Conv(off_ch, (self.kernel_size, self.kernel_size),
                      strides=(self.stride, self.stride), padding=pad,
                      kernel_dilation=(self.dilation, self.dilation),
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros,
                      name="offset")(x[None])[0]
        if self.with_modulated_dcn:
            offset = raw[..., : 2 * k]
            mask = jax.nn.sigmoid(raw[..., 2 * k:])
        else:
            offset, mask = raw, None
        weight = self.param(
            "weight", nn.initializers.he_normal(),
            (self.kernel_size, self.kernel_size, x.shape[-1],
             self.out_channels))
        bias = self.param("bias", nn.initializers.zeros,
                          (self.out_channels,)) if self.use_bias else None
        return modulated_deform_conv(x, offset, mask, weight, bias,
                                     self.stride, pad, self.dilation)
