"""Numerical parity vs independently-written torch modules.

The reference checkpoints (.pth) aren't available in this environment, so
layer-level parity is established by building the same architectures in
torch (hand-written here from the public ResNet/FPN definitions — not copied
from the reference), converting their weights with convert/torch_weights.py,
and asserting near-equality of outputs. This validates conv padding/stride
conventions, FrozenBN eps, maxpool semantics, FC layouts and the converter's
transposes end-to-end.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from embodied_object_detection_tpu.convert.torch_weights import (  # noqa: E402
    convert_state_dict)


def _to_jax_conv(w):
    return jnp.asarray(np.transpose(w.detach().numpy(), (2, 3, 1, 0)))


class TorchBottleneck(tnn.Module):
    """timm-style bottleneck with (frozen) BN."""

    def __init__(self, cin, planes, stride=1, downsample=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.down = None
        if downsample:
            self.down = tnn.Sequential(
                tnn.Conv2d(cin, planes * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(planes * 4))

    def forward(self, x):
        out = tF.relu(self.bn1(self.conv1(x)))
        out = tF.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        sc = self.down(x) if self.down is not None else x
        return tF.relu(out + sc)


def _randomize_bn(bn, rng):
    with torch.no_grad():
        bn.weight.copy_(torch.tensor(rng.rand(bn.num_features) + 0.5))
        bn.bias.copy_(torch.tensor(rng.randn(bn.num_features) * 0.1))
        bn.running_mean.copy_(torch.tensor(rng.randn(bn.num_features) * 0.1))
        bn.running_var.copy_(torch.tensor(rng.rand(bn.num_features) + 0.5))


def test_bottleneck_parity(rng):
    from embodied_object_detection_tpu.models.resnet import Bottleneck
    tb = TorchBottleneck(16, 4, stride=2, downsample=True).eval()
    for m in tb.modules():
        if isinstance(m, tnn.BatchNorm2d):
            _randomize_bn(m, rng)
        if isinstance(m, tnn.Conv2d):
            with torch.no_grad():
                m.weight.copy_(torch.tensor(
                    rng.randn(*m.weight.shape).astype(np.float32) * 0.1))

    x = rng.randn(1, 16, 12, 16).astype(np.float32)
    with torch.no_grad():
        want = tb(torch.tensor(x)).numpy()[0].transpose(1, 2, 0)

    # convert weights via the converter's naming (prefix with a fake layer)
    sd = {}
    for k, v in tb.state_dict().items():
        if "num_batches" in k:
            continue
        k2 = k.replace("down.0", "downsample.0").replace("down.1", "downsample.1")
        sd[f"backbone.bottom_up.base.layer1.0.{k2}"] = v.numpy()
    tree, _ = convert_state_dict(sd)
    params = {"params": tree["params"]["backbone"]["layer1_0"]}

    jb = Bottleneck(planes=4, stride=2, downsample=True, dtype=jnp.float32)
    got = np.asarray(jb.apply(params, jnp.asarray(x[0].transpose(1, 2, 0))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_stem_parity(rng):
    """conv7x7 s2 + BN + relu + maxpool3x3 s2 — the trickiest padding combo."""
    from embodied_object_detection_tpu.models.resnet import FrozenBN
    import flax.linen as nn

    conv_t = tnn.Conv2d(3, 8, 7, 2, 3, bias=False)
    bn_t = tnn.BatchNorm2d(8).eval()
    _randomize_bn(bn_t, rng)
    with torch.no_grad():
        conv_t.weight.copy_(torch.tensor(
            rng.randn(8, 3, 7, 7).astype(np.float32) * 0.05))

    x = rng.randn(1, 3, 32, 48).astype(np.float32)
    with torch.no_grad():
        y = tF.relu(bn_t(conv_t(torch.tensor(x))))
        want = tF.max_pool2d(y, 3, 2, 1).numpy()[0].transpose(1, 2, 0)

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, z):
            z = nn.Conv(8, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                        name="conv1")(z)
            z = FrozenBN(8, name="bn1")(z)
            z = nn.relu(z)
            return nn.max_pool(z, (3, 3), strides=(2, 2),
                               padding=((1, 1), (1, 1)))

    params = {"params": {
        "conv1": {"kernel": _to_jax_conv(conv_t.weight)},
        "bn1": {"weight": jnp.asarray(bn_t.weight.detach().numpy()),
                "bias": jnp.asarray(bn_t.bias.detach().numpy()),
                "running_mean": jnp.asarray(bn_t.running_mean.numpy()),
                "running_var": jnp.asarray(bn_t.running_var.numpy())}}}
    got = np.asarray(Stem().apply(params, jnp.asarray(x[0].transpose(1, 2, 0))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_deconv_parity(rng):
    """mask-head 2x2 s2 ConvTranspose vs the einsum pixel-shuffle."""
    dc = tnn.ConvTranspose2d(6, 6, 2, 2)
    with torch.no_grad():
        dc.weight.copy_(torch.tensor(rng.randn(6, 6, 2, 2).astype(np.float32)))
        dc.bias.copy_(torch.tensor(rng.randn(6).astype(np.float32)))
    x = rng.randn(2, 6, 7, 9).astype(np.float32)
    with torch.no_grad():
        want = dc(torch.tensor(x)).numpy().transpose(0, 2, 3, 1)

    w = jnp.asarray(np.transpose(dc.weight.detach().numpy(), (2, 3, 0, 1)))
    b = jnp.asarray(dc.bias.detach().numpy())
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    y = jnp.einsum("rhwc,abcd->rhawbd", xj, w)
    got = np.asarray(y.reshape(2, 14, 18, 6) + b)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_linear_parity(rng):
    """FC layout: torch Linear vs flax Dense with converter transpose."""
    import flax.linen as nn
    fc = tnn.Linear(12, 7)
    x = rng.randn(3, 12).astype(np.float32)
    with torch.no_grad():
        want = fc(torch.tensor(x)).numpy()
    params = {"params": {"kernel": jnp.asarray(fc.weight.detach().numpy().T),
                         "bias": jnp.asarray(fc.bias.detach().numpy())}}
    got = np.asarray(nn.Dense(7).apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_groupnorm_parity(rng):
    from embodied_object_detection_tpu.models.layers import GroupNorm
    gn = tnn.GroupNorm(4, 16)
    with torch.no_grad():
        gn.weight.copy_(torch.tensor(rng.rand(16).astype(np.float32) + 0.5))
        gn.bias.copy_(torch.tensor(rng.randn(16).astype(np.float32) * 0.1))
    x = rng.randn(1, 16, 5, 6).astype(np.float32)
    with torch.no_grad():
        want = gn(torch.tensor(x)).numpy()[0].transpose(1, 2, 0)
    params = {"params": {"scale": jnp.asarray(gn.weight.detach().numpy()),
                         "bias": jnp.asarray(gn.bias.detach().numpy())}}
    got = np.asarray(GroupNorm(num_groups=4).apply(
        params, jnp.asarray(x[0].transpose(1, 2, 0))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
