"""MSDeformAttn vs a literal numpy oracle of the reference's pure-torch
fallback (ms_deform_attn_core_pytorch) + gradcheck-style finite-difference
(the reference tests the CUDA op the same way, models/ops/test.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from embodied_object_detection_tpu.ops.ms_deform_attn import ms_deform_attn


def np_oracle(value, shapes, locs, weights):
    s, m, d = value.shape
    q, _, l, p, _ = locs.shape
    out = np.zeros((q, m, d))
    offset = 0
    for lvl, (h, w) in enumerate(shapes):
        v = value[offset: offset + h * w].transpose(1, 0, 2).reshape(m, h, w, d)
        offset += h * w
        for qi in range(q):
            for mi in range(m):
                for pi in range(p):
                    x = locs[qi, mi, lvl, pi, 0] * w - 0.5
                    y = locs[qi, mi, lvl, pi, 1] * h - 0.5
                    x0, y0 = int(np.floor(x)), int(np.floor(y))
                    lx, ly = x - x0, y - y0
                    acc = np.zeros(d)
                    for dy, dx, wt in ((0, 0, (1 - ly) * (1 - lx)),
                                       (0, 1, (1 - ly) * lx),
                                       (1, 0, ly * (1 - lx)),
                                       (1, 1, ly * lx)):
                        yy, xx = y0 + dy, x0 + dx
                        if 0 <= yy < h and 0 <= xx < w:
                            acc += wt * v[mi, yy, xx]
                    out[qi, mi] += acc * weights[qi, mi, lvl, pi]
    return out.reshape(q, m * d)


def test_matches_oracle(rng):
    shapes = ((6, 8), (3, 4))
    s = sum(h * w for h, w in shapes)
    m, d, q, p = 2, 4, 5, 3
    value = rng.randn(s, m, d).astype(np.float32)
    locs = rng.rand(q, m, len(shapes), p, 2).astype(np.float32)
    weights = rng.rand(q, m, len(shapes), p).astype(np.float32)
    weights /= weights.sum(axis=(2, 3), keepdims=True)
    got = np.asarray(ms_deform_attn(jnp.asarray(value), shapes,
                                    jnp.asarray(locs), jnp.asarray(weights)))
    want = np_oracle(value, shapes, locs, weights)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gradients_finite_difference(rng):
    shapes = ((4, 4),)
    s, m, d, q, p = 16, 1, 2, 2, 2
    value = rng.randn(s, m, d).astype(np.float64)
    locs = (rng.rand(q, m, 1, p, 2) * 0.6 + 0.2).astype(np.float64)
    weights = rng.rand(q, m, 1, p).astype(np.float64)

    def f(v):
        return jnp.sum(ms_deform_attn(v, shapes, jnp.asarray(locs),
                                      jnp.asarray(weights)))

    g = np.asarray(jax.grad(f)(jnp.asarray(value)))
    eps = 1e-2   # f32 on device: keep the finite-difference step coarse
    for idx in [(0, 0, 0), (5, 0, 1), (10, 0, 0)]:
        vp = value.copy(); vp[idx] += eps
        vm = value.copy(); vm[idx] -= eps
        fd = (float(f(jnp.asarray(vp))) - float(f(jnp.asarray(vm)))) / (2 * eps)
        # the op is linear in `value`, so coarse FD is exact up to f32 noise
        assert abs(fd - g[idx]) < 2e-3, (idx, fd, g[idx])
