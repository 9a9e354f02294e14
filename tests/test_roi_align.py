"""ROIAlign checks: constant fields, linear-ramp exactness, level routing."""

import numpy as np
import jax.numpy as jnp

from embodied_object_detection_tpu.ops.roi_align import (
    multilevel_roi_align, assign_levels)


def test_constant_field_preserved():
    # on a constant feature map every interior pooled value must equal the
    # constant (edge bins fade with zero padding, matching CUDA ROIAlign)
    feats = [jnp.full((60, 80, 4), 7.0), jnp.full((30, 40, 4), 7.0),
             jnp.full((15, 20, 4), 7.0)]
    boxes = jnp.asarray(np.array([[10, 10, 100, 100], [64, 64, 600, 440],
                                  [300, 200, 340, 230]], np.float32))
    out = multilevel_roi_align(feats, boxes, strides=(8, 16, 32), output_size=7)
    np.testing.assert_allclose(np.asarray(out), 7.0, atol=1e-5)


def test_linear_ramp_exact():
    # bilinear sampling of a linear function is exact; mean of samples per bin
    # equals the function at the bin center.
    h, w = 64, 64
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    # f(x, y) = x (in feature grid units)
    feat = xs.astype(np.float32)[..., None]
    feats = [jnp.asarray(feat)]
    box = np.array([[8.0, 8.0, 8.0 + 7 * 8, 8.0 + 7 * 8]], np.float32)  # small -> lvl3
    out = np.asarray(multilevel_roi_align(feats, jnp.asarray(box),
                                          strides=(8,), output_size=7))
    # bin j center in image coords: 8 + (j+0.5)*8 ; in grid coords /8 - 0.5
    expected = (8.0 + (np.arange(7) + 0.5) * 8.0) / 8.0 - 0.5
    np.testing.assert_allclose(out[0, 3, :, 0], expected, atol=1e-4)


def test_border_band_full_weight():
    # CUDA-kernel semantics (ADVICE r1): sample coords in (-1, 0) and
    # (size-1, size] clamp to the border pixel at FULL weight — a constant
    # field must stay constant for boxes overhanging the edge by < 1 grid px.
    feats = [jnp.full((16, 16, 1), 7.0)]
    # grid coords span [-1, 15] at stride 8; all samples fall in [-1, 15)
    box = jnp.asarray(np.array([[-8.0, -8.0, 120.0, 120.0]], np.float32))
    out = np.asarray(multilevel_roi_align(feats, box, strides=(8,),
                                          output_size=7))
    np.testing.assert_allclose(out, 7.0, atol=1e-5)


def test_strictly_outside_contributes_zero():
    # samples strictly outside [-1, size] contribute exactly 0
    feats = [jnp.full((16, 16, 1), 7.0)]
    box = jnp.asarray(np.array([[-400.0, 40.0, -320.0, 120.0]], np.float32))
    out = np.asarray(multilevel_roi_align(feats, box, strides=(8,),
                                          output_size=7))
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def _np_bilinear_cuda(feat, y, x):
    """The torchvision/detectron2 ROIAlign `bilinear_interpolate` device
    function, re-derived in numpy (per-sample scalar semantics)."""
    h, w = feat.shape[:2]
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return np.zeros(feat.shape[-1])
    y = min(max(y, 0.0), h - 1)
    x = min(max(x, 0.0), w - 1)
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
    ly, lx = y - y0, x - x0
    return (feat[y0, x0] * (1 - ly) * (1 - lx) + feat[y0, x1] * (1 - ly) * lx +
            feat[y1, x0] * ly * (1 - lx) + feat[y1, x1] * ly * lx)


def np_roi_align_oracle(feat, box, stride, out_size, sampling_ratio=2):
    """ROIAlignV2 (aligned=True) single-level oracle."""
    x1, y1, x2, y2 = [v / stride for v in box]
    bin_w = (x2 - x1) / out_size
    bin_h = (y2 - y1) / out_size
    out = np.zeros((out_size, out_size, feat.shape[-1]))
    s = sampling_ratio
    for i in range(out_size):
        for j in range(out_size):
            acc = np.zeros(feat.shape[-1])
            for ky in range(s):
                for kx in range(s):
                    sy = y1 + (i + (ky + 0.5) / s) * bin_h - 0.5
                    sx = x1 + (j + (kx + 0.5) / s) * bin_w - 0.5
                    acc += _np_bilinear_cuda(feat, sy, sx)
            out[i, j] = acc / (s * s)
    return out


def test_matches_cuda_kernel_oracle(rng=np.random.RandomState(0)):
    feat = rng.randn(20, 24, 3).astype(np.float32)
    boxes = np.array([
        [16, 8, 100, 120],        # interior
        [-6, -10, 60, 50],        # overhangs top-left within the (-1,0) band
        [100, 60, 200, 170],      # overhangs bottom-right past the image
        [-80, 30, 30, 90],        # partially strictly outside
    ], np.float32)
    got = np.asarray(multilevel_roi_align([jnp.asarray(feat)],
                                          jnp.asarray(boxes), strides=(8,),
                                          output_size=7))
    for i, b in enumerate(boxes):
        want = np_roi_align_oracle(feat, b, 8, 7)
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-4,
                                   err_msg=f"box {i}")


def test_level_assignment():
    boxes = jnp.asarray(np.array([
        [0, 0, 32, 32],        # tiny -> level 3
        [0, 0, 224, 224],      # canonical -> level 4
        [0, 0, 448, 448],      # 2x canonical -> level 5
        [0, 0, 2000, 2000],    # huge -> clamped to 5
    ], np.float32))
    lv = np.asarray(assign_levels(boxes, 3, 5))
    assert list(lv) == [3, 4, 5, 5]


def test_multilevel_routing_uses_right_level():
    # make each level's features a distinct constant; pooled output reveals
    # which level was sampled.
    feats = [jnp.full((60, 80, 1), 3.0), jnp.full((30, 40, 1), 4.0),
             jnp.full((15, 20, 1), 5.0)]
    boxes = jnp.asarray(np.array([[16, 16, 48, 48], [16, 16, 240, 240],
                                  [16, 16, 466, 466]], np.float32))
    out = np.asarray(multilevel_roi_align(feats, boxes, strides=(8, 16, 32),
                                          output_size=7))
    np.testing.assert_allclose(out[0], 3.0, atol=1e-5)
    np.testing.assert_allclose(out[1], 4.0, atol=1e-5)
    np.testing.assert_allclose(out[2], 5.0, atol=1e-5)


def test_impl_variants_agree(rng=np.random.RandomState(3)):
    """v2 (bf16-weight gather), v3 (neighbor-packed gather) and v4
    (gather-free separable hat-weight matmuls, the default) must agree
    with the v1 reference formulation under f32: v2/v3 bitwise, v4 to
    float re-association (~1 ulp; it factors (1-ly)*x-interp instead of
    expanding four taps). Covers 7x7 box pooling and 14x14 mask pooling,
    boxes straddling borders/outside, and gradients."""
    feats = [jnp.asarray(rng.randn(60, 80, 16).astype(np.float32)),
             jnp.asarray(rng.randn(30, 40, 16).astype(np.float32)),
             jnp.asarray(rng.randn(15, 20, 16).astype(np.float32))]
    boxes = np.zeros((48, 4), np.float32)
    boxes[:, 0] = rng.uniform(-30, 620, 48)
    boxes[:, 1] = rng.uniform(-30, 460, 48)
    boxes[:, 2] = boxes[:, 0] + rng.uniform(1, 400, 48)
    boxes[:, 3] = boxes[:, 1] + rng.uniform(1, 400, 48)
    boxes = jnp.asarray(boxes)

    for out_size in (7, 14):
        v1 = multilevel_roi_align(feats, boxes, (8, 16, 32), out_size,
                                  impl="v1")
        v2 = multilevel_roi_align(feats, boxes, (8, 16, 32), out_size,
                                  impl="v2")
        v3 = multilevel_roi_align(feats, boxes, (8, 16, 32), out_size,
                                  impl="v3")
        v4 = multilevel_roi_align(feats, boxes, (8, 16, 32), out_size,
                                  impl="v4")
        # v3's explicit four weighted adds replicate v2's tap order exactly
        assert (np.asarray(v3) == np.asarray(v2)).all()
        for impl, v in (("v2", v2), ("v3", v3), ("v4", v4)):
            np.testing.assert_allclose(np.asarray(v), np.asarray(v1),
                                       rtol=1e-5, atol=1e-5, err_msg=impl)

    def loss(fs, impl):
        return jnp.sum(multilevel_roi_align(
            fs, boxes, (8, 16, 32), 7, impl=impl) ** 2)

    import jax
    g1 = jax.grad(lambda fs: loss(fs, "v1"))(feats)
    for impl in ("v3", "v4"):
        g = jax.grad(lambda fs: loss(fs, impl))(feats)
        for a, b in zip(g1, g):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4, err_msg=impl)
