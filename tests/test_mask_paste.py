"""Mask pasting checks."""

import numpy as np
import jax.numpy as jnp

from embodied_object_detection_tpu.ops.mask_paste import paste_masks


def test_full_mask_fills_box():
    masks = jnp.ones((1, 28, 28), jnp.float32)
    boxes = jnp.asarray(np.array([[10.0, 20.0, 50.0, 60.0]], np.float32))
    out = np.asarray(paste_masks(masks, boxes, height=100, width=100))
    assert out.dtype == bool
    # interior of box is on
    assert out[0, 30, 30]
    assert out[0, 25, 15]
    # well outside box is off
    assert not out[0, 5, 5]
    assert not out[0, 80, 80]
    # area approximately the box area
    area = out[0].sum()
    assert abs(area - 40 * 40) < 4 * 40  # within a 1px boundary band


def test_half_mask():
    m = np.zeros((1, 28, 28), np.float32)
    m[:, :, :14] = 1.0          # left half on
    boxes = jnp.asarray(np.array([[0.0, 0.0, 56.0, 56.0]], np.float32))
    out = np.asarray(paste_masks(jnp.asarray(m), boxes, height=56, width=56))
    assert out[0, 28, 5]
    assert not out[0, 28, 50]


def test_threshold_negative_returns_float():
    masks = jnp.full((1, 28, 28), 0.3)
    boxes = jnp.asarray(np.array([[0.0, 0.0, 28.0, 28.0]], np.float32))
    out = np.asarray(paste_masks(masks, boxes, height=28, width=28, threshold=-1))
    assert out.dtype == np.float32
    np.testing.assert_allclose(out[0, 14, 14], 0.3, atol=1e-5)
