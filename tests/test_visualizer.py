import numpy as np
import jax.numpy as jnp

from embodied_object_detection_tpu.demo.visualizer import Visualizer
from embodied_object_detection_tpu.structures import Detections


def test_visualizer_draws():
    vis = Visualizer(["a", "b", "c"])
    img = np.zeros((64, 96, 3), np.uint8)
    dets = Detections(
        boxes=jnp.asarray([[10, 10, 40, 40], [0, 0, 5, 5]], jnp.float32),
        scores=jnp.asarray([0.9, 0.1]),
        classes=jnp.asarray([1, 2], jnp.int32),
        valid=jnp.asarray([True, True]))
    masks = np.zeros((2, 64, 96), bool)
    masks[0, 12:38, 12:38] = True
    out = vis.draw_detections(img, dets, score_thresh=0.5, masks=masks)
    assert out.shape == img.shape
    assert out.sum() > 0                         # something drawn
    # low-score det not drawn: pixel near (2,2) stays black
    assert out[2, 60:].sum() == 0

    gt = vis.draw_ground_truth(img, np.array([[5, 5, 20, 20]]), np.array([0]))
    assert gt.sum() > 0

    sm = np.full((8, 8), -1, np.int32)
    sm[2, 3] = 1
    m = vis.draw_semmap(sm, scale=2)
    assert m.shape == (16, 16, 3)
    assert m[4:6, 6:8].sum() > 0
    leg = vis.legend(48, 80)
    assert leg.shape == (48, 80, 3)
