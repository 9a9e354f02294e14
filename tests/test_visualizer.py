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


def _golden_inputs():
    rng = np.random.RandomState(42)
    img = rng.randint(0, 255, (32, 48, 3)).astype(np.uint8)
    hm = np.zeros((8, 12), np.float32)
    hm[3, 5] = 1.0
    hm[3, 6] = 0.5
    masks = np.zeros((2, 32, 48), bool)
    masks[0, 8:20, 10:30] = True
    masks[1, 4:10, 36:44] = True
    return img, hm, masks


def test_heatmap_blend_golden():
    """Golden-array regression for the text-free debug renders (VERDICT r1
    #9). Regenerate tests/golden/visualizer_golden.npz via
    tools/gen_visualizer_golden.py when render semantics change."""
    import os
    from embodied_object_detection_tpu.demo.visualizer import (
        Visualizer, blend_heatmap)
    img, hm, masks = _golden_inputs()
    golden_path = os.path.join(os.path.dirname(__file__), "golden",
                               "visualizer_golden.npz")
    blended = blend_heatmap(img, hm)
    vis = Visualizer(["a", "b", "c"])
    bounded = vis.draw_mask_boundaries(img, masks,
                                       classes=np.array([0, 1]))
    semmap = vis.draw_semmap(np.array([[0, 1], [-1, 2]]), scale=2)
    g = np.load(golden_path)
    np.testing.assert_array_equal(blended, g["blended"])
    np.testing.assert_array_equal(bounded, g["bounded"])
    np.testing.assert_array_equal(semmap, g["semmap"])


def test_debug_dumps_write_files(tmp_path):
    from embodied_object_detection_tpu.demo.visualizer import (
        debug_train_dump, debug_test_dump)
    from embodied_object_detection_tpu.structures import Detections
    img, hm, _ = _golden_inputs()
    hms = [hm[..., None], hm[::2, ::2][..., None]]
    paths = debug_train_dump(img, hms, np.array([[4, 4, 20, 20]]),
                             np.array([1]), np.array([True]),
                             ["a", "b", "c"], str(tmp_path), "tr")
    assert len(paths) == 2 and all(p.endswith(".png") for p in paths)
    dets = Detections(boxes=np.array([[2.0, 2, 10, 10]]),
                      scores=np.array([0.9]), classes=np.array([2]),
                      valid=np.array([True]))
    paths = debug_test_dump(img, hms, dets, ["a", "b", "c"], str(tmp_path))
    assert len(paths) == 3
    import os
    for p in paths:
        assert os.path.getsize(p) > 0
