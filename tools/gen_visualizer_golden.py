"""Regenerate tests/golden/visualizer_golden.npz (text-free renders only —
cv2 text rasterization could vary across builds; boxes/labels are covered
structurally in test_visualizer.py)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np
from test_visualizer import _golden_inputs
from embodied_object_detection_tpu.demo.visualizer import (
    Visualizer, blend_heatmap)

img, hm, masks = _golden_inputs()
vis = Visualizer(["a", "b", "c"])
out = dict(
    blended=blend_heatmap(img, hm),
    bounded=vis.draw_mask_boundaries(img, masks, classes=np.array([0, 1])),
    semmap=vis.draw_semmap(np.array([[0, 1], [-1, 2]]), scale=2),
)
path = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                    "visualizer_golden.npz")
np.savez(path, **out)
print("wrote", path)
