"""End-to-end robot_demo smoke: RGB-D + pose stream -> annotated frames +
live semantic map (the ref robot_demo.py pipeline, headless)."""

import os

import numpy as np
import pytest


@pytest.mark.slow
def test_robot_demo_end_to_end(tmp_path):
    import cv2
    root = str(tmp_path / "robot")
    os.makedirs(root + "/rgb")
    os.makedirs(root + "/depth")
    rng = np.random.RandomState(0)
    with open(root + "/poses.txt", "w") as f:
        for i in range(3):
            t = 100.0 + i * 0.1
            img = rng.randint(0, 255, (128, 160, 3)).astype(np.uint8)
            cv2.imwrite(f"{root}/rgb/{t:.3f}.jpg", img)
            depth = (rng.rand(128, 160) * 3000 + 500).astype(np.float32)
            np.save(f"{root}/depth/{t:.3f}.npy", depth)
            f.write(f"{t:.3f} {0.1 * i} 1.2 0.0 {0.05 * i} 0.0\n")

    out = str(tmp_path / "out")
    from embodied_object_detection_tpu.demo.robot_demo import main
    main(["--data-dir", root, "--output", out, "--stride", "1",
          "--map-cells", "16",
          "--opts", "input.height=128", "input.width=160",
          "centernet.pre_nms_topk_test=128", "centernet.post_nms_topk_test=32",
          "roi.detections_per_image=16", "roi.num_classes=5",
          "memory.write_topk=8", "compute_dtype=float32"])
    files = sorted(os.listdir(out))
    assert "frame_00000.jpg" in files and "map_00002.png" in files
    m = cv2.imread(os.path.join(out, "map_00002.png"))
    assert m.shape == (32, 32, 3)
