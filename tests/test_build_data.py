"""build_data.py analog: renderer-driven sensor-h5 generation chained into
the memory builder (ref: SMNet/build_data.py:56-292 +
build_memory_data.py)."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")


def test_build_sample_and_memory_chain(tmp_path):
    from embodied_object_detection_tpu.data.build_data import (
        build_env_samples, detection_record_str)
    from embodied_object_detection_tpu.data.build_memory import (
        build_memory_file)
    from embodied_object_detection_tpu.data.synthetic import SyntheticRenderer
    from embodied_object_detection_tpu.data.episode_dataset import (
        parse_detection_record)

    t = 4
    renderer = SyntheticRenderer(height=64, width=96, seed=0)
    path = dict(
        positions=[[0.1 * i, 1.2, 0.0] for i in range(t + 2)],
        orientations=[[0.0, 0.05 * i, 0.0] for i in range(t + 2)])
    files = build_env_samples(renderer, "env0", path, str(tmp_path),
                              nb_samples=2, nb_frames=t)
    assert len(files) == 2

    with h5py.File(files[0], "r") as f:
        assert f["rgb"].shape == (t, 64, 96, 3)
        assert f["depth"].shape == (t, 64, 96)
        assert f["projection_indices"].shape == (t, 64, 96, 3)
        assert f["masks_outliers"].shape == (t, 64, 96)
        assert f["segmentation_data"].shape == (t, 64, 96)
        recs = [r.decode() if isinstance(r, bytes) else r
                for r in f["detection_data"][...]]
        assert len(recs) == t
        # the stringified GT parses with the loader's parser
        fname, boxes, classes = parse_detection_record(recs[0])
        assert fname.endswith(".jpg")
        assert boxes.shape[1:] == (4,)
        # world coords move with the camera: frames differ
        w0 = np.array(f["projection_indices"][0])
        w1 = np.array(f["projection_indices"][t - 1])
        assert not np.allclose(w0, w1)

    # chain into the memory builder
    map_w, map_h = build_memory_file(files[0], str(tmp_path / "mem.h5"))
    with h5py.File(str(tmp_path / "mem.h5"), "r") as f:
        proj = np.array(f["proj_indices"])
        assert proj.min() >= 0 and proj.max() < map_w * map_h
        assert f["memory_features"].shape == (map_h * map_w, 512)


def test_detection_record_roundtrip():
    from embodied_object_detection_tpu.data.build_data import (
        detection_record_str)
    from embodied_object_detection_tpu.data.episode_dataset import (
        parse_detection_record)
    s = detection_record_str("f.jpg", [[1, 2, 30, 40], [5, 6, 70, 80]],
                             [3, 7])
    fname, boxes, classes = parse_detection_record(s)
    assert fname == "f.jpg"
    np.testing.assert_allclose(boxes, [[1, 2, 30, 40], [5, 6, 70, 80]])
    assert list(classes) == [3, 7]
