"""Dataset-prep tools: cat-info counts, replica map shifts, clip export."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import dataset_prep  # noqa: E402

from embodied_object_detection_tpu.data.build_memory import (  # noqa: E402
    build_dataset_memories, map_shift_from_info)


def test_cat_info_counts_and_freq(tmp_path):
    ann = {
        "categories": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"},
                       {"id": 3, "name": "c"}],
        "annotations": ([{"category_id": 1, "image_id": i} for i in range(200)]
                        + [{"category_id": 2, "image_id": i}
                           for i in range(50)]
                        + [{"category_id": 3, "image_id": 0},
                           {"category_id": 3, "image_id": 0}]),
    }
    path = tmp_path / "ann.json"
    path.write_text(json.dumps(ann))
    cats = dataset_prep.cat_info(str(path), add_freq=True)
    by_id = {c["id"]: c for c in cats}
    assert by_id[1]["image_count"] == 200 and by_id[1]["frequency"] == "f"
    assert by_id[2]["image_count"] == 50 and by_id[2]["frequency"] == "c"
    # two annotations on the same image -> image_count 1, rare bucket
    assert by_id[3]["image_count"] == 1 and by_id[3]["frequency"] == "r"
    assert by_id[3]["instance_count"] == 2
    out = json.loads((tmp_path / "ann_cat_info.json").read_text())
    assert len(out) == 3


def test_map_shift_mp3d_vs_replica():
    mp3d = {"env1": {"map_world_shift": [1.5, 0.0, -2.0]}}
    rep = {"env1": {"x_min": 3.0, "y_min": 7.0}}
    np.testing.assert_allclose(map_shift_from_info("env1", mp3d, "mp3d"),
                               [1.5, 0.0, -2.0])
    np.testing.assert_allclose(map_shift_from_info("env1", rep, "replica"),
                               [2.0, 0.0, 6.0])


def test_build_dataset_memories_replica_driver(tmp_path):
    import h5py
    sensor = tmp_path / "sensors"
    out = tmp_path / "mem"
    sensor.mkdir()
    rng = np.random.RandomState(0)
    world = rng.uniform(3.0, 6.0, (2, 8, 10, 3)).astype(np.float32)
    with h5py.File(sensor / "envA_0.h5", "w") as f:
        f.create_dataset("projection_indices", data=world)
    info = {"envA": {"x_min": 3.0, "y_min": 3.0}}
    info_path = tmp_path / "replica_map_info.json"
    info_path.write_text(json.dumps(info))
    dims = build_dataset_memories(str(sensor), str(out),
                                  map_info_json=str(info_path),
                                  dataset="replica", resolution=0.2)
    assert "envA_0.h5" in dims
    with h5py.File(out / "envA_0.h5") as f:
        proj = np.array(f["proj_indices"])
        assert proj.min() >= 0
        # shift = (2, 0, 2): world x in [3,6] -> (x-2)/0.2 in [5, 20]
        map_w = dims["envA_0.h5"][0]
        xs = proj.reshape(-1) % map_w
        assert xs.min() >= 5


def test_clip_features_with_stub_encoder(tmp_path):
    names = ["chair", "table"]
    calls = {}

    def encoder(texts):
        calls["texts"] = texts
        return np.ones((len(texts), 512), np.float32)

    out = tmp_path / "zs.npy"
    emb = dataset_prep.clip_features(names, str(out), encoder=encoder)
    assert calls["texts"] == ["a chair", "a table"]
    assert emb.shape == (2, 512)
    assert np.load(out).shape == (2, 512)
