"""Data layer + end-to-end eval protocol on a synthetic fixture."""

import dataclasses
import os

import numpy as np
import pytest

from embodied_object_detection_tpu.data import (
    EpisodeDataset, generate_synthetic_dataset, sort_episode_files)
from embodied_object_detection_tpu.data.episode_dataset import (
    parse_detection_record)

from common import tiny_config


def test_sort_episode_files():
    files = ["sceneB_lvl0_2.h5", "sceneA_lvl0_10.h5", "sceneA_lvl0_2.h5",
             "sceneA_lvl0_0.h5", "sceneB_lvl0_0.h5"]
    got = sort_episode_files(files)
    assert got == ["sceneA_lvl0_0.h5", "sceneA_lvl0_2.h5", "sceneA_lvl0_10.h5",
                   "sceneB_lvl0_0.h5", "sceneB_lvl0_2.h5"]


def test_parse_detection_record():
    rec = str({"file_name": "img_0.jpg", "image": 0,
               "gt_boxes": [[10.0, 20.0, 30.0, 40.0], [5.0, 5.0, 10.0, 10.0]],
               "gt_classes": [0, 1]})
    name, boxes, classes = parse_detection_record(rec)
    assert name == "img_0.jpg"
    # class 1 is not in CLASS_IDS -> filtered; xywh -> xyxy
    assert len(classes) == 1 and classes[0] == 0
    np.testing.assert_allclose(boxes[0], [10, 20, 40, 60])


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    generate_synthetic_dataset(root, num_scenes=1, chunks_per_scene=2,
                               frames=4, height=128, width=160,
                               map_h=8, map_w=8, seed=0)
    return root


def test_episode_dataset_loads(synth_root):
    ds = EpisodeDataset(synth_root, max_sequence_length=4, max_gt=8)
    assert len(ds) == 2
    chunk = ds[0]
    assert chunk.images.shape == (4, 128, 160, 3)
    assert chunk.proj_indices.shape == (4, 128, 160)
    assert chunk.num_cells == 64
    assert chunk.memory_reset[0]           # first chunk of scene resets
    assert not chunk.memory_reset[1:].any()
    chunk2 = ds[1]
    assert not chunk2.memory_reset.any()   # seq 1: no reset (default mode)
    assert chunk2.episode_start[0] and not chunk2.episode_start[1:].any()
    # at least one frame has GT
    assert chunk.gt_valid.any()


def test_episodic_mode_resets_every_chunk(synth_root):
    ds = EpisodeDataset(synth_root, test_type="episodic",
                        max_sequence_length=4, max_gt=8)
    for i in range(2):
        chunk = ds[i]
        assert chunk.memory_reset[0]
        assert not chunk.memory_reset[1:].any()


def test_longterm_doubles_files(synth_root):
    ds_default = EpisodeDataset(synth_root, max_sequence_length=4)
    ds_long = EpisodeDataset(synth_root, test_type="longterm",
                             max_sequence_length=4)
    assert len(ds_long) == 2 * len(ds_default)


@pytest.mark.slow
def test_full_eval_protocol(synth_root, tmp_path):
    import jax
    from embodied_object_detection_tpu.models.detector import build_detector
    from embodied_object_detection_tpu.engine import evaluate_dataset

    cfg = tiny_config()
    cfg = cfg.replace(
        output_dir=str(tmp_path),
        input=dataclasses.replace(cfg.input, height=128, width=160,
                                  max_sequence_length=4,
                                  score_every=2, max_gt_boxes=8),
        memory=dataclasses.replace(tiny_config().memory, save_semmap=True))
    model, params = build_detector(cfg, jax.random.PRNGKey(0))
    ds = EpisodeDataset(synth_root, max_sequence_length=4, max_gt=8)
    zs = np.random.RandomState(0).randn(cfg.roi.zs_weight_dim,
                                        cfg.roi.num_classes + 1).astype(np.float32)
    res = evaluate_dataset(model, params, cfg, ds, zs, verbose=False)
    assert res.num_images == 4              # 2 chunks x 2 scored frames
    assert "AP" in res.overall
    assert np.isfinite(res.overall["AP"]) or np.isnan(res.overall["AP"])
    assert res.timing["frames_per_s"] > 0

    # TEST_SAVE_SEMMAP interop: snapshots written in the reference h5 schema
    # and readable back through the SEMMAP_PATH loader path
    mem_dir = os.path.join(str(tmp_path), "memory")
    files = sorted(os.listdir(mem_dir))
    assert len(files) == 2
    ds2 = EpisodeDataset(synth_root, max_sequence_length=4, max_gt=8,
                         semmap_path=mem_dir)
    chunk = ds2[0]
    assert chunk.memory_features is not None
    assert chunk.memory_features.shape[1] == cfg.memory.memory_dim


def test_create_coco_annotations(synth_root, tmp_path):
    from embodied_object_detection_tpu.data.create_coco import (
        create_coco_annotations)
    out = str(tmp_path / "ann.json")
    coco = create_coco_annotations(synth_root, out, every=2)
    assert os.path.exists(out)
    # 2 chunks x 4 frames, every 2nd -> 4 images
    assert len(coco["images"]) == 4
    assert all(a["category_id"] in [c["id"] for c in coco["categories"]]
               for a in coco["annotations"])
    # interop: the json loads through the COCO dataset reader
    from embodied_object_detection_tpu.data.catalog import (
        CocoDetectionDataset, DatasetEntry)
    ds = CocoDetectionDataset(
        DatasetEntry(out, os.path.join(synth_root, "JPEGImages")),
        height=128, width=160, max_gt=8)
    item = ds[0]
    assert item["image"].shape == (128, 160, 3)


def test_trace_self_time_aggregation():
    """Nested-event self-time parsing (round-2 per-op attribution): the
    `while` umbrella must not absorb its children's time."""
    import importlib.util, os
    spec = importlib.util.spec_from_file_location(
        "trace_episode", os.path.join(os.path.dirname(__file__), "..",
                                      "tools", "trace_episode.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    trace = {"traceEvents": [
        # while umbrella [0, 100) with two children: fusion [10, 40),
        # gather [50, 80); fusion has its own child convolution [15, 25)
        dict(ph="X", pid=1, tid=1, name="while", ts=0, dur=100),
        dict(ph="X", pid=1, tid=1, name="fusion.1", ts=10, dur=30),
        dict(ph="X", pid=1, tid=1, name="convolution", ts=15, dur=10),
        dict(ph="X", pid=1, tid=1, name="gather.2", ts=50, dur=30),
        # a separate track must not interact
        dict(ph="X", pid=1, tid=2, name="fusion.9", ts=0, dur=7),
    ]}
    agg = mod.aggregate_self_time(trace)
    assert agg["while"] == 40           # 100 - 30 - 30
    assert agg["fusion"] == 27          # (30 - 10) + 7
    assert agg["convolution"] == 10
    assert agg["gather"] == 30


def test_chunk_proj_overflow_fails_loudly():
    """A scene whose map has more cells than memory.max_cells must raise at
    the host boundary — on device the read clips onto the last cell while
    the write scatter drops, silently corrupting instead of erroring."""
    import pytest
    from embodied_object_detection_tpu.data.episode_dataset import (
        EpisodeChunk)
    from embodied_object_detection_tpu.engine.eval import (
        chunk_to_frame_inputs)

    t, h, w, g = 2, 4, 6, 1
    proj = np.zeros((t, h, w), np.int32)
    proj[1, 2, 3] = 64                      # >= max_cells
    chunk = EpisodeChunk(
        sequence_name="s", file_names=["a", "b"],
        images=np.zeros((t, h, w, 3), np.uint8), proj_indices=proj,
        gt_boxes=np.zeros((t, g, 4), np.float32),
        gt_classes=np.zeros((t, g), np.int32),
        gt_valid=np.zeros((t, g), bool),
        memory_reset=np.array([True, False]),
        episode_start=np.array([True, False]), num_cells=64,
        frame_valid=np.ones((t,), bool))
    with pytest.raises(ValueError, match="max_cells"):
        chunk_to_frame_inputs(chunk, max_cells=64)
    # in-range passes
    proj[1, 2, 3] = 63
    chunk_to_frame_inputs(chunk, max_cells=64)


@pytest.mark.slow
def test_semantic_gt_baseline_eval(synth_root, tmp_path):
    """GT-memory baseline end-to-end (ref: loader.py:139-142, 233-246):
    the dataset carries the CLIP class table (zero row prepended, proj =
    per-pixel segmentation) and evaluate_dataset feeds it as the FIXED
    memory — and fails loudly when the table is missing instead of
    silently scoring an all-zero memory."""
    import jax
    import pytest
    from embodied_object_detection_tpu.engine import evaluate_dataset
    from embodied_object_detection_tpu.models.detector import build_detector

    cfg = tiny_config()
    cfg = cfg.replace(
        memory=dataclasses.replace(cfg.memory, memory_type="semantic_gt"),
        input=dataclasses.replace(cfg.input, max_sequence_length=4,
                                  score_every=2, max_gt_boxes=8))
    rng = np.random.RandomState(3)
    table = rng.randn(cfg.roi.num_classes, 512).astype(np.float32)
    clip_path = str(tmp_path / "table.npy")
    np.save(clip_path, table)

    ds = EpisodeDataset(synth_root, max_sequence_length=4, max_gt=8,
                        memory_type="semantic_gt", clip_path=clip_path)
    chunk = ds[0]
    assert chunk.memory_features is not None
    assert chunk.memory_features.shape == (cfg.roi.num_classes + 1, 512)
    np.testing.assert_allclose(chunk.memory_features[0], 0.0)
    np.testing.assert_allclose(chunk.memory_features[1:], table)

    model, params = build_detector(cfg, jax.random.PRNGKey(0))
    zs = rng.randn(cfg.roi.zs_weight_dim,
                   cfg.roi.num_classes + 1).astype(np.float32)
    res = evaluate_dataset(model, params, cfg, ds, zs, verbose=False)
    assert res.num_images == 4

    # a dataset built WITHOUT the table must raise, not score zeros
    ds_plain = EpisodeDataset(synth_root, max_sequence_length=4, max_gt=8)
    with pytest.raises(ValueError, match="external table"):
        evaluate_dataset(model, params, cfg, ds_plain, zs, verbose=False)


def test_map_gt_remaps_clip_table_rows(synth_root, tmp_path):
    """map_gt dialect resolution: reference-built (attr-less, low-id)
    semmap_gt row-remaps the CLIP table through SMNET_CLASS_MAPPING
    (loader.py:243-246); repo-built grids carry the class_space=lvis21 h5
    attr and index the zero-prepended table DIRECTLY (remapping those
    would read the wrong class embedding for nearly every cell); an
    explicit semmap_dialect override beats the attr."""
    import glob
    import shutil

    import h5py
    from embodied_object_detection_tpu.data.episode_dataset import (
        SMNET_CLASS_MAPPING)

    rng = np.random.RandomState(5)
    table = rng.randn(20, 512).astype(np.float32)
    clip_path = str(tmp_path / "t.npy")
    np.save(clip_path, table)
    full = np.concatenate([np.zeros((1, 512), np.float32), table])

    # 1) repo-built grid (synthetic writes class_space='lvis21'): even
    # with all ids < 13 the table stays unmapped
    ds = EpisodeDataset(synth_root, max_sequence_length=4, max_gt=8,
                        memory_type="map_gt", clip_path=clip_path)
    chunk = ds[0]
    np.testing.assert_allclose(chunk.memory_features, full)
    assert chunk.num_cells == full.shape[0]

    # 2) reference-built grid (no attr, ids < 13): the heuristic selects
    # the SMNet 13-row remap
    root = str(tmp_path / "refdata")
    shutil.copytree(synth_root, root)
    for p in glob.glob(os.path.join(root, "memory_data", "*.h5")):
        with h5py.File(p, "r+") as f:
            del f["semmap_gt"].attrs["class_space"]
    ds_ref = EpisodeDataset(root, max_sequence_length=4, max_gt=8,
                            memory_type="map_gt", clip_path=clip_path)
    chunk = ds_ref[0]
    np.testing.assert_allclose(chunk.memory_features,
                               full[SMNET_CLASS_MAPPING])
    assert chunk.num_cells == len(SMNET_CLASS_MAPPING)

    # 3) the explicit override beats the attr (both directions)
    ds_force = EpisodeDataset(synth_root, max_sequence_length=4, max_gt=8,
                              memory_type="map_gt", clip_path=clip_path,
                              semmap_dialect="smnet")
    np.testing.assert_allclose(ds_force[0].memory_features,
                               full[SMNET_CLASS_MAPPING])
    ds_force2 = EpisodeDataset(root, max_sequence_length=4, max_gt=8,
                               memory_type="map_gt", clip_path=clip_path,
                               semmap_dialect="lvis")
    np.testing.assert_allclose(ds_force2[0].memory_features, full)
    with pytest.raises(ValueError, match="semmap_dialect"):
        EpisodeDataset(root, semmap_dialect="bogus")
