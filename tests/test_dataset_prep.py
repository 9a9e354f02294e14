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


def test_merge_coco_into_lvis():
    lvis = {
        "categories": [{"id": 100, "name": "person", "synset": "person.n.01"},
                       {"id": 200, "name": "cat", "synset": "cat.n.01"}],
        "images": [{"id": 1, "coco_url": "http://x/000000000001.jpg",
                    "neg_category_ids": [200]}],
        "annotations": [{"id": 1, "image_id": 1, "category_id": 100,
                         "bbox": [10, 10, 20, 20]}],
    }
    coco = {
        "categories": [{"id": 1, "name": "person"}, {"id": 17, "name": "cat"}],
        "images": [{"id": 5, "file_name": "000000000001.jpg"}],
        "annotations": [
            # duplicate of the lvis person box (IoU 1) -> dropped
            {"id": 9, "image_id": 5, "category_id": 1,
             "bbox": [10, 10, 20, 20]},
            # distinct person box -> merged with remapped ids
            {"id": 10, "image_id": 5, "category_id": 1,
             "bbox": [100, 100, 30, 30]},
            # cat is in the image's neg_category_ids -> dropped
            {"id": 11, "image_id": 5, "category_id": 17,
             "bbox": [50, 50, 10, 10]},
        ],
    }
    merged = dataset_prep.merge_coco_into_lvis(coco, lvis)
    anns = merged["annotations"]
    assert len(anns) == 2
    boxes = sorted(a["bbox"][0] for a in anns)
    assert boxes == [10, 100]
    added = [a for a in anns if a["bbox"][0] == 100][0]
    assert added["category_id"] == 100 and added["image_id"] == 1


def test_imagenet_tar_json(tmp_path):
    import tarfile
    tdir = tmp_path / "tars"
    tdir.mkdir()
    for wnid, n in (("n001", 3), ("n002", 2)):
        with tarfile.open(tdir / f"{wnid}.tar", "w") as tf:
            for i in range(n):
                p = tmp_path / f"{wnid}_{i}.jpg"
                p.write_bytes(b"\xff\xd8fakejpeg")
                tf.add(p, arcname=f"{wnid}_{i}.jpg")
    out = dataset_prep.imagenet_tar_json(str(tdir), str(tmp_path / "ds.json"))
    assert len(out["images"]) == 5
    assert len(out["categories"]) == 2
    assert out["images"][0]["tar_index"] == 0
    assert out["images"][-1]["tar_index"] == 1
    assert out["images"][3]["pos_category_ids"] == [1]


def test_build_memory_semmap_gt_majority(tmp_path):
    """segmentation_data projects to per-cell majority classes (was
    silently discarded before)."""
    import h5py
    world = np.zeros((1, 2, 4, 3), np.float32)
    world[0, :, 2:, 0] = 1.0   # right half -> cell x=1 (res 1.0)
    seg = np.zeros((1, 2, 4), np.int32)
    seg[0, :, 2:] = 3          # right half is class 3
    src = tmp_path / "s.h5"
    with h5py.File(src, "w") as f:
        f.create_dataset("projection_indices", data=world)
        f.create_dataset("segmentation_data", data=seg)
    from embodied_object_detection_tpu.data.build_memory import (
        build_memory_file)
    w, h = build_memory_file(str(src), str(tmp_path / "m.h5"),
                             map_world_shift=np.zeros(3), resolution=1.0,
                             map_dims=(2, 1))
    with h5py.File(tmp_path / "m.h5") as f:
        gt = np.array(f["semmap_gt"])
    assert gt.tolist() == [0, 3]


def test_scene_of_longest_prefix():
    from embodied_object_detection_tpu.data.build_memory import _scene_of
    info = {"apartment": {}, "apartment_0": {}, "frl_apartment_1": {}}
    assert _scene_of("apartment_0_3.h5", info) == "apartment_0"
    assert _scene_of("frl_apartment_1_0.h5", info) == "frl_apartment_1"
    assert _scene_of("office_2_0.h5", info) is None


def test_merge_keeps_coco_anns_on_lvis_images_without_positives():
    lvis = {
        "categories": [{"id": 100, "name": "person",
                        "synset": "person.n.01"}],
        "images": [{"id": 1, "coco_url": "http://x/000000000001.jpg",
                    "neg_category_ids": []}],
        "annotations": [],          # federated image with no positives
    }
    coco = {
        "categories": [{"id": 1, "name": "person"}],
        "images": [{"id": 5, "file_name": "000000000001.jpg"}],
        "annotations": [{"id": 9, "image_id": 5, "category_id": 1,
                         "bbox": [10, 10, 20, 20]}],
    }
    merged = dataset_prep.merge_coco_into_lvis(coco, lvis)
    assert len(merged["annotations"]) == 1
    assert merged["annotations"][0]["image_id"] == 1


def test_cc_tags_mines_captions():
    """ref: Detic/tools/get_cc_tags.py:99-195 — synonyms (space-padded,
    underscore->space, parenthetical-stripped) substring-matched against
    captions; tag-less images dropped."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from dataset_prep import cc_tags, map_tag_name

    assert map_tag_name("aerosol_can") == "aerosol can"
    assert map_tag_name("flip-flop_(sandal)") == "flip-flop"

    cc = {
        "images": [
            {"id": 1, "file_name": "a.jpg",
             "captions": ["a red sports car on the road"]},
            {"id": 2, "file_name": "b.jpg",
             "captions": ["sunset over the ocean"]},
            {"id": 3, "file_name": "c.jpg",
             "captions": ["the automobile is parked", "a car again"]},
        ],
        "categories": [
            {"id": 7, "name": "car",
             "synonyms": ["car", "automobile"]},
            {"id": 9, "name": "dog", "synonyms": ["dog"]},
        ],
        "annotations": [],
    }
    out = cc_tags(cc)
    ids = {x["id"]: x["pos_category_ids"] for x in out["images"]}
    assert ids == {1: [7], 3: [7]}         # image 2 dropped (no tags)
    # keep_images retains tag-less rows; allcaps scans every caption
    out_keep = cc_tags(cc, keep_images=True)
    assert len(out_keep["images"]) == 3
    # default uses caption[0] only: image 3 matches via 'automobile'
    out_first = cc_tags(cc)
    assert 7 in ids[3]


def test_remove_rare_and_oriorder():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from dataset_prep import remove_rare, coco_zeroshot_oriorder
    lvis = {
        "categories": [{"id": 1, "frequency": "r"},
                       {"id": 2, "frequency": "f"}],
        "annotations": [{"id": 10, "category_id": 1},
                        {"id": 11, "category_id": 2}],
        "images": [],
    }
    out = remove_rare(lvis)
    assert [a["id"] for a in out["annotations"]] == [11]

    zs = {"categories": [{"id": 2}], "annotations": [], "images": []}
    full = [{"id": 1}, {"id": 2}, {"id": 3}]
    out2 = coco_zeroshot_oriorder(zs, full)
    assert out2["categories"] == full


def test_merge_keeps_cross_category_overlaps():
    """Only a SAME-category IoU>=thresh overlap is a duplicate
    (merge_lvis_coco.py:185-195): a COCO person box sitting on an LVIS cat
    box must be kept."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import dataset_prep
    lvis = {
        "categories": [{"id": 100, "name": "person", "synset": "person.n.01"},
                       {"id": 200, "name": "cat", "synset": "cat.n.01"}],
        "images": [{"id": 1, "coco_url": "http://x/000000000001.jpg",
                    "neg_category_ids": []}],
        "annotations": [{"id": 1, "image_id": 1, "category_id": 200,
                         "bbox": [10, 10, 20, 20]}],   # LVIS cat
    }
    coco = {
        "categories": [{"id": 1, "name": "person"}],
        "images": [{"id": 5, "file_name": "000000000001.jpg"}],
        # same box, DIFFERENT category -> kept (cross-category overlap)
        "annotations": [{"id": 9, "image_id": 5, "category_id": 1,
                         "bbox": [10, 10, 20, 20]}],
    }
    merged = dataset_prep.merge_coco_into_lvis(coco, lvis)
    cats = sorted(a["category_id"] for a in merged["annotations"])
    assert cats == [100, 200]


def test_cc_tags_expands_coco_categories_to_lvis_synonyms():
    """COCO-style category tables (no 'synonyms' field) are expanded
    coco_cat_id -> synset -> LVIS synonyms (get_cc_tags.py:126-133) so
    e.g. 'tv' matches 'television'."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from dataset_prep import cc_tags

    cc = {
        "images": [{"id": 1, "file_name": "a.jpg",
                    "captions": ["an old tv set in the corner"]}],
        "annotations": [],
    }
    # COCO category id 72 is 'tv' (synset television_receiver.n.01 ->
    # LVIS synonyms television_set / tv / tv_set); a bare-name fallback
    # would still match 'tv' here, so assert the expansion itself too
    out = cc_tags(cc, categories=[{"id": 72, "name": "tv"}])
    syns = out["categories"][0]["synonyms"]
    assert "television_set" in syns, syns
    assert out["images"] and out["images"][0]["pos_category_ids"] == [72]
