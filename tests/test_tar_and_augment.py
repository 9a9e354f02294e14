"""Tar ImageNet dataset + EfficientDetResizeCrop + multi-source mapper
(ref: tar_dataset.py, custom_augmentation_impl.py:25-60,
custom_dataset_mapper.py:23-130) driven end-to-end on synthetic fixtures."""

import gzip
import io
import os
import tarfile

import numpy as np
import pytest
from PIL import Image

from embodied_object_detection_tpu.data.tar_dataset import (
    DiskTarDataset, build_tar_index)
from embodied_object_detection_tpu.data.augment import (
    MultiSourceMapper, apply_resize_crop_boxes, apply_resize_crop_image,
    inverse_apply_resize_crop_boxes, sample_efficientdet_resize_crop)


def _make_tar(path, images, gzip_last=False):
    with tarfile.open(path, "w") as tf:
        for i, img in enumerate(images):
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format="JPEG")
            data = buf.getvalue()
            if gzip_last and i == len(images) - 1:
                data = gzip.compress(data)
            info = tarfile.TarInfo(name=f"synset/img_{i}.JPEG")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))


@pytest.fixture
def tar_fixture(tmp_path, rng):
    idx_dir = str(tmp_path / "tarindex_npy")
    tars = []
    for s in range(3):
        imgs = [np.full((32, 48, 3), 40 * s + 10 * i, np.uint8)
                for i in range(2 + s)]
        p = str(tmp_path / f"synset{s}.tar")
        _make_tar(p, imgs, gzip_last=(s == 2))
        build_tar_index(p, idx_dir)
        tars.append(p)
    tf_path = str(tmp_path / "tar_files.npy")
    np.save(tf_path, np.asarray(tars))
    return tf_path, idx_dir


def test_disk_tar_dataset(tar_fixture):
    tf_path, idx_dir = tar_fixture
    ds = DiskTarDataset(tf_path, idx_dir)
    assert len(ds) == 2 + 3 + 4
    img0, label0, _ = ds[0]
    assert label0 == 0 and img0.size == (48, 32)
    # chunk routing: first sample of synset 1 is global index 2
    _, label2, _ = ds[2]
    assert label2 == 1
    # gzip-wrapped member decodes (last image of synset 2)
    img_gz, label_gz, _ = ds[len(ds) - 1]
    assert label_gz == 2
    np.testing.assert_allclose(np.asarray(img_gz).mean(),
                               40 * 2 + 10 * 3, atol=3)


def test_resize_crop_geometry(rng):
    img = np.zeros((100, 200, 3), np.uint8)
    img[40:60, 80:120] = 255
    p = sample_efficientdet_resize_crop((100, 200), 64, (0.5, 0.5), rng)
    # deterministic: f=0.5 -> target 32; img_scale = min(32/100, 32/200)=0.16
    assert abs(p.img_scale - 0.16) < 1e-9
    assert p.scaled_h == 16 and p.scaled_w == 32
    assert p.offset_x == 0 and p.offset_y == 0  # scaled < target, no crop
    out = apply_resize_crop_image(img, p)
    assert out.shape == (16, 32, 3)
    boxes = apply_resize_crop_boxes(np.array([[80, 40, 120, 60]]), p)
    np.testing.assert_allclose(boxes, [[12.8, 6.4, 19.2, 9.6]], atol=1e-5)
    back = inverse_apply_resize_crop_boxes(boxes, p)
    np.testing.assert_allclose(back, [[80, 40, 120, 60]], atol=1e-4)


def test_resize_crop_offsets_when_upscaled():
    rng = np.random.RandomState(1)
    # scale 2.0 on a 64-target: scaled image 128 > target -> random offsets
    p = sample_efficientdet_resize_crop((100, 100), 64, (2.0, 2.0), rng)
    assert p.scaled_h == 128 and p.scaled_w == 128
    assert 0 <= p.offset_y <= 64 and 0 <= p.offset_x <= 64
    img = np.arange(100 * 100 * 3, dtype=np.uint8).reshape(100, 100, 3)
    out = apply_resize_crop_image(img, p)
    assert out.shape == (64, 64, 3)


def test_multi_source_mapper_box_and_image(tar_fixture, rng):
    tf_path, idx_dir = tar_fixture
    tar_ds = DiskTarDataset(tf_path, idx_dir)
    mapper = MultiSourceMapper(
        dataset_scales=[(0.5, 1.5), (0.5, 1.5)],
        dataset_sizes=[96, 64], dataset_ann=["box", "image"],
        max_gt=8, max_labels=4, tar_dataset=tar_ds)

    rec = dict(image=rng.randint(0, 255, (80, 120, 3)).astype(np.uint8),
               gt_boxes=np.array([[10, 10, 60, 50]], np.float32),
               gt_classes=np.array([3]))
    out = mapper(rec, source=0)
    assert out["image"].shape == (96, 96, 3)
    assert out["gt_valid"].sum() == 1
    assert out["gt_classes"][0] == 3
    assert out["ann_type"] == "box"

    # labels come from the dataset RECORD only — the reference mapper
    # discards the tar synset index ('ori_image, _, _',
    # custom_dataset_mapper.py:93), which lives in a different label space
    out2 = mapper(dict(tar_index=2, pos_category_ids=[1]), source=1)
    assert out2["image"].shape == (64, 64, 3)
    assert out2["labels_valid"].sum() == 1
    assert out2["labels"][0] == 1
    assert out2["ann_type"] == "image"
    # a record without pos_category_ids trains with NO tag labels
    out3 = mapper(dict(tar_index=2), source=1)
    assert out3["labels_valid"].sum() == 0


def test_mapper_feeds_weak_trainer(tar_fixture, rng):
    """The weak-supervision trainer consumes a tar fixture end-to-end
    (VERDICT r1 #7 'done' criterion)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from common import tiny_config
    from embodied_object_detection_tpu.models.detector import (
        EmbodiedDetector, build_detector)

    tf_path, idx_dir = tar_fixture
    tar_ds = DiskTarDataset(tf_path, idx_dir)
    cfg = tiny_config()
    h, w = cfg.input.height, cfg.input.width
    mapper = MultiSourceMapper(dataset_scales=[(1.0, 1.0)],
                               dataset_sizes=[max(h, w)],
                               dataset_ann=["image"], max_labels=4,
                               tar_dataset=tar_ds)
    frame = mapper(dict(tar_index=0), source=0)
    model, params = build_detector(cfg, jax.random.PRNGKey(0))
    img = jnp.asarray(frame["image"][:h, :w].astype(np.float32))
    zs = jnp.asarray(rng.randn(cfg.roi.zs_weight_dim,
                               cfg.roi.num_classes + 1).astype(np.float32))
    losses = model.apply(params, img, zs,
                         jnp.asarray(frame["labels"]),
                         jnp.asarray(frame["labels_valid"]),
                         variant="max_size",
                         method=EmbodiedDetector.frame_train_weak)
    assert all(np.isfinite(float(jnp.sum(v))) for v in losses.values())


@pytest.mark.parametrize("fmt", [tarfile.PAX_FORMAT, tarfile.GNU_FORMAT])
def test_long_name_members_decode(tmp_path, fmt):
    """>100-char member names force a pax 'x' extended header (Python
    tarfile's DEFAULT format) or a GNU LongLink record; the payload walker
    must skip the meta records — treating them as the payload makes PIL
    fail and silently substitutes the gray -1 placeholder."""
    long_dir = "n" * 120
    vals = (77, 200)
    p = str(tmp_path / "longname.tar")
    with tarfile.open(p, "w", format=fmt) as tf:
        for i, v in enumerate(vals):
            buf = io.BytesIO()
            Image.fromarray(np.full((16, 24, 3), v, np.uint8)).save(
                buf, format="JPEG")
            data = buf.getvalue()
            info = tarfile.TarInfo(name=f"{long_dir}/img_{i}.JPEG")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    idx_dir = str(tmp_path / "idx")
    build_tar_index(p, idx_dir)
    tf_path = str(tmp_path / "tars.npy")
    np.save(tf_path, np.asarray([p]))

    ds = DiskTarDataset(tf_path, idx_dir)
    assert len(ds) == 2
    for i, expect in enumerate(vals):
        img, label, _ = ds[i]
        assert label == 0, "decode failure placeholder (-1) returned"
        np.testing.assert_allclose(np.asarray(img).mean(), expect, atol=3)
