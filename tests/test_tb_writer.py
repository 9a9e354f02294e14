"""TensorBoard event writer: wire-format round-trip + crc integrity."""

import struct

import numpy as np
import pytest

from embodied_object_detection_tpu.utils import tb_writer


def test_scalar_roundtrip(tmp_path):
    with tb_writer.SummaryWriter(str(tmp_path)) as w:
        w.add_scalar("loss/total", 1.5, 0)
        w.add_scalars({"loss/total": 0.75, "lr": 1e-4}, 10)
        path = w.path
    events = list(tb_writer.read_events(path))
    assert events[0][0] == 0
    assert events[0][1]["loss/total"] == pytest.approx(1.5)
    step, scalars = events[1]
    assert step == 10
    assert scalars["loss/total"] == pytest.approx(0.75)
    assert scalars["lr"] == pytest.approx(1e-4)


def test_crc32c_known_vectors():
    # RFC 3720 test vector: crc32c of 32 zero bytes
    assert tb_writer._crc32c(b"\x00" * 32) == 0x8A9136AA
    assert tb_writer._crc32c(b"123456789") == 0xE3069283


def test_corrupt_record_detected(tmp_path):
    w = tb_writer.SummaryWriter(str(tmp_path))
    w.add_scalar("a", 1.0, 1)
    w.close()
    blob = bytearray(open(w.path, "rb").read())
    blob[-6] ^= 0xFF  # flip a payload byte
    bad = tmp_path / "bad"
    bad.write_bytes(bytes(blob))
    with pytest.raises(AssertionError):
        list(tb_writer.read_events(str(bad)))


def test_metrics_writer_emits_tb(tmp_path):
    from embodied_object_detection_tpu.engine.train import MetricsWriter
    mw = MetricsWriter(str(tmp_path), tensorboard=True)
    mw.write(3, {"total_loss": 2.0})
    import glob
    files = glob.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))
    assert len(files) == 1
    events = list(tb_writer.read_events(files[0]))
    assert events[0] == (3, {"total_loss": pytest.approx(2.0)})


def test_long_tag_roundtrip(tmp_path):
    """Value submessages >127 bytes need multi-byte length varints in the
    reader (regression: single-byte assumption desynced the parse)."""
    tag = "AP-" + "x" * 150
    with tb_writer.SummaryWriter(str(tmp_path)) as w:
        w.add_scalar(tag, 3.25, 7)
        path = w.path
    events = list(tb_writer.read_events(path))
    assert events[0] == (7, {tag: pytest.approx(3.25)})


def test_negative_step_roundtrip(tmp_path):
    """A negative step (sentinel/underflow) must encode as protobuf's
    10-byte two's-complement varint, not hang _varint's shift loop."""
    with tb_writer.SummaryWriter(str(tmp_path)) as w:
        w.add_scalar("a", 2.0, -1)
        path = w.path
    events = list(tb_writer.read_events(path))
    assert events[0] == (-1, {"a": pytest.approx(2.0)})
