"""HTTP inference server: health, predict with persistent memory,
vocabulary swap, error handling."""

import json
import socket
import threading
import urllib.request

import numpy as np
import pytest

from embodied_object_detection_tpu.serve.server import make_server


class FakeDets:
    def __init__(self, n):
        self.boxes = np.tile([1.0, 2, 3, 4], (n, 1))
        self.scores = np.linspace(1, 0.5, n)
        self.classes = np.arange(n)
        self.valid = np.array([True] * (n - 1) + [False])


class FakePredictor:
    def __init__(self):
        self.calls = 0
        self.resets = 0
        self.zs = None

    def __call__(self, image, proj_indices=None):
        assert image.shape[-1] == 3
        self.calls += 1
        return FakeDets(3)

    def reset_memory(self):
        self.resets += 1

    def set_vocabulary(self, zs_weight, names=None):
        self.zs = zs_weight


def _post(url, payload, timeout=10):
    req = urllib.request.Request(
        url, json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture
def server():
    pred = FakePredictor()
    srv = make_server(pred, port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield pred, f"http://127.0.0.1:{port}"
    srv.shutdown()


def test_healthz(server):
    _, base = server
    with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
        assert json.loads(r.read()) == {"status": "ok"}


def test_predict_and_reset(server):
    pred, base = server
    img = np.zeros((4, 5, 3), np.uint8).tolist()
    code, out = _post(base + "/predict", {"image": img})
    assert code == 200
    assert len(out["boxes"]) == 2      # invalid row filtered
    assert out["classes"] == [0, 1]
    assert pred.calls == 1 and pred.resets == 0

    code, _ = _post(base + "/predict", {"image": img, "reset_memory": True})
    assert code == 200 and pred.resets == 1


def test_set_vocabulary(server):
    pred, base = server
    zs = np.ones((8, 4)).tolist()
    code, out = _post(base + "/set_vocabulary", {"zs_weight": zs})
    assert code == 200 and out["num_classes"] == 3
    assert pred.zs.shape == (8, 4)


def test_bad_request_is_400(server):
    _, base = server
    code, out = _post(base + "/predict", {"no_image": 1})
    assert code == 400 and "KeyError" in out["error"]
    code, _ = _post(base + "/nope", {})
    assert code == 404


def test_real_predictor_end_to_end():
    """Full stack: EmbodiedPredictor behind the HTTP server."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from common import tiny_config
    from embodied_object_detection_tpu.demo.predictor import (
        EmbodiedPredictor)
    cfg = tiny_config()
    pred = EmbodiedPredictor(cfg)
    srv = make_server(pred, port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        h, w = cfg.input.height, cfg.input.width
        img = np.random.RandomState(0).randint(
            0, 255, (h, w, 3)).astype(np.uint8).tolist()
        # first request compiles the frame step - generous timeout
        code, out = _post(f"http://127.0.0.1:{port}/predict",
                          {"image": img}, timeout=420)
        assert code == 200
        assert isinstance(out["boxes"], list)
        assert len(out["boxes"]) == len(out["scores"]) == len(out["classes"])
    finally:
        srv.shutdown()
