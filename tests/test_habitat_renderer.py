"""HabitatRenderer contract test against a fake `habitat` module.

The real habitat-sim is external C++ (absent in-env, SURVEY §7.8); the
adapter is validated against a minimal fake implementing the exact API it
consumes (get_config / sims.make_sim / semantic_annotations / render /
set_agent_state, ref: SMNet/utils/habitat_utils.py:22-62, 197, 346-348) and
then driven through the unchanged build_data pipeline.
"""

import sys
import types

import numpy as np
import pytest


# ---------------------------------------------------------------- fake API

class _Node(dict):
    """yacs-lite: attribute access + defrost/freeze no-ops."""
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    def __setattr__(self, k, v):
        self[k] = v

    def defrost(self):
        pass

    def freeze(self):
        pass


class _Category:
    def __init__(self, mpcat40, raw=None):
        self._names = {"mpcat40": mpcat40, "raw": raw or mpcat40}

    def name(self, mapping="mpcat40"):
        return self._names[mapping]


class _SemObject:
    def __init__(self, oid, mpcat40, raw=None):
        self.id = f"scene_region_{oid}"
        self.category = _Category(mpcat40, raw)


class FakeSim:
    """Scene: instance-id buffer with a bed (id 1), a 'furniture' whose raw
    name is shelving (id 2, exercises USE_FINE), and a wall (id 3, not an
    lvis class). Depth is a constant 2 m plane."""

    def __init__(self, config):
        self.config = config
        h = config.RGB_SENSOR.HEIGHT
        w = config.RGB_SENSOR.WIDTH
        self.h, self.w = h, w
        self.states = []
        sem = np.zeros((h, w), np.int32)
        sem[h // 4: h // 2, w // 8: w // 2] = 1           # bed, big
        sem[h // 2: 3 * h // 4, w // 2: 7 * w // 8] = 2   # shelving, big
        sem[0:2, 0:2] = 3                                  # wall, tiny
        self.sem = sem

        class _Annotations:
            objects = [None,
                       _SemObject(1, "bed"),
                       _SemObject(2, "furniture", raw="shelving"),
                       _SemObject(3, "wall")]
        self._annotations = _Annotations()

    def semantic_annotations(self):
        return self._annotations

    def reset(self):
        self.did_reset = True

    def set_agent_state(self, position, rotation):
        assert len(position) == 3 and len(rotation) == 4
        self.states.append((list(position), list(rotation)))

    def get_agent_state(self):
        """habitat AgentState surface: sensor_states['depth'] carries the
        SENSOR pose (~1.25 m above the agent) the projection needs."""
        pos, rot = self.states[-1]

        class _Q:
            x, y, z, w = rot

        class _Sensor:
            position = np.asarray(pos) + np.asarray([0.0, 1.25, 0.0])
            rotation = _Q

        class _State:
            sensor_states = {"depth": _Sensor}
        return _State

    def render(self, mode="rgb"):
        if mode == "rgb":
            rgba = np.zeros((self.h, self.w, 4), np.uint8)
            rgba[..., 0] = 17
            rgba[..., 3] = 255
            return rgba
        if mode == "depth":
            return np.full((self.h, self.w, 1), 2.0, np.float32)
        if mode == "semantic":
            return self.sem
        raise ValueError(mode)

    def sample_navigable_point(self):
        return [0.0, 0.5, 0.0]

    def step(self, action):
        return {}

    def close(self):
        self.closed = True


@pytest.fixture
def fake_habitat(monkeypatch):
    def get_config():
        sensors = {s: _Node(HEIGHT=0, WIDTH=0)
                   for s in ("RGB_SENSOR", "DEPTH_SENSOR", "SEMANTIC_SENSOR")}
        sim = _Node(TYPE="Sim-v0", SCENE="", AGENT_0=_Node(SENSORS=[]),
                    FORWARD_STEP_SIZE=0.25, TURN_ANGLE=10, **sensors)
        return _Node(SIMULATOR=sim)

    made = {}

    def make_sim(id_sim, config):
        assert id_sim == "Sim-v0"
        made["sim"] = FakeSim(config)
        return made["sim"]

    habitat = types.ModuleType("habitat")
    habitat.get_config = get_config
    sims = types.ModuleType("habitat.sims")
    sims.make_sim = make_sim
    habitat.sims = sims
    monkeypatch.setitem(sys.modules, "habitat", habitat)
    monkeypatch.setitem(sys.modules, "habitat.sims", sims)
    return made


# ------------------------------------------------------------------- tests

def test_renderer_contract(fake_habitat):
    from embodied_object_detection_tpu.data.habitat_renderer import (
        HabitatRenderer)
    r = HabitatRenderer("scenes/h/h.glb", height=64, width=96)
    sim = fake_habitat["sim"]
    assert sim.config.SCENE == "scenes/h/h.glb"
    assert set(sim.config.AGENT_0.SENSORS) == {
        "RGB_SENSOR", "DEPTH_SENSOR", "SEMANTIC_SENSOR"}
    assert sim.config.RGB_SENSOR.HEIGHT == 64
    assert sim.did_reset

    # euler rotation realized as a +Y heading quaternion
    r.set_agent_state([1.0, 0.5, -2.0], [0.1, np.pi / 2, 0.0])
    pos, quat = sim.states[-1]
    assert pos == [1.0, 0.5, -2.0]
    np.testing.assert_allclose(quat, [0, np.sin(np.pi / 4), 0,
                                      np.cos(np.pi / 4)], atol=1e-12)
    # a 4-vector passes through verbatim
    r.set_agent_state([0, 0, 0], [0.0, 1.0, 0.0, 0.0])
    assert sim.states[-1][1] == [0.0, 1.0, 0.0, 0.0]

    rgb = r.render_rgb()
    assert rgb.shape == (64, 96, 3) and rgb.dtype == np.uint8   # alpha gone
    depth = r.render_depth()
    assert depth.shape == (64, 96) and np.allclose(depth, 2.0)

    sem = r.render_semantic()
    # bed -> lvis idx 0 -> class 1; shelving (via USE_FINE) -> idx 10 -> 11
    assert set(np.unique(sem)) == {0, 1, 11}

    boxes = r.render_boxes()
    by_id = {b["id"]: b for b in boxes}
    assert set(by_id) == {0, 10}        # wall excluded (not an lvis class)
    x0, y0, x1, y1 = by_id[0]["box"]
    assert (x0, y0, x1, y1) == (96 // 8, 64 // 4, 96 // 2 - 1, 64 // 2 - 1)
    assert by_id[0]["bbox"] == [x0, y0, x1 - x0, y1 - y0]   # ref xywh record


def test_build_data_runs_unchanged_with_habitat_renderer(fake_habitat,
                                                         tmp_path):
    """`build_sample_h5` consumes HabitatRenderer exactly like the synthetic
    backend — the drop-in criterion from VERDICT r2 missing #3."""
    import h5py
    from embodied_object_detection_tpu.data.build_data import build_sample_h5
    from embodied_object_detection_tpu.data.habitat_renderer import (
        HabitatRenderer)

    r = HabitatRenderer("scenes/h/h.glb", height=64, width=96)
    t = 3
    positions = np.tile(np.asarray([[0.0, 1.0, 0.0]], np.float32), (t, 1))
    rotations = np.stack([np.asarray([0.0, 0.3 * i, 0.0], np.float32)
                          for i in range(t)])
    out = tmp_path / "env_0.h5"
    stats = build_sample_h5(r, positions, rotations, str(out), min_box_edge=5)
    assert stats["frames"] == t

    with h5py.File(out) as f:
        assert f["rgb"].shape == (t, 64, 96, 3)
        assert f["depth"].shape == (t, 64, 96)
        assert f["projection_indices"].shape == (t, 64, 96, 3)
        dets = [eval(s) for s in f["detection_data"][()]]
    assert sorted(dets[0]["gt_classes"]) == [0, 10]
    assert len(dets[0]["gt_boxes"]) == 2


def test_build_data_cli_habitat_backend(fake_habitat, tmp_path):
    """`build_data.main --renderer habitat` resolves the reference's
    <root>/habitat_data/v1/tasks/mp3d/<house>/<house>.glb scene layout
    (SMNet/build_data.py:132) from the '<house>_<level>' env name and
    drives the adapter end-to-end."""
    import json
    import os
    from embodied_object_detection_tpu.data.build_data import main

    paths = {"houseA_0": {
        "positions": [[0.0, 1.0, 0.0]] * 4,
        "orientations": [[0.0, 0.2 * i, 0.0] for i in range(4)],
    }}
    pj = tmp_path / "paths.json"
    pj.write_text(json.dumps(paths))
    out = tmp_path / "out"
    out.mkdir()
    main(["--paths-json", str(pj), "--output-dir", str(out),
          "--renderer", "habitat", "--scene-data-path", str(tmp_path),
          "--samples-per-env", "1", "--frames-per-sample", "3"])

    sim = fake_habitat["sim"]
    assert sim.config.SCENE == str(
        tmp_path / "habitat_data" / "v1" / "tasks" / "mp3d" / "houseA" /
        "houseA.glb")
    assert os.path.exists(out / "houseA_0_0.h5")
