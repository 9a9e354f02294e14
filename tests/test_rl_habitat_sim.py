"""rl.habitat_sim.HabitatSim contract test against a fake `habitat` module.

The fake implements habitat-sim SEMANTICS (3-D agent state, yaw about +Y
with forward = local -Z, discrete step actions, geodesic via euclidean) so
the test verifies the adapter's convention conversions — yaw <-> nav
heading, 3-D <-> nav-plane positions, left/right action mapping — and then
drives the UNCHANGED PointNav task/Env stack end-to-end over the adapter
(the drop-in criterion). ref: habitat_simulator.py:368 (HabitatSim).
"""

import math
import sys
import types

import numpy as np
import pytest


class _Node(dict):
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


class _State:
    def __init__(self, position, rotation):
        self.position = list(position)
        self.rotation = list(rotation)      # [x, y, z, w]


class FakeNavSim:
    """habitat-sim semantics on an open plane: yaw about +Y, forward -Z."""

    def __init__(self, config):
        self.config = config
        self.pos = [0.0, 0.88, 0.0]
        self.yaw = 0.0
        self.previous_step_collided = False
        self.forward_step = config.FORWARD_STEP_SIZE
        self.turn_rad = math.radians(config.TURN_ANGLE)
        h = config.RGB_SENSOR.HEIGHT
        w = config.RGB_SENSOR.WIDTH
        self._rgb = np.full((h, w, 4), 9, np.uint8)
        self._depth = np.full((h, w, 1), 3.0, np.float32)

    def _obs(self):
        return {"rgb": self._rgb, "depth": self._depth}

    def reset(self):
        return self._obs()

    def set_agent_state(self, position, rotation):
        self.pos = list(position)
        x, y, z, w = rotation
        self.yaw = 2.0 * math.atan2(y, w)

    def get_agent_state(self):
        return _State(self.pos, [0.0, math.sin(self.yaw / 2), 0.0,
                                 math.cos(self.yaw / 2)])

    def step(self, action):
        if action == 1:      # MOVE_FORWARD along local -Z rotated by yaw
            self.pos[0] += -math.sin(self.yaw) * self.forward_step
            self.pos[2] += -math.cos(self.yaw) * self.forward_step
        elif action == 2:    # TURN_LEFT: +yaw
            self.yaw += self.turn_rad
        elif action == 3:    # TURN_RIGHT
            self.yaw -= self.turn_rad
        else:
            raise ValueError(action)
        return self._obs()

    def geodesic_distance(self, position, goals):
        return min(float(np.linalg.norm(np.asarray(position) -
                                        np.asarray(g))) for g in goals)

    def is_navigable(self, pos):
        return abs(pos[0]) < 50 and abs(pos[2]) < 50

    def sample_navigable_point(self):
        return [1.0, 0.88, -2.0]

    def seed(self, s):
        self.seeded = s

    def close(self):
        self.closed = True


@pytest.fixture
def fake_habitat(monkeypatch):
    def get_config():
        sensors = {s: _Node(HEIGHT=0, WIDTH=0)
                   for s in ("RGB_SENSOR", "DEPTH_SENSOR")}
        sim = _Node(TYPE="Sim-v0", SCENE="", AGENT_0=_Node(SENSORS=[]),
                    FORWARD_STEP_SIZE=0.25, TURN_ANGLE=10, **sensors)
        return _Node(SIMULATOR=sim)

    made = {}

    def make_sim(id_sim, config):
        made["sim"] = FakeNavSim(config)
        return made["sim"]

    habitat = types.ModuleType("habitat")
    habitat.get_config = get_config
    sims = types.ModuleType("habitat.sims")
    sims.make_sim = make_sim
    habitat.sims = sims
    monkeypatch.setitem(sys.modules, "habitat", habitat)
    monkeypatch.setitem(sys.modules, "habitat.sims", sims)
    return made


def test_state_and_motion_conventions(fake_habitat):
    from embodied_object_detection_tpu.rl.core import Episode
    from embodied_object_detection_tpu.rl.habitat_sim import HabitatSim

    sim = HabitatSim("scenes/x.glb", height=16, width=24)
    ep = Episode(episode_id="0", scene_id="scenes/x.glb",
                 start_position=np.asarray([2.0, -1.0], np.float32),
                 start_rotation=0.7)
    sim.reset(ep)
    st = sim.get_agent_state()
    np.testing.assert_allclose(st.position, [2.0, -1.0], atol=1e-6)
    assert abs((st.rotation - 0.7 + np.pi) % (2 * np.pi) - np.pi) < 1e-6

    # forward motion follows the NAV convention: delta == step * [cos h, sin h]
    p0 = sim.get_agent_state().position.copy()
    sim.move_forward()
    d = sim.get_agent_state().position - p0
    np.testing.assert_allclose(
        d, 0.25 * np.asarray([np.cos(0.7), np.sin(0.7)]), atol=1e-6)

    # turn(+1) increases the nav heading by TURN_ANGLE (GridSimulator parity)
    h0 = sim.get_agent_state().rotation
    sim.turn(+1)
    h1 = sim.get_agent_state().rotation
    assert abs((h1 - h0 - math.radians(10) + np.pi) % (2 * np.pi) - np.pi) \
        < 1e-6

    # rendering drops alpha; depth keeps the [H, W, 1] channel the
    # GridSimulator contract (DepthSensor space, RolloutStorage) requires
    assert sim.render_rgb().shape == (16, 24, 3)
    assert sim.render_depth().shape == (16, 24, 1)
    # geodesic on the nav plane
    assert sim.geodesic_distance(np.asarray([0.0, 0.0]),
                                 np.asarray([3.0, 4.0])) == pytest.approx(5.0)
    assert sim.is_navigable(np.asarray([1.0, 1.0]))


def test_pointnav_env_runs_unchanged_over_habitat_sim(fake_habitat):
    """The full Env + NavigationTask stack (sensors, measures, actions)
    drives the adapter exactly like GridSimulator — drop-in."""
    from embodied_object_detection_tpu.rl.core import Dataset, Env, Episode
    from embodied_object_detection_tpu.rl.habitat_sim import HabitatSim
    from embodied_object_detection_tpu.rl.nav import NavigationTask

    sim = HabitatSim("scenes/x.glb", height=16, width=24)
    eps = [Episode(episode_id=str(i), scene_id="scenes/x.glb",
                   start_position=np.asarray([0.0, 0.0], np.float32),
                   start_rotation=0.0,
                   info={"goal": [1.0, 0.0], "geodesic_distance": 1.0})
           for i in range(2)]
    task = NavigationTask.build(sim)
    env = Env(task, Dataset(eps), max_episode_steps=20, seed=0)

    obs = env.reset()
    assert "pointgoal_with_gps_compass" in obs
    # goal 1 m straight ahead
    np.testing.assert_allclose(obs["pointgoal_with_gps_compass"],
                               [1.0, 0.0], atol=1e-5)
    for _ in range(4):                 # 4 x 0.25 m forward reaches the goal
        obs = env.step(1)
    m = env.get_metrics()
    assert m["distance_to_goal"] == pytest.approx(0.0, abs=1e-5)
    env.step(0)                        # STOP at the goal
    m = env.get_metrics()
    assert m["success"] == 1.0
    assert m["spl"] == pytest.approx(1.0, abs=1e-5)
    env.close()
    assert fake_habitat["sim"].closed
