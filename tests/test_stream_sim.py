"""StreamSimulator (pyrobot-binding analog) driving the nav task."""

import numpy as np
import pytest

from embodied_object_detection_tpu.rl.core import Dataset, Env, Episode
from embodied_object_detection_tpu.rl.nav import (
    IntegratedPointGoalGPSAndCompassSensor, NavigationTask)
from embodied_object_detection_tpu.rl.stream_sim import StreamSimulator


def _frame(pos, heading):
    return dict(rgb=np.zeros((8, 8, 3), np.uint8),
                depth=np.ones((8, 8), np.float32),
                position=np.asarray(pos, np.float32), heading=heading)


def test_stream_sim_env_loop():
    actions_sent = []
    sim = StreamSimulator(image_hw=(8, 8), action_sink=actions_sent.append,
                          frame_timeout_s=1.0)
    ep = Episode("e0", "robot", np.array([0.0, 0.0], np.float32), 0.0,
                 info={"goal": [1.0, 0.0]})
    task = NavigationTask.build(
        sim, sensors=[IntegratedPointGoalGPSAndCompassSensor()])
    env = Env(task, Dataset([ep]), max_episode_steps=10)

    # robot pushes the first frame, then one per action
    sim.feed(**_frame([0.0, 0.0], 0.0))
    obs = env.reset()
    np.testing.assert_allclose(obs["pointgoal_with_gps_compass"], [1.0, 0.0],
                               atol=1e-6)

    sim.feed(**_frame([0.25, 0.0], 0.0))
    obs = env.step(1)  # move_forward
    assert actions_sent == ["move_forward"]
    np.testing.assert_allclose(obs["pointgoal_with_gps_compass"][0], 0.75,
                               atol=1e-6)

    # arrive + stop -> success
    sim.feed(**_frame([0.95, 0.0], 0.0))
    env.step(1)
    env.step(0)
    assert env.get_metrics()["success"] == 1.0
    env.close()


def test_stream_sim_timeout():
    sim = StreamSimulator(frame_timeout_s=0.05)
    with pytest.raises(TimeoutError):
        sim.reset(Episode("e", "r", np.zeros(2), 0.0))
