"""RL config tree: overrides + env construction."""

import numpy as np

from embodied_object_detection_tpu.rl.config import (
    get_config, make_env_from_config)


def test_overrides_typed():
    cfg = get_config(["rl.ppo.lr=1e-3", "num_envs=8",
                      "simulator.rgb_sensor=true",
                      "dataset.scenes=a,b",
                      "environment.max_episode_steps=17"])
    assert cfg.rl.ppo.lr == 1e-3
    assert cfg.num_envs == 8
    assert cfg.simulator.rgb_sensor is True
    assert cfg.dataset.scenes == ("a", "b")
    assert cfg.environment.max_episode_steps == 17


def test_env_from_config_runs():
    cfg = get_config(["environment.max_episode_steps=6",
                      "task.success_distance=0.5",
                      "simulator.depth_sensor=true",
                      "dataset.episodes_per_scene=2"])
    env = make_env_from_config(cfg)
    obs = env.reset()
    assert "pointgoal_with_gps_compass" in obs and "depth" in obs
    for _ in range(6):
        obs, r, done, info = env.step(2)
        if done:
            break
    assert done and "spl" in info
    # success distance override reached the measure
    succ = env.habitat_env.task.measurements.measures["success"]
    assert succ.SUCCESS_DISTANCE == 0.5
    env.close()
