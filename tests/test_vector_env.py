"""VectorEnv pool tests (the habitat multi-process env analog) — mirrors
habitat-lab test/test_habitat_env.py's fork/thread start-method coverage."""

import numpy as np
import pytest

from embodied_object_detection_tpu.data.vector_env import (
    VectorEnv, ThreadedVectorEnv)


class CounterEnv:
    def __init__(self, base):
        self.base = base
        self.t = 0

    def reset(self):
        self.t = 0
        return self.base

    def step(self, action):
        self.t += 1
        return self.base + self.t * action

    def get_state(self):
        return (self.base, self.t)


def _fns(n):
    return [lambda b=i: CounterEnv(b * 100) for i in range(n)]


@pytest.mark.parametrize("cls", [VectorEnv, ThreadedVectorEnv])
def test_reset_step_call(cls):
    with cls(_fns(3)) as envs:
        obs = envs.reset()
        assert obs == [0, 100, 200]
        obs = envs.step([1, 2, 3])
        assert obs == [1, 102, 203]
        obs = envs.step([1, 2, 3])
        assert obs == [2, 104, 206]
        states = envs.call("get_state")
        assert states == [(0, 2), (100, 2), (200, 2)]


@pytest.mark.parametrize("cls", [VectorEnv, ThreadedVectorEnv])
def test_async_step_and_pause(cls):
    envs = cls(_fns(3))
    envs.reset()
    envs.async_step([1, 1, 1])
    out = envs.wait_step()
    assert out == [1, 101, 201]
    envs.pause_at(1)
    assert envs.num_envs == 2
    out = envs.step([1, 1])
    assert out == [2, 202]
    envs.resume_all()
    assert envs.num_envs == 3
    envs.close()
