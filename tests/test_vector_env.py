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


@pytest.mark.parametrize("start_method", ["spawn", "forkserver"])
def test_start_method_matrix(start_method):
    """habitat test_habitat_env.py:101-163 runs fork/spawn/forkserver; the
    non-fork methods require picklable env factories."""
    with VectorEnv([CounterEnvFactory(i * 100) for i in range(2)],
                   start_method=start_method) as envs:
        assert envs.reset() == [0, 100]
        assert envs.step([2, 2]) == [2, 102]


class CounterEnvFactory:
    def __init__(self, base):
        self.base = base

    def __call__(self):
        return CounterEnv(self.base)


class GymTupleEnv:
    """(obs, reward, done, info) env ending every 2 steps."""

    def __init__(self):
        self.t = 0

    def reset(self):
        self.t = 0
        return {"t": 0}

    def step(self, action):
        self.t += 1
        done = self.t >= 2
        return ({"t": self.t}, 1.0, done, {"steps": self.t})


@pytest.mark.parametrize("cls", [VectorEnv, ThreadedVectorEnv])
def test_auto_reset_done(cls):
    """auto_reset_done=True resets finished episodes in the worker
    (vector_env.py:184-190) — the PPO trainer contract."""
    envs = cls([GymTupleEnv for _ in range(2)], auto_reset_done=True)
    envs.reset()
    envs.step([0, 0])
    obs, r, done, info = envs.step([0, 0])[0]
    assert done and obs == {"t": 0}  # fresh obs from the worker reset
    # next step runs on the reset episode
    obs, _, done2, _ = envs.step([0, 0])[0]
    assert obs == {"t": 1} and not done2
    envs.close()


def test_rl_env_in_subprocess_pool():
    """Real nav envs across forked workers (the data-generation use)."""
    from embodied_object_detection_tpu.rl.nav import make_nav_rl_env
    envs = VectorEnv(
        [lambda i=i: make_nav_rl_env(scene_ids=(f"vp{i}",),
                                     episodes_per_scene=2, seed=i,
                                     max_episode_steps=5)
         for i in range(2)],
        auto_reset_done=True)
    obs = envs.reset()
    assert all("pointgoal_with_gps_compass" in o for o in obs)
    for _ in range(6):
        results = envs.step([1, 2])
    assert all(len(r) == 4 for r in results)
    envs.close()


class BigObsEnvFactory:
    """step returns ~2 MB (bigger than the OS pipe buffer); close() is
    recorded via a sentinel file written in the worker process."""

    def __init__(self, sentinel):
        self.sentinel = sentinel

    def __call__(self):
        return self

    def reset(self):
        return 0

    def step(self, action):
        return np.zeros(2 * 1024 * 1024, np.uint8)

    def close(self):
        with open(self.sentinel, "w") as f:
            f.write("closed")


def test_close_drains_inflight_async_step(tmp_path):
    """close() without wait_step(): the worker sits blocked in conn.send()
    on a result bigger than the pipe buffer and never reads _CLOSE unless
    close() drains the pending results first (habitat vector_env.py
    close() recvs in-flight reads) — otherwise join() times out 5 s/env
    and env.close() never runs in the worker."""
    import os
    import time
    sentinels = [str(tmp_path / f"closed_{i}") for i in range(2)]
    envs = VectorEnv([BigObsEnvFactory(s) for s in sentinels])
    envs.reset()
    envs.async_step([0, 0])
    t0 = time.monotonic()
    envs.close()
    assert time.monotonic() - t0 < 4.0  # no join-timeout stall
    for s in sentinels:
        deadline = time.monotonic() + 2.0
        while not os.path.exists(s) and time.monotonic() < deadline:
            time.sleep(0.01)
        assert os.path.exists(s), "worker never executed env.close()"
