"""Agents, Benchmark, ResNet policy, RL CLI."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from embodied_object_detection_tpu.rl.agents import (
    Benchmark, ForwardOnlyAgent, GoalFollower, PPOAgent, RandomAgent)
from embodied_object_detection_tpu.rl.nav import make_nav_rl_env
from embodied_object_detection_tpu.rl.resnet_policy import (
    PointNavResNetPolicy, ResNetEncoder)


def test_benchmark_goal_follower_beats_random():
    env = make_nav_rl_env(scene_ids=("bench0",), episodes_per_scene=6,
                          seed=0, max_episode_steps=150)
    bench = Benchmark(env.habitat_env)
    gf = bench.evaluate(GoalFollower(), num_episodes=6)
    rnd = bench.evaluate(RandomAgent(seed=1), num_episodes=6)
    assert set(gf) >= {"distance_to_goal", "success", "spl"}
    # the bearing-follower must end closer to goals than a random walk
    assert gf["distance_to_goal"] <= rnd["distance_to_goal"] + 1e-6
    env.close()


def test_forward_only_agent_runs():
    env = make_nav_rl_env(scene_ids=("bench1",), episodes_per_scene=2,
                          seed=2, max_episode_steps=30)
    stats = Benchmark(env.habitat_env).evaluate(ForwardOnlyAgent(),
                                                num_episodes=2)
    assert np.isfinite(stats["distance_to_goal"])
    env.close()


def test_resnet_policy_shapes_and_sequence():
    policy = PointNavResNetPolicy(dim_actions=4, hidden_size=64,
                                  backbone="resnet18", baseplanes=8)
    N, H = 2, 64
    obs = {
        "rgb": jnp.zeros((N, 32, 32, 3), jnp.float32),
        "pointgoal_with_gps_compass": jnp.ones((N, 2), jnp.float32),
    }
    hidden = jnp.zeros((N, H), jnp.float32)
    masks = jnp.ones((N,), jnp.float32)
    prev = jnp.zeros((N,), jnp.int32)
    params = policy.init(jax.random.PRNGKey(0), obs, hidden, masks)
    v, a, lp, h2 = policy.apply(params, obs, hidden, prev, masks,
                                jax.random.PRNGKey(1),
                                method=PointNavResNetPolicy.act)
    assert v.shape == (N,) and a.shape == (N,) and h2.shape == (N, H)
    # sequence forward
    T = 3
    obs_seq = {k: jnp.broadcast_to(v_[None], (T,) + v_.shape)
               for k, v_ in obs.items()}
    actions = jnp.zeros((T, N), jnp.int32)
    vals, lps, ent = policy.apply(
        params, obs_seq, hidden, actions, jnp.ones((T, N), jnp.float32),
        actions, method=PointNavResNetPolicy.evaluate_actions)
    assert vals.shape == (T, N) and np.isfinite(float(ent))


def test_ppo_agent_from_checkpoint(tmp_path):
    from embodied_object_detection_tpu.rl.policy import PointNavPolicy
    from embodied_object_detection_tpu.rl.ppo import PPOConfig
    from embodied_object_detection_tpu.rl.trainer import (
        PPOTrainer, PPOTrainerConfig)
    cfg = PPOTrainerConfig(
        num_envs=2, num_steps=8, num_updates=1, hidden_size=32,
        ppo=PPOConfig(ppo_epoch=1, num_mini_batch=1),
        checkpoint_folder=str(tmp_path), checkpoint_interval=1)
    trainer = PPOTrainer(
        cfg, lambda i: make_nav_rl_env(scene_ids=("ck",), episodes_per_scene=2,
                                       seed=i, max_episode_steps=10))
    trainer.train()
    path = trainer.save_checkpoint("final.pkl")
    trainer.close()

    policy = PointNavPolicy(dim_actions=4, hidden_size=32, blind=True)
    agent = PPOAgent.from_checkpoint(path, policy)
    env = make_nav_rl_env(scene_ids=("ck",), episodes_per_scene=2, seed=5,
                          max_episode_steps=10)
    stats = Benchmark(env.habitat_env).evaluate(agent, num_episodes=1)
    assert "success" in stats
    env.close()


def test_rl_cli_train_and_eval(tmp_path):
    from embodied_object_detection_tpu.rl.run import main
    rc = main(["--run-type", "train", "--num-envs", "2", "--num-steps", "8",
               "--num-updates", "1", "--hidden-size", "32",
               "--max-episode-steps", "10",
               "--checkpoint-dir", str(tmp_path)])
    assert rc == 0
    ckpt = tmp_path / "ckpt.final.pkl"
    assert ckpt.exists()
    rc = main(["--run-type", "eval", "--num-envs", "2", "--hidden-size", "32",
               "--max-episode-steps", "10", "--eval-episodes", "1",
               "--checkpoint", str(ckpt)])
    assert rc == 0


def test_rl_cli_distributed_smoke():
    from embodied_object_detection_tpu.rl.run import main
    assert len(jax.devices()) == 8
    rc = main(["--run-type", "train", "--num-envs", "8", "--num-steps", "4",
               "--num-updates", "1", "--hidden-size", "32",
               "--max-episode-steps", "8", "--num-mini-batch", "1",
               "--distributed"])
    assert rc == 0


def test_spaces_contract():
    """habitat test/test_spaces.py analog: sample/contains round-trip."""
    from embodied_object_detection_tpu.rl.core import (
        Box, DictSpace, Discrete)
    rng = np.random.RandomState(0)
    b = Box(-1.0, 1.0, (3,))
    assert b.contains(b.sample(rng))
    assert not b.contains(np.full(3, 5.0))
    d = Discrete(4)
    assert d.contains(d.sample(rng)) and not d.contains(7)
    ds = DictSpace({"a": b, "c": d})
    s = ds.sample(rng)
    assert ds.contains(s) and set(s) == {"a", "c"}


def test_challenge_submit(capsys):
    from embodied_object_detection_tpu.rl.agents import Challenge
    env = make_nav_rl_env(scene_ids=("ch0",), episodes_per_scene=2, seed=3,
                          max_episode_steps=10)
    metrics = Challenge(env.habitat_env).submit(ForwardOnlyAgent(),
                                                num_episodes=1)
    out = capsys.readouterr().out
    assert "distance_to_goal" in metrics and "distance_to_goal" in out
    env.close()
