"""RL substrate: sim geometry, nav task semantics, GAE, PPO, DD-PPO.

Reference behaviors under test are cited per-case from
habitat-lab/habitat/tasks/nav/nav.py, habitat_baselines/rl/ppo/ppo.py and
habitat_baselines/common/rollout_storage.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from embodied_object_detection_tpu.rl.core import Env
from embodied_object_detection_tpu.rl.sim import (
    GridSimulator, make_pointnav_dataset)
from embodied_object_detection_tpu.rl.nav import (
    DistanceToGoal, IntegratedPointGoalGPSAndCompassSensor, NavRLEnv,
    NavigationTask, SPL, Success, make_nav_rl_env)
from embodied_object_detection_tpu.rl.policy import (
    PointNavPolicy, init_policy)
from embodied_object_detection_tpu.rl.ppo import PPOConfig, make_ppo
from embodied_object_detection_tpu.rl.rollout import (
    RolloutStorage, compute_gae)


# --------------------------------------------------------------------------
# Simulator
# --------------------------------------------------------------------------

def test_sim_geodesic_matches_euclidean_in_open_space():
    sim = GridSimulator(render_rgb=False)
    env = make_nav_rl_env(seed=3, episodes_per_scene=2)
    env.reset()
    s = env.habitat_env.sim
    # Center block of every scene is kept free; straight-line distance
    # there should match the 8-connected geodesic within grid quantization.
    a = np.array([6.0, 6.0], np.float32)
    b = np.array([6.8, 6.0], np.float32)
    d = s.geodesic_distance(a, b)
    assert abs(d - 0.8) < 0.25
    env.close()


def test_sim_collision_blocks_motion():
    sim = GridSimulator(render_rgb=False)
    occ = sim.scene_occupancy("scene0")
    from embodied_object_detection_tpu.rl.core import Episode
    ep = Episode("e", "scene0", np.array([0.3, 6.4], np.float32), np.pi)
    sim.reset(ep)  # facing -x: border wall at x=0
    pos0 = sim.agent.position.copy()
    sim.move_forward()
    sim.move_forward()
    assert sim.previous_step_collided
    assert np.linalg.norm(sim.agent.position - pos0) < 0.3


def test_sim_render_shapes():
    sim = GridSimulator(image_hw=(32, 48))
    from embodied_object_detection_tpu.rl.core import Episode
    ep = Episode("e", "scene0", np.array([6.4, 6.4], np.float32), 0.0)
    sim.reset(ep)
    rgb = sim.render_rgb()
    depth = sim.render_depth()
    assert rgb.shape == (32, 48, 3) and rgb.dtype == np.uint8
    assert depth.shape == (32, 48, 1)
    assert 0 < depth.min() <= depth.max() <= sim.max_depth


# --------------------------------------------------------------------------
# Task / env semantics
# --------------------------------------------------------------------------

def _oracle_step(env):
    """Pick the action greedily reducing pointgoal rho (turn toward, walk)."""
    obs = env._last_obs
    rho, phi = obs["pointgoal_with_gps_compass"]
    if rho < 0.2:
        return 0  # stop
    if abs(phi) < np.deg2rad(15):
        return 1  # forward
    return 2 if phi > 0 else 3  # turn left / right


def test_nav_env_oracle_reaches_goal_and_scores_success():
    env = make_nav_rl_env(scene_ids=("scene1",), episodes_per_scene=4,
                          seed=0, max_episode_steps=300)
    obs = env.reset()
    total_reward = 0.0
    info = {}
    for _ in range(300):
        env._last_obs = obs
        obs, r, done, info = env.step(_oracle_step(env))
        total_reward += r
        if done:
            break
    # The greedy oracle can wedge on concave obstacles; when it does
    # finish, success/SPL must be consistent.
    if info.get("success"):
        assert info["spl"] > 0.1
        # Success bonus dominates slack penalties (environments.py:60-73).
        assert total_reward > 1.0
        assert info["distance_to_goal"] < Success.SUCCESS_DISTANCE
    assert {"distance_to_goal", "success", "spl", "softspl",
            "collisions"} <= set(info)
    env.close()


def test_stop_away_from_goal_is_failure():
    env = make_nav_rl_env(scene_ids=("scene2",), episodes_per_scene=2,
                          seed=1)
    env.reset()
    obs, r, done, info = env.step(0)  # immediate stop
    assert done
    assert info["success"] == 0.0 and info["spl"] == 0.0
    env.close()


def test_max_episode_steps_terminates():
    env = make_nav_rl_env(scene_ids=("scene3",), episodes_per_scene=2,
                          seed=2, max_episode_steps=5)
    env.reset()
    done = False
    for i in range(5):
        _, _, done, _ = env.step(2)  # turn forever
        assert done == (i == 4)
    assert env.habitat_env.episode_over
    env.close()


def test_spl_upper_bounded_by_one_and_penalizes_detours():
    """SPL = success * shortest / max(shortest, walked) (nav.py:533-591)."""
    env = make_nav_rl_env(scene_ids=("scene1",), episodes_per_scene=4,
                          seed=0, max_episode_steps=400)
    obs = env.reset()
    info = {}
    for _ in range(400):
        env._last_obs = obs
        obs, _, done, info = env.step(_oracle_step(env))
        if done:
            break
    if info.get("success"):
        assert 0.0 < info["spl"] <= 1.0 + 1e-6
        assert info["softspl"] <= 1.0 + 1e-6


def test_pointgoal_sensor_rotates_with_agent():
    env = make_nav_rl_env(scene_ids=("scene4",), episodes_per_scene=2,
                          seed=4)
    obs = env.reset()
    rho0, phi0 = obs["pointgoal_with_gps_compass"]
    obs, _, _, _ = env.step(2)  # turn_left (+10 deg heading)
    rho1, phi1 = obs["pointgoal_with_gps_compass"]
    assert abs(rho1 - rho0) < 1e-5
    dphi = (phi1 - phi0 + np.pi) % (2 * np.pi) - np.pi
    assert abs(abs(dphi) - np.deg2rad(10)) < 1e-4
    env.close()


# --------------------------------------------------------------------------
# GAE (rollout_storage.py:115-133 oracle)
# --------------------------------------------------------------------------

def _gae_oracle(rewards, values, masks, gamma, tau):
    T, N = rewards.shape
    returns = np.zeros((T, N))
    gae = np.zeros(N)
    for t in reversed(range(T)):
        delta = rewards[t] + gamma * values[t + 1] * masks[t + 1] - values[t]
        gae = delta + gamma * tau * masks[t + 1] * gae
        returns[t] = gae + values[t]
    return returns


def test_gae_matches_reference_loop(rng):
    T, N = 13, 5
    rewards = rng.randn(T, N).astype(np.float32)
    values = rng.randn(T + 1, N).astype(np.float32)
    masks = (rng.rand(T + 1, N) > 0.2).astype(np.float32)
    got = np.asarray(compute_gae(jnp.asarray(rewards), jnp.asarray(values),
                                 jnp.asarray(masks), 0.99, 0.95))
    want = _gae_oracle(rewards, values, masks, 0.99, 0.95)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_discounted_returns_no_gae(rng):
    T, N = 7, 3
    rewards = rng.randn(T, N).astype(np.float32)
    values = rng.randn(T + 1, N).astype(np.float32)
    masks = np.ones((T + 1, N), np.float32)
    got = np.asarray(compute_gae(jnp.asarray(rewards), jnp.asarray(values),
                                 jnp.asarray(masks), 0.9, 0.95,
                                 use_gae=False))
    # returns[t] = returns[t+1]*gamma + r[t], bootstrap = values[T]
    want = np.zeros((T, N))
    ret = values[T]
    for t in reversed(range(T)):
        ret = ret * 0.9 + rewards[t]
        want[t] = ret
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


# --------------------------------------------------------------------------
# Policy
# --------------------------------------------------------------------------

def _tiny_policy(num_envs=4, hidden=32):
    env = make_nav_rl_env(scene_ids=("scene0",), episodes_per_scene=2)
    policy = PointNavPolicy(dim_actions=4, hidden_size=hidden, blind=True)
    params = init_policy(policy, env.observation_space,
                         jax.random.PRNGKey(0), num_envs)
    env.close()
    return policy, params


def test_policy_sequence_matches_stepwise():
    """evaluate_actions' scan must agree with repeated single-step act
    (rnn_state_encoder.py single_forward vs seq_forward equivalence)."""
    T, N, H = 6, 3, 32
    policy, params = _tiny_policy(N, H)
    rng = np.random.RandomState(0)
    obs_seq = {"pointgoal_with_gps_compass":
               jnp.asarray(rng.randn(T, N, 2).astype(np.float32))}
    masks = jnp.asarray((rng.rand(T, N) > 0.3).astype(np.float32))
    actions = jnp.asarray(rng.randint(0, 4, (T, N)))
    h0 = jnp.asarray(rng.randn(N, H).astype(np.float32))

    values, lps, _ = policy.apply(
        params, obs_seq, h0, actions, masks, actions,
        method=PointNavPolicy.evaluate_actions)

    h = h0
    for t in range(T):
        obs_t = {k: v[t] for k, v in obs_seq.items()}
        v_t, _, _, h = policy.apply(params, obs_t, h, None, masks[t],
                                    jax.random.PRNGKey(1),
                                    method=PointNavPolicy.act)
        np.testing.assert_allclose(np.asarray(values[t]), np.asarray(v_t),
                                   rtol=1e-5, atol=1e-5)


def test_act_log_prob_consistent_with_evaluate():
    N, H = 5, 32
    policy, params = _tiny_policy(N, H)
    rng = np.random.RandomState(1)
    obs = {"pointgoal_with_gps_compass":
           jnp.asarray(rng.randn(N, 2).astype(np.float32))}
    h = jnp.zeros((N, H), jnp.float32)
    masks = jnp.ones((N,), jnp.float32)
    v, a, lp, _ = policy.apply(params, obs, h, None, masks,
                               jax.random.PRNGKey(3),
                               method=PointNavPolicy.act)
    obs_seq = {k: x[None] for k, x in obs.items()}
    v2, lp2, ent = policy.apply(params, obs_seq, h, a[None], masks[None],
                                a[None],
                                method=PointNavPolicy.evaluate_actions)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp2[0]),
                               rtol=1e-5, atol=1e-5)
    assert float(ent) > 0


# --------------------------------------------------------------------------
# PPO update
# --------------------------------------------------------------------------

def _fake_batch(rng, T=8, N=4, H=32):
    return {
        "observations": {"pointgoal_with_gps_compass":
                         jnp.asarray(rng.randn(T, N, 2).astype(np.float32))},
        "hidden0": jnp.zeros((N, H), jnp.float32),
        "actions": jnp.asarray(rng.randint(0, 4, (T, N))),
        "prev_actions": jnp.asarray(rng.randint(0, 4, (T, N))),
        "value_preds": jnp.asarray(rng.randn(T, N).astype(np.float32)),
        "returns": jnp.asarray(rng.randn(T, N).astype(np.float32)),
        "masks": jnp.asarray(np.ones((T, N), np.float32)),
        "old_log_probs": jnp.asarray(
            np.log(0.25) * np.ones((T, N), np.float32)),
    }


def test_ppo_update_changes_params_finite_metrics():
    policy, params = _tiny_policy(4, 32)
    cfg = PPOConfig(ppo_epoch=2, num_mini_batch=2)

    def evaluate_actions(p, obs, h0, prev, masks, actions):
        return policy.apply(p, obs, h0, prev, masks, actions,
                            method=PointNavPolicy.evaluate_actions)

    init_state, update = make_ppo(evaluate_actions, cfg)
    state = init_state(params)
    batch = _fake_batch(np.random.RandomState(0))
    state2, metrics = jax.jit(update)(state, batch, jax.random.PRNGKey(0))
    for v in metrics.values():
        assert np.isfinite(float(v))
    leaves0 = jax.tree_util.tree_leaves(state.params)
    leaves1 = jax.tree_util.tree_leaves(state2.params)
    assert any(not np.allclose(a, b) for a, b in zip(leaves0, leaves1))


def test_ppo_trainer_smoke_reward_and_metrics():
    from embodied_object_detection_tpu.rl.trainer import (
        PPOTrainer, PPOTrainerConfig)
    cfg = PPOTrainerConfig(
        num_envs=4, num_steps=16, num_updates=2, hidden_size=32,
        ppo=PPOConfig(ppo_epoch=1, num_mini_batch=2, lr=1e-3))
    trainer = PPOTrainer(
        cfg, lambda i: make_nav_rl_env(scene_ids=(f"s{i}",),
                                       episodes_per_scene=2, seed=i,
                                       max_episode_steps=20))
    log = trainer.train()
    assert len(log) == 2
    for row in log:
        assert np.isfinite(row["value_loss"])
        assert np.isfinite(row["action_loss"])
    stats = trainer.evaluate(
        make_nav_rl_env(scene_ids=("eval",), episodes_per_scene=2, seed=9,
                        max_episode_steps=15),
        num_episodes=2, max_steps=15)
    assert "reward" in stats and np.isfinite(stats["reward"])
    trainer.close()


# --------------------------------------------------------------------------
# DD-PPO: sharded update == single-device update (8 virtual CPU devices)
# --------------------------------------------------------------------------

def test_ddppo_update_matches_single_device():
    """With 1 epoch x 1 minibatch, the pmean'd per-shard gradient equals
    the global-batch gradient, and global advantage stats match — DD-PPO
    must reproduce plain PPO exactly (ddppo.py:45-96 semantics)."""
    from jax.sharding import Mesh
    from embodied_object_detection_tpu.rl.ddppo import make_ddppo

    n_dev = len(jax.devices())
    assert n_dev == 8, f"conftest should give 8 CPU devices, got {n_dev}"
    policy, params = _tiny_policy(8, 32)
    cfg = PPOConfig(ppo_epoch=1, num_mini_batch=1)

    def evaluate_actions(p, obs, h0, prev, masks, actions):
        return policy.apply(p, obs, h0, prev, masks, actions,
                            method=PointNavPolicy.evaluate_actions)

    batch = _fake_batch(np.random.RandomState(7), T=6, N=8)
    key = jax.random.PRNGKey(5)

    # Plain SGD so post-step params compare gradients directly (Adam's
    # step-1 update is ~lr*sign(grad), which amplifies float noise on
    # near-zero grads into 2*lr param diffs).
    import optax
    init_s, update_s = make_ppo(evaluate_actions, cfg, tx=optax.sgd(0.05))
    ref_state, ref_metrics = jax.jit(update_s)(init_s(params), batch, key)

    mesh = Mesh(np.array(jax.devices()), ("data",))
    init_d, update_d = make_ddppo(evaluate_actions, cfg, mesh, axis="data",
                                  tx=optax.sgd(0.05))
    dd_state, dd_metrics = update_d(init_d(params), batch, key)

    for a, b in zip(jax.tree_util.tree_leaves(ref_state.params),
                    jax.tree_util.tree_leaves(dd_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(float(ref_metrics["value_loss"]),
                               float(dd_metrics["value_loss"]), rtol=1e-4)


def test_interrupted_state_roundtrip(tmp_path):
    from embodied_object_detection_tpu.rl.ddppo import (
        load_interrupted_state, save_interrupted_state)
    f = str(tmp_path / "int.pkl")
    state = {"params": {"w": jnp.arange(4.0)}, "step": 7}
    save_interrupted_state(state, f)
    back = load_interrupted_state(f)
    assert back["step"] == 7
    np.testing.assert_allclose(back["params"]["w"], np.arange(4.0))
    assert load_interrupted_state(str(tmp_path / "missing.pkl")) is None


def test_num_rollouts_done_store(tmp_path):
    from embodied_object_detection_tpu.rl.ddppo import NumRolloutsDoneStore
    store = NumRolloutsDoneStore(str(tmp_path / "ctr"))
    assert store.get() == 0
    store.add(1), store.add(2)
    assert store.get() == 3
    store.reset()
    assert store.get() == 0


def test_trainer_preemption_resume(tmp_path, monkeypatch):
    """ddppo_trainer.py:150-180 preemption contract: EXIT -> interrupted
    state saved; next train() resumes from the saved update index."""
    from embodied_object_detection_tpu.rl import ddppo
    from embodied_object_detection_tpu.rl.trainer import (
        PPOTrainer, PPOTrainerConfig)
    state_file = str(tmp_path / "int.pkl")
    monkeypatch.setattr(ddppo, "_interrupted_state_file", lambda: state_file)

    cfg = PPOTrainerConfig(
        num_envs=2, num_steps=4, num_updates=3, hidden_size=32,
        ppo=PPOConfig(ppo_epoch=1, num_mini_batch=1))

    def env_fn(i):
        return make_nav_rl_env(scene_ids=("pre",), episodes_per_scene=2,
                               seed=i, max_episode_steps=8)

    t1 = PPOTrainer(cfg, env_fn)
    ddppo.EXIT.set()
    try:
        log = t1.train(handle_preemption=True)
    finally:
        ddppo.EXIT.clear()
    t1.close()
    assert log == []  # exited before the first update
    saved = ddppo.load_interrupted_state(state_file)
    assert saved is not None and saved["update"] == 0

    # simulate a mid-run save, then resume skips completed updates
    saved["update"] = 2
    ddppo.save_interrupted_state(saved, state_file)
    t2 = PPOTrainer(cfg, env_fn)
    log2 = t2.train(handle_preemption=True)
    t2.close()
    assert len(log2) == 1 and log2[0]["update"] == 2


def test_linear_lr_and_clip_decay():
    """ppo_trainer.py:328-343: lr and clip_param decay linearly over
    NUM_UPDATES."""
    import optax
    policy, params = _tiny_policy(4, 32)
    cfg = PPOConfig(ppo_epoch=1, num_mini_batch=1, lr=1e-2,
                    use_linear_lr_decay=True, use_linear_clip_decay=True,
                    num_updates=4)

    def evaluate_actions(p, obs, h0, prev, masks, actions):
        return policy.apply(p, obs, h0, prev, masks, actions,
                            method=PointNavPolicy.evaluate_actions)

    init_state, update = make_ppo(evaluate_actions, cfg)
    state = init_state(params)
    batch = _fake_batch(np.random.RandomState(0))
    upd = jax.jit(update)

    deltas = []
    for i in range(4):
        prev_leaves = [np.asarray(x) for x in
                       jax.tree_util.tree_leaves(state.params)]
        state, _ = upd(state, batch, jax.random.PRNGKey(i))
        new_leaves = jax.tree_util.tree_leaves(state.params)
        deltas.append(max(np.abs(np.asarray(n) - p).max()
                          for n, p in zip(new_leaves, prev_leaves)))
    # step size shrinks as lr decays toward zero
    assert deltas[-1] < deltas[0]
    assert int(state.update_idx) == 4


@pytest.mark.slow
def test_ppo_learns_pointnav():
    """128k-step reference run: reward 0.27 -> 6.0, success 0 -> 44%.
    This pinned shorter run (26k steps) must already show the reward
    climbing well clear of the random-policy plateau (~0.1)."""
    from embodied_object_detection_tpu.rl.trainer import (
        PPOTrainer, PPOTrainerConfig)
    cfg = PPOTrainerConfig(
        num_envs=8, num_steps=64, num_updates=50, hidden_size=128,
        ppo=PPOConfig(ppo_epoch=2, num_mini_batch=2, lr=1e-3,
                      entropy_coef=0.02),
        reward_window_size=100, seed=0)
    trainer = PPOTrainer(
        cfg, lambda i: make_nav_rl_env(scene_ids=(f"learn{i % 4}",),
                                       episodes_per_scene=16, seed=i,
                                       max_episode_steps=80))
    log = trainer.train()
    trainer.close()
    early = np.mean([r["reward"] for r in log[5:15]])
    late = np.mean([r["reward"] for r in log[-10:]])
    assert late > early + 0.5, (early, late)
    assert late > 1.0, late
