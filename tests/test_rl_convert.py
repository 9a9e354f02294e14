"""Habitat-checkpoint conversion: torch GRU/policy forward == flax policy.

Validates the claim in rl/policy.py that GRUCell uses torch gate
conventions, by loading a real torch nn.GRU's weights through the
converter and comparing full policy forwards.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from embodied_object_detection_tpu.rl.convert import (  # noqa: E402
    convert_pointnav_policy, load_habitat_checkpoint)
from embodied_object_detection_tpu.rl.policy import PointNavPolicy  # noqa: E402


def _torch_policy(hidden=32, dim_actions=4, seed=0):
    torch.manual_seed(seed)
    rnn = torch.nn.GRU(input_size=2, hidden_size=hidden, num_layers=1)
    act = torch.nn.Linear(hidden, dim_actions)
    critic = torch.nn.Linear(hidden, 1)
    sd = {}
    for k, v in rnn.state_dict().items():
        sd[f"net.state_encoder.rnn.{k}"] = v.numpy()
    for k, v in act.state_dict().items():
        sd[f"action_distribution.linear.{k}"] = v.numpy()
    for k, v in critic.state_dict().items():
        sd[f"critic.fc.{k}"] = v.numpy()
    return rnn, act, critic, sd


def test_converted_policy_matches_torch_forward():
    H, N, T = 32, 3, 5
    rnn, act, critic, sd = _torch_policy(H)
    params = convert_pointnav_policy(sd, blind=True)
    policy = PointNavPolicy(dim_actions=4, hidden_size=H, blind=True)

    rng = np.random.RandomState(0)
    obs_seq = rng.randn(T, N, 2).astype(np.float32)
    h0 = rng.randn(N, H).astype(np.float32)
    masks = np.ones((T, N), np.float32)
    actions = rng.randint(0, 4, (T, N))

    # flax sequence forward
    vals, lps, _ = policy.apply(
        {"params": params["params"]},
        {"pointgoal_with_gps_compass": jnp.asarray(obs_seq)},
        jnp.asarray(h0), jnp.asarray(actions), jnp.asarray(masks),
        jnp.asarray(actions), method=PointNavPolicy.evaluate_actions)

    # torch reference forward
    with torch.no_grad():
        out, _ = rnn(torch.from_numpy(obs_seq),
                     torch.from_numpy(h0)[None])          # [T, N, H]
        t_logits = act(out)
        t_vals = critic(out)[..., 0]
        t_lp = torch.log_softmax(t_logits, dim=-1)
        t_lp = t_lp.gather(-1, torch.from_numpy(actions)[..., None])[..., 0]

    np.testing.assert_allclose(np.asarray(vals), t_vals.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lps), t_lp.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_converted_policy_hidden_mask_reset_matches_torch():
    """Mask zeros the carried hidden state exactly like the reference's
    _mask_hidden (rnn_state_encoder.py:66)."""
    H, N = 16, 2
    rnn, act, critic, sd = _torch_policy(H, seed=1)
    params = convert_pointnav_policy(sd, blind=True)
    policy = PointNavPolicy(dim_actions=4, hidden_size=H, blind=True)

    rng = np.random.RandomState(1)
    x1 = rng.randn(N, 2).astype(np.float32)
    x2 = rng.randn(N, 2).astype(np.float32)
    h = rng.randn(N, H).astype(np.float32)

    # step 1 with live hidden, step 2 with mask=0 (episode reset)
    v1, _, _, h1 = policy.apply(
        {"params": params["params"]},
        {"pointgoal_with_gps_compass": jnp.asarray(x1)}, jnp.asarray(h),
        None, jnp.ones((N,)), jax.random.PRNGKey(0),
        method=PointNavPolicy.act)
    v2, _, _, _ = policy.apply(
        {"params": params["params"]},
        {"pointgoal_with_gps_compass": jnp.asarray(x2)}, h1,
        None, jnp.zeros((N,)), jax.random.PRNGKey(0),
        method=PointNavPolicy.act)

    with torch.no_grad():
        o1, th1 = rnn(torch.from_numpy(x1)[None], torch.from_numpy(h)[None])
        o2, _ = rnn(torch.from_numpy(x2)[None], torch.zeros_like(th1))
        tv1 = critic(o1[0])[..., 0].numpy()
        tv2 = critic(o2[0])[..., 0].numpy()
    np.testing.assert_allclose(np.asarray(v1), tv1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v2), tv2, rtol=1e-4, atol=1e-5)


def test_load_habitat_checkpoint_file(tmp_path):
    _, _, _, sd = _torch_policy(16, seed=2)
    blob = {"state_dict": {f"actor_critic.{k}": torch.from_numpy(v)
                           for k, v in sd.items()}}
    path = tmp_path / "ckpt.pth"
    torch.save(blob, path)
    params = load_habitat_checkpoint(str(path))
    assert "net" in params["params"] and "critic" in params["params"]
    k = params["params"]["net"]["GRUStateEncoder_0"]["GRUCell_0"]["ih"][
        "kernel"]
    assert k.shape == (2, 48)


def test_ppo_agent_from_habitat_checkpoint(tmp_path):
    from embodied_object_detection_tpu.rl.agents import Benchmark, PPOAgent
    from embodied_object_detection_tpu.rl.nav import make_nav_rl_env
    _, _, _, sd = _torch_policy(32, seed=3)
    blob = {"state_dict": {f"actor_critic.{k}": torch.from_numpy(v)
                           for k, v in sd.items()}}
    path = tmp_path / "habitat.pth"
    torch.save(blob, path)
    policy = PointNavPolicy(dim_actions=4, hidden_size=32, blind=True)
    agent = PPOAgent.from_habitat_checkpoint(str(path), policy)
    env = make_nav_rl_env(scene_ids=("hb",), episodes_per_scene=2, seed=0,
                          max_episode_steps=8)
    stats = Benchmark(env.habitat_env).evaluate(agent, num_episodes=1)
    assert "distance_to_goal" in stats
    env.close()
