"""Rollout storage + GAE for PPO.

Re-designs `RolloutStorage` (habitat_baselines/common/rollout_storage.py:12-242).
Storage is host-side numpy — observations arrive from CPU simulator
workers anyway, and one device_put per update beats per-step device
scatter on TPU. Returns/GAE (`compute_returns`, rollout_storage.py:115-133)
run on device as a reverse `lax.scan` instead of the reference's Python
loop over timesteps.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["RolloutStorage", "compute_gae"]


@partial(jax.jit, static_argnames=("use_gae",))
def compute_gae(rewards: jnp.ndarray, value_preds: jnp.ndarray,
                masks: jnp.ndarray, gamma: float, tau: float,
                use_gae: bool = True) -> jnp.ndarray:
    """Returns [T, N] from rewards [T, N], value_preds [T+1, N] (last row =
    bootstrap value), masks [T+1, N]. Reverse scan re-expression of
    rollout_storage.py:115-133."""
    T = rewards.shape[0]

    if use_gae:
        def step(gae, t):
            delta = (rewards[t] + gamma * value_preds[t + 1] * masks[t + 1]
                     - value_preds[t])
            gae = delta + gamma * tau * masks[t + 1] * gae
            return gae, gae + value_preds[t]
    else:
        def step(ret, t):
            ret = ret * gamma * masks[t + 1] + rewards[t]
            return ret, ret

    init = jnp.zeros_like(rewards[0]) if use_gae else value_preds[T]
    _, returns = jax.lax.scan(step, init, jnp.arange(T - 1, -1, -1))
    return returns[::-1]


class RolloutStorage:
    """(T+1, N, ...) rolling buffers with the reference's insert /
    after_update / compute_returns lifecycle."""

    def __init__(self, num_steps: int, num_envs: int, obs_space,
                 hidden_size: int):
        self.observations: Dict[str, np.ndarray] = {
            k: np.zeros((num_steps + 1, num_envs) + tuple(s.shape),
                        np.float32)
            for k, s in obs_space.spaces.items()}
        self.hidden_states = np.zeros((num_steps + 1, num_envs, hidden_size),
                                      np.float32)
        self.rewards = np.zeros((num_steps, num_envs), np.float32)
        self.value_preds = np.zeros((num_steps + 1, num_envs), np.float32)
        self.returns = np.zeros((num_steps + 1, num_envs), np.float32)
        self.action_log_probs = np.zeros((num_steps, num_envs), np.float32)
        self.actions = np.zeros((num_steps, num_envs), np.int32)
        self.prev_actions = np.zeros((num_steps + 1, num_envs), np.int32)
        self.masks = np.zeros((num_steps + 1, num_envs), np.float32)
        self.num_steps = num_steps
        self.num_envs = num_envs
        self.step = 0

    def insert(self, observations, hidden_states, actions, action_log_probs,
               value_preds, rewards, masks) -> None:
        for k, v in observations.items():
            self.observations[k][self.step + 1] = v
        self.hidden_states[self.step + 1] = np.asarray(hidden_states)
        self.actions[self.step] = np.asarray(actions)
        self.prev_actions[self.step + 1] = np.asarray(actions)
        self.action_log_probs[self.step] = np.asarray(action_log_probs)
        self.value_preds[self.step] = np.asarray(value_preds)
        self.rewards[self.step] = np.asarray(rewards)
        self.masks[self.step + 1] = np.asarray(masks)
        self.step += 1

    def set_first_observations(self, observations) -> None:
        for k, v in observations.items():
            self.observations[k][0] = v

    def after_update(self) -> None:
        for k in self.observations:
            self.observations[k][0] = self.observations[k][self.step]
        self.hidden_states[0] = self.hidden_states[self.step]
        self.masks[0] = self.masks[self.step]
        self.prev_actions[0] = self.prev_actions[self.step]
        self.step = 0

    def compute_returns(self, next_value: np.ndarray, use_gae: bool,
                        gamma: float, tau: float) -> None:
        self.value_preds[self.step] = np.asarray(next_value)
        returns = compute_gae(
            jnp.asarray(self.rewards[:self.step]),
            jnp.asarray(self.value_preds[:self.step + 1]),
            jnp.asarray(self.masks[:self.step + 1]),
            gamma, tau, use_gae=use_gae)
        self.returns[:self.step] = np.asarray(returns)

    def batch(self) -> Dict[str, jnp.ndarray]:
        """Device-resident training batch for the jitted PPO update."""
        T = self.step
        return {
            "observations": {k: jnp.asarray(v[:T])
                             for k, v in self.observations.items()},
            "hidden0": jnp.asarray(self.hidden_states[0]),
            "actions": jnp.asarray(self.actions[:T]),
            "prev_actions": jnp.asarray(self.prev_actions[:T]),
            "value_preds": jnp.asarray(self.value_preds[:T]),
            "returns": jnp.asarray(self.returns[:T]),
            "masks": jnp.asarray(self.masks[:T]),
            "old_log_probs": jnp.asarray(self.action_log_probs[:T]),
        }
