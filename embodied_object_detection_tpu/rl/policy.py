"""Actor-critic policy for PointNav PPO (flax).

Re-designs the reference policy stack — `Policy`/`PointNavBaselinePolicy`
(habitat_baselines/rl/ppo/policy.py:21-181), `SimpleCNN`
(rl/models/simple_cnn.py: 8x8/s4 -> 4x4/s2 -> 3x3/s1 convs + linear) and
the mask-resetting `RNNStateEncoder` (rl/models/rnn_state_encoder.py) —
as pure flax modules. TPU-first choices:

- The sequence forward (`evaluate_actions`) is a single `lax.scan` over
  time with the hidden state multiplied by the done-mask each step —
  identical math to the reference's `_mask_hidden` (rnn_state_encoder.py:66)
  without its host-side `has_zeros` sequence splitting, which is a GPU
  cuDNN-batching trick that XLA fusion makes unnecessary.
- GRU gates follow torch's parameterisation (r/z/n with r gating the
  hidden candidate) so converted weights are drop-in.
- Everything is a pure function of params: `act` / `get_value` /
  `evaluate_actions` mirror the reference's Policy API (policy.py:34-75).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["SimpleCNN", "GRUStateEncoder", "PointNavBaselineNet",
           "PointNavPolicy", "PolicyOutputs"]

orthogonal = nn.initializers.orthogonal


class SimpleCNN(nn.Module):
    """3-conv visual encoder (simple_cnn.py:44-99), NHWC."""
    output_size: int = 512

    @nn.compact
    def __call__(self, rgb: jnp.ndarray) -> jnp.ndarray:
        x = rgb.astype(jnp.float32) / 255.0
        x = nn.relu(nn.Conv(32, (8, 8), strides=(4, 4), padding="VALID",
                            kernel_init=orthogonal(np.sqrt(2)))(x))
        x = nn.relu(nn.Conv(64, (4, 4), strides=(2, 2), padding="VALID",
                            kernel_init=orthogonal(np.sqrt(2)))(x))
        x = nn.Conv(32, (3, 3), strides=(1, 1), padding="VALID",
                    kernel_init=orthogonal(np.sqrt(2)))(x)
        x = x.reshape(x.shape[:-3] + (-1,))
        x = nn.relu(nn.Dense(self.output_size,
                             kernel_init=orthogonal(np.sqrt(2)))(x))
        return x


class GRUCell(nn.Module):
    """GRU with torch gate conventions (rnn_state_encoder.py wraps nn.GRU).

    h' = (1-z) * n + z * h with n = tanh(W_in x + r * (W_hn h + b_hn)).
    Orthogonal weight init, zero bias (rnn_state_encoder.py:36-41).
    """
    hidden_size: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
        dense_i = nn.Dense(3 * self.hidden_size, use_bias=True,
                           kernel_init=orthogonal(), name="ih")
        dense_h = nn.Dense(3 * self.hidden_size, use_bias=True,
                           kernel_init=orthogonal(), name="hh")
        gi = dense_i(x)
        gh = dense_h(h)
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        return (1.0 - z) * n + z * h


class GRUStateEncoder(nn.Module):
    """Masked recurrent state encoder.

    Single step: x [N, D], h [N, H], mask [N] -> (feat [N, H], h').
    Sequence:    x [T, N, D], h0 [N, H], masks [T, N] -> ([T, N, H], hT)
    via lax.scan; mask==0 zeroes the carried hidden state (episode reset),
    matching rnn_state_encoder.py:66-71.
    """
    hidden_size: int

    @nn.compact
    def __call__(self, x, h, masks):
        cell = GRUCell(self.hidden_size)
        if x.ndim == 2:  # single step
            h = cell(x, h * masks[:, None])
            return h, h
        # Sequence: scan over T with shared params.
        scan_cell = nn.scan(
            lambda c, carry, xm: (c(xm[0], carry * xm[1][:, None]),) * 2,
            variable_broadcast="params", split_rngs={"params": False},
            in_axes=0, out_axes=0)
        hT, feats = scan_cell(cell, h, (x, masks))
        return feats, hT


class PointNavBaselineNet(nn.Module):
    """CNN(optional) + goal-vector concat + GRU (policy.py:117-181)."""
    hidden_size: int = 512
    blind: bool = True  # no rgb sensor -> goal-only input (is_blind path)
    goal_uuid: str = "pointgoal_with_gps_compass"

    @nn.compact
    def __call__(self, observations: Dict[str, jnp.ndarray], hidden, masks):
        target = observations[self.goal_uuid]
        xs = [target]
        if not self.blind:
            xs = [SimpleCNN(self.hidden_size)(observations["rgb"])] + xs
        x = jnp.concatenate(xs, axis=-1)
        return GRUStateEncoder(self.hidden_size)(x, hidden, masks)


class PolicyOutputs(tuple):
    pass


class PointNavPolicy(nn.Module):
    """Actor-critic with categorical action head (policy.py:21-75).

    Head inits mirror CategoricalNet (gain 0.01) and CriticHead
    (orthogonal, zero bias).
    """
    dim_actions: int
    hidden_size: int = 512
    blind: bool = True
    goal_uuid: str = "pointgoal_with_gps_compass"

    def setup(self):
        self.net = PointNavBaselineNet(self.hidden_size, self.blind,
                                       self.goal_uuid)
        self.action_head = nn.Dense(self.dim_actions,
                                    kernel_init=orthogonal(0.01))
        self.critic = nn.Dense(1, kernel_init=orthogonal())

    def __call__(self, observations, hidden, masks):
        # Default apply — used for init; same as act without sampling.
        feats, hidden = self.net(observations, hidden, masks)
        return self.action_head(feats), self.critic(feats)[..., 0], hidden

    def act(self, observations, hidden, prev_actions, masks, rng,
            deterministic: bool = False):
        """One env step: value [N], action [N], log_prob [N], hidden'."""
        del prev_actions  # baseline net ignores them (policy.py:166)
        feats, hidden = self.net(observations, hidden, masks)
        logits = self.action_head(feats)
        value = self.critic(feats)[..., 0]
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        sampled = jax.random.categorical(rng, logits, axis=-1)
        greedy = jnp.argmax(logits, axis=-1)
        action = jnp.where(deterministic, greedy, sampled)
        lp = jnp.take_along_axis(log_probs, action[:, None], axis=-1)[:, 0]
        return value, action, lp, hidden

    def get_value(self, observations, hidden, prev_actions, masks):
        del prev_actions
        feats, _ = self.net(observations, hidden, masks)
        return self.critic(feats)[..., 0]

    def evaluate_actions(self, observations, hidden, prev_actions, masks,
                         actions):
        """Sequence forward over [T, N]: values, action log-probs, mean
        entropy (policy.py:62-75)."""
        del prev_actions
        feats, _ = self.net(observations, hidden, masks)  # [T, N, H]
        logits = self.action_head(feats)
        values = self.critic(feats)[..., 0]
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        lp = jnp.take_along_axis(log_probs, actions[..., None],
                                 axis=-1)[..., 0]
        probs = jnp.exp(log_probs)
        entropy = -jnp.sum(probs * log_probs, axis=-1).mean()
        return values, lp, entropy


def init_policy(policy: PointNavPolicy, obs_space, rng,
                num_envs: int = 1) -> dict:
    """Initialize params from an observation-space template."""
    obs = {k: jnp.zeros((num_envs,) + tuple(s.shape), jnp.float32)
           for k, s in obs_space.spaces.items()}
    hidden = jnp.zeros((num_envs, policy.hidden_size), jnp.float32)
    masks = jnp.zeros((num_envs,), jnp.float32)
    return policy.init(rng, obs, hidden, masks)
