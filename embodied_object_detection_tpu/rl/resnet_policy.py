"""DD-PPO ResNet pointnav policy (flax).

Re-designs `PointNavResNetPolicy` / `ResNetEncoder`
(habitat_baselines/rl/ddppo/policy/resnet_policy.py:31-375) and the
GroupNorm ResNet family it builds on
(habitat_baselines/rl/ddppo/policy/resnet.py:313: narrow resnet18/50
with baseplanes=32 and GroupNorm — BatchNorm is unusable under DD-PPO's
small per-GPU batches; GroupNorm is mesh-friendly on TPU for the same
reason). Differences from the reference are executional only:

- NHWC + bf16-friendly flax modules, policy step fully jitted.
- The running mean/var input normalizer (RunningMeanAndVar) is replaced
  by fixed [0,1] scaling: a cross-device EMA of input statistics is a
  host-coupled stateful op that breaks the pure-function policy; the
  reference itself only normalizes depth/rgb to [0,1] first.
- prev-action + goal embeddings and the masked GRU sequence scan follow
  rl/policy.py.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from embodied_object_detection_tpu.rl.policy import (
    GRUStateEncoder, orthogonal)

__all__ = ["ResNetEncoder", "PointNavResNetPolicy"]


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    ngroups: int = 16

    @nn.compact
    def __call__(self, x):
        identity = x
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                    padding=1, use_bias=False)(x)
        y = nn.GroupNorm(num_groups=self.ngroups)(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False)(y)
        y = nn.GroupNorm(num_groups=self.ngroups)(y)
        if self.stride != 1 or identity.shape[-1] != self.planes:
            identity = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride,) * 2,
                               use_bias=False)(x)
            identity = nn.GroupNorm(num_groups=self.ngroups)(identity)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    ngroups: int = 16
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        identity = x
        out_ch = self.planes * self.expansion
        y = nn.Conv(self.planes, (1, 1), use_bias=False)(x)
        y = nn.relu(nn.GroupNorm(num_groups=self.ngroups)(y))
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                    padding=1, use_bias=False)(y)
        y = nn.relu(nn.GroupNorm(num_groups=self.ngroups)(y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False)(y)
        y = nn.GroupNorm(num_groups=self.ngroups)(y)
        if self.stride != 1 or identity.shape[-1] != out_ch:
            identity = nn.Conv(out_ch, (1, 1), strides=(self.stride,) * 2,
                               use_bias=False)(x)
            identity = nn.GroupNorm(num_groups=self.ngroups)(identity)
        return nn.relu(y + identity)


_BACKBONES = {
    # name -> (block, layers, expansion); resnet.py:229-313
    "resnet18": (BasicBlock, (2, 2, 2, 2), 1),
    "resnet50": (Bottleneck, (3, 4, 6, 3), 4),
}


class ResNetEncoder(nn.Module):
    """GroupNorm ResNet visual encoder + spatial compression
    (resnet_policy.py:60-180). ngroups defaults to baseplanes // 2
    (ddppo_trainer.py policy construction), which divides every layer's
    channel count in both block families."""
    backbone: str = "resnet18"
    baseplanes: int = 32
    ngroups: int = 0  # 0 -> baseplanes // 2
    output_size: int = 512

    @nn.compact
    def __call__(self, observations: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        inputs = []
        if "rgb" in observations:
            inputs.append(observations["rgb"].astype(jnp.float32) / 255.0)
        if "depth" in observations:
            inputs.append(observations["depth"].astype(jnp.float32))
        if not inputs:
            raise ValueError("ResNetEncoder needs rgb and/or depth")
        x = jnp.concatenate(inputs, axis=-1)

        ngroups = self.ngroups or max(1, self.baseplanes // 2)
        block, layers, expansion = _BACKBONES[self.backbone]
        x = nn.Conv(self.baseplanes, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False)(x)
        x = nn.relu(nn.GroupNorm(num_groups=ngroups)(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        planes = self.baseplanes
        for i, n in enumerate(layers):
            for j in range(n):
                x = block(planes, stride=2 if (i > 0 and j == 0) else 1,
                          ngroups=ngroups)(x)
            planes *= 2
        # compression conv (resnet_policy.py:141-156): 3x3 GN-relu down to
        # a small spatial map, then flatten + fc
        x = nn.Conv(self.output_size // 4, (3, 3), padding=1,
                    use_bias=False)(x)
        x = nn.relu(nn.GroupNorm(num_groups=ngroups)(x))
        x = x.reshape(x.shape[:-3] + (-1,))
        x = nn.relu(nn.Dense(self.output_size,
                             kernel_init=orthogonal(np.sqrt(2)))(x))
        return x


class PointNavResNetNet(nn.Module):
    """Visual embed + goal embed + prev-action embed -> masked GRU
    (resnet_policy.py:183-280)."""
    hidden_size: int = 512
    backbone: str = "resnet18"
    baseplanes: int = 32
    dim_actions: int = 4
    goal_uuid: str = "pointgoal_with_gps_compass"

    @nn.compact
    def __call__(self, observations, hidden, prev_actions, masks):
        tgt = observations[self.goal_uuid]
        # rho, cos/sin(-phi) featurization (resnet_policy.py:216-222)
        tgt = jnp.concatenate(
            [tgt[..., :1], jnp.cos(-tgt[..., 1:2]),
             jnp.sin(-tgt[..., 1:2])], axis=-1)
        goal_emb = nn.Dense(32, name="tgt_embed")(tgt)
        # prev_action + 1 with start token 0 (resnet_policy.py:236-241);
        # masks==0 at episode starts zeroes the embedding input
        pa = jnp.where(masks > 0, prev_actions.astype(jnp.int32) + 1, 0)
        act_emb = nn.Embed(self.dim_actions + 1, 32,
                           name="prev_action_embed")(pa)
        # flax GroupNorm treats only the leading axis as batch — flatten
        # the (T, N) sequence dims into one batch dim around the encoder
        lead = tgt.shape[:-1]
        vis_obs = {k: v.reshape((-1,) + v.shape[len(lead):])
                   for k, v in observations.items() if k in ("rgb", "depth")}
        vis = ResNetEncoder(self.backbone, self.baseplanes,
                            output_size=self.hidden_size,
                            name="visual_encoder")(vis_obs)
        vis = vis.reshape(lead + vis.shape[-1:])
        x = jnp.concatenate([vis, goal_emb, act_emb], axis=-1)
        return GRUStateEncoder(self.hidden_size)(x, hidden, masks)


class PointNavResNetPolicy(nn.Module):
    """Actor-critic over PointNavResNetNet; same act/get_value/
    evaluate_actions surface as rl.policy.PointNavPolicy."""
    dim_actions: int
    hidden_size: int = 512
    backbone: str = "resnet18"
    baseplanes: int = 32
    goal_uuid: str = "pointgoal_with_gps_compass"

    def setup(self):
        self.net = PointNavResNetNet(self.hidden_size, self.backbone,
                                     self.baseplanes, self.dim_actions,
                                     self.goal_uuid)
        self.action_head = nn.Dense(self.dim_actions,
                                    kernel_init=orthogonal(0.01))
        self.critic = nn.Dense(1, kernel_init=orthogonal())

    def __call__(self, observations, hidden, masks):
        prev = jnp.zeros(masks.shape, jnp.int32)
        feats, hidden = self.net(observations, hidden, prev, masks)
        return self.action_head(feats), self.critic(feats)[..., 0], hidden

    def act(self, observations, hidden, prev_actions, masks, rng,
            deterministic: bool = False):
        feats, hidden = self.net(observations, hidden, prev_actions, masks)
        logits = self.action_head(feats)
        value = self.critic(feats)[..., 0]
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        sampled = jax.random.categorical(rng, logits, axis=-1)
        greedy = jnp.argmax(logits, axis=-1)
        action = jnp.where(deterministic, greedy, sampled)
        lp = jnp.take_along_axis(log_probs, action[:, None], axis=-1)[:, 0]
        return value, action, lp, hidden

    def get_value(self, observations, hidden, prev_actions, masks):
        feats, _ = self.net(observations, hidden, prev_actions, masks)
        return self.critic(feats)[..., 0]

    def evaluate_actions(self, observations, hidden, prev_actions, masks,
                         actions):
        feats, _ = self.net(observations, hidden, prev_actions, masks)
        logits = self.action_head(feats)
        values = self.critic(feats)[..., 0]
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        lp = jnp.take_along_axis(log_probs, actions[..., None],
                                 axis=-1)[..., 0]
        probs = jnp.exp(log_probs)
        entropy = -jnp.sum(probs * log_probs, axis=-1).mean()
        return values, lp, entropy
