"""Functional PPO (habitat_baselines/rl/ppo/ppo.py re-design).

The reference's `PPO.update` (ppo.py:62-152) runs ppo_epoch x
num_mini_batch backward/step iterations in Python with a fresh env
permutation per epoch (`recurrent_generator`,
rollout_storage.py:136-229). Here the whole update is ONE jitted
program: a `lax.scan` over the (epoch*minibatch) grid where each step
gathers its env slice with `jnp.take`, evaluates the sequence policy,
and applies an Adam step — static shapes, no host round-trips between
minibatches.

Loss parity: clipped surrogate + optional clipped value loss + entropy
bonus, normalized advantages (eps 1e-5), global grad-norm clip
(ppo.py:105-134, 161-164).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

EPS_PPO = 1e-5

__all__ = ["PPOConfig", "PPOState", "make_ppo", "ppo_loss",
           "distributed_mean_and_var"]


def distributed_mean_and_var(values: jnp.ndarray, axis_name: str):
    """Global mean/var across a named mesh axis (ddppo.py:18-42). Lives
    here (not ddppo.py) because the local PPO update also uses it when run
    under shard_map; ddppo re-exports it."""
    n = jax.lax.psum(jnp.asarray(values.size, jnp.float32), axis_name)
    mean = jax.lax.psum(values.sum(), axis_name) / n
    var = jax.lax.psum(((values - mean) ** 2).sum(), axis_name) / n
    return mean, var


@dataclass(frozen=True)
class PPOConfig:
    clip_param: float = 0.2
    ppo_epoch: int = 4
    num_mini_batch: int = 2
    value_loss_coef: float = 0.5
    entropy_coef: float = 0.01
    lr: float = 2.5e-4
    eps: float = 1e-5
    max_grad_norm: float = 0.5
    use_gae: bool = True
    gamma: float = 0.99
    tau: float = 0.95
    use_clipped_value_loss: bool = True
    use_normalized_advantage: bool = True
    # linear schedules over num_updates (ppo_trainer.py:328-343); 0 = off
    use_linear_lr_decay: bool = False
    use_linear_clip_decay: bool = False
    num_updates: int = 0


class PPOState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    update_idx: jnp.ndarray


def _make_optimizer(cfg: PPOConfig) -> optax.GradientTransformation:
    if cfg.use_linear_lr_decay and cfg.num_updates > 0:
        # one optimizer step per minibatch; decay per *update*
        # (ppo_trainer.py:330 linear_decay over NUM_UPDATES)
        per_update = cfg.ppo_epoch * cfg.num_mini_batch

        def schedule(count):
            frac = jnp.minimum(count // per_update, cfg.num_updates) \
                / cfg.num_updates
            return cfg.lr * (1.0 - frac)
        return optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adam(schedule, eps=cfg.eps))
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adam(cfg.lr, eps=cfg.eps))


def ppo_loss(evaluate_actions: Callable, params, minibatch: Dict,
             cfg: PPOConfig,
             clip_param=None) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Loss for one minibatch of shape [T, n_envs, ...] (ppo.py:84-134).
    `clip_param` overrides cfg.clip_param (traced, for linear clip decay)."""
    clip = cfg.clip_param if clip_param is None else clip_param
    values, log_probs, entropy = evaluate_actions(
        params, minibatch["observations"], minibatch["hidden0"],
        minibatch["prev_actions"], minibatch["masks"], minibatch["actions"])

    ratio = jnp.exp(log_probs - minibatch["old_log_probs"])
    adv = minibatch["advantages"]
    surr1 = ratio * adv
    surr2 = jnp.clip(ratio, 1.0 - clip, 1.0 + clip) * adv
    action_loss = -jnp.minimum(surr1, surr2).mean()

    returns = minibatch["returns"]
    if cfg.use_clipped_value_loss:
        v_old = minibatch["value_preds"]
        v_clipped = v_old + jnp.clip(values - v_old, -clip, clip)
        value_loss = 0.5 * jnp.maximum((values - returns) ** 2,
                                       (v_clipped - returns) ** 2).mean()
    else:
        value_loss = 0.5 * ((returns - values) ** 2).mean()

    total = (value_loss * cfg.value_loss_coef + action_loss
             - entropy * cfg.entropy_coef)
    return total, {"value_loss": value_loss, "action_loss": action_loss,
                   "dist_entropy": entropy}


def make_ppo(evaluate_actions: Callable, cfg: PPOConfig,
             axis_name: Optional[str] = None,
             tx: Optional[optax.GradientTransformation] = None):
    """Build (init_state, update) for PPO.

    `evaluate_actions(params, obs, hidden0, prev_actions, masks, actions)`
    -> (values [T,n], log_probs [T,n], entropy scalar).

    `axis_name` switches on DD-PPO semantics: grads `pmean`ed and
    advantage statistics computed globally across the named mesh axis
    (ddppo.py:18-55) — see rl/ddppo.py for the shard_map wrapper.
    `tx` overrides the clipped-Adam default (ppo.py:43-48, 161-164).
    """
    tx = tx if tx is not None else _make_optimizer(cfg)

    def init_state(params) -> PPOState:
        return PPOState(params, tx.init(params), jnp.zeros((), jnp.int32))

    def _advantages(batch):
        adv = batch["returns"] - batch["value_preds"]
        if not cfg.use_normalized_advantage:
            return adv
        if axis_name is None:
            mean, var = adv.mean(), adv.var()
        else:
            mean, var = distributed_mean_and_var(adv, axis_name)
        return (adv - mean) / (jnp.sqrt(var) + EPS_PPO)

    def _minibatch_step(carry, env_idx):
        params, opt_state, batch = carry
        mb = {
            "observations": jax.tree_util.tree_map(
                lambda x: jnp.take(x, env_idx, axis=1),
                batch["observations"]),
            "hidden0": jnp.take(batch["hidden0"], env_idx, axis=0),
        }
        for k in ("actions", "prev_actions", "value_preds", "returns",
                  "masks", "old_log_probs", "advantages"):
            mb[k] = jnp.take(batch[k], env_idx, axis=1)

        (_, metrics), grads = jax.value_and_grad(
            lambda p: ppo_loss(evaluate_actions, p, mb, cfg,
                               clip_param=batch.get("clip_param")),
            has_aux=True)(params)
        if axis_name is not None:
            # Under shard_map (jax>=0.9 varying-types AD), grads w.r.t.
            # replicated params are ALREADY psum'd across the axis by the
            # transpose rule; dividing by the axis size yields the
            # DDP-averaged gradient (ddppo.py:45-96). A pmean here would
            # silently keep the sum (all shards hold the same value).
            size = jax.lax.axis_size(axis_name)
            grads = jax.tree_util.tree_map(lambda g: g / size, grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, batch), metrics

    def update(state: PPOState, batch: Dict, perm_key: jax.Array):
        """One PPO update over a full rollout batch.

        batch: output of RolloutStorage.batch(). perm_key: PRNGKey for the
        per-epoch env permutations.
        """
        num_envs = batch["actions"].shape[1]
        assert num_envs % cfg.num_mini_batch == 0, (
            f"num_envs {num_envs} % num_mini_batch {cfg.num_mini_batch}")
        envs_per_mb = num_envs // cfg.num_mini_batch

        batch = dict(batch)
        batch["advantages"] = _advantages(batch)
        if cfg.use_linear_clip_decay and cfg.num_updates > 0:
            frac = jnp.minimum(state.update_idx, cfg.num_updates) \
                / cfg.num_updates
            batch["clip_param"] = cfg.clip_param * (1.0 - frac)

        keys = jax.random.split(perm_key, cfg.ppo_epoch)
        perms = jnp.stack([jax.random.permutation(k, num_envs)
                           for k in keys])  # [E, N]
        mb_indices = perms.reshape(
            cfg.ppo_epoch * cfg.num_mini_batch, envs_per_mb)

        (params, opt_state, _), metrics = jax.lax.scan(
            _minibatch_step, (state.params, state.opt_state, batch),
            mb_indices)
        metrics = jax.tree_util.tree_map(jnp.mean, metrics)
        if axis_name is not None:
            # Report globally-averaged losses (the reference logs each
            # worker's local loss; a replicated global mean is required for
            # the shard_map out_spec and is what gets logged anyway).
            metrics = jax.lax.pmean(metrics, axis_name)
        return PPOState(params, opt_state, state.update_idx + 1), metrics

    return init_state, update
