"""PPO trainer over a VectorEnv (ppo_trainer.py re-design).

Mirrors `PPOTrainer` (habitat_baselines/rl/ppo/ppo_trainer.py:38-647):
rollout collection from parallel envs, scan-GAE returns, the jitted PPO
update, windowed episode stats, checkpointing and a deterministic eval
pass. DD-PPO mode (`distributed=True`) swaps in the mesh-sharded update
(`ddppo_trainer.py` analog) and supports preemption save/resume.

The env pool is the package's own `data.vector_env.VectorEnv`
(habitat/core/vector_env.py analog); policy steps are one jitted `act`
on the stacked observation batch.
"""

from __future__ import annotations

import json
import os
import pickle
import time
from collections import defaultdict, deque
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from embodied_object_detection_tpu.data.vector_env import ThreadedVectorEnv
from embodied_object_detection_tpu.rl.policy import (
    PointNavPolicy, init_policy)
from embodied_object_detection_tpu.rl.ppo import PPOConfig, make_ppo
from embodied_object_detection_tpu.rl.rollout import RolloutStorage

__all__ = ["PPOTrainerConfig", "PPOTrainer"]


@dataclass
class PPOTrainerConfig:
    num_envs: int = 4
    num_steps: int = 32            # rollout length T
    num_updates: int = 10
    hidden_size: int = 128
    with_rgb: bool = False
    ppo: PPOConfig = field(default_factory=PPOConfig)
    reward_window_size: int = 50
    seed: int = 0
    checkpoint_folder: Optional[str] = None
    checkpoint_interval: int = 0   # updates between checkpoints; 0 = off
    log_interval: int = 1
    distributed: bool = False
    mesh_axis: str = "data"


def _stack_obs(obs_list: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    keys = obs_list[0].keys()
    return {k: np.stack([np.asarray(o[k], np.float32) for o in obs_list])
            for k in keys}


class PPOTrainer:
    """Collect rollouts -> PPO update loop (ppo_trainer.py:217-420)."""

    def __init__(self, cfg: PPOTrainerConfig,
                 env_fn: Callable[[int], object],
                 vector_env_cls=ThreadedVectorEnv, mesh=None):
        self.cfg = cfg
        self.envs = vector_env_cls(
            [(lambda i=i: env_fn(i)) for i in range(cfg.num_envs)],
            auto_reset_done=True)
        # observation/action spaces from the pool's own env 0 (habitat's
        # VectorEnv CALL pattern) — a throwaway env_fn(0) would rerun the
        # whole dataset generation (Dijkstra floods per goal) a second time
        self._obs_space = self.envs.call("observation_space")[0]
        self._num_actions = self.envs.call("action_space")[0].n

        self.policy = PointNavPolicy(
            dim_actions=self._num_actions, hidden_size=cfg.hidden_size,
            blind=not cfg.with_rgb)
        rng = jax.random.PRNGKey(cfg.seed)
        rng, init_rng = jax.random.split(rng)
        params = init_policy(self.policy, self._obs_space, init_rng,
                             cfg.num_envs)
        self._rng = rng

        def evaluate_actions(p, obs, hidden0, prev_actions, masks, actions):
            return self.policy.apply(p, obs, hidden0, prev_actions, masks,
                                     actions, method=PointNavPolicy.
                                     evaluate_actions)

        # linear decay schedules pace themselves by ppo.num_updates;
        # default it to the trainer's plan so enabling the flag works
        # without duplicating the count (ppo_trainer.py:328-343)
        import dataclasses as _dc
        if (cfg.ppo.use_linear_lr_decay or cfg.ppo.use_linear_clip_decay) \
                and cfg.ppo.num_updates == 0:
            cfg.ppo = _dc.replace(cfg.ppo, num_updates=cfg.num_updates)

        if cfg.distributed:
            from embodied_object_detection_tpu.rl.ddppo import make_ddppo
            assert mesh is not None, "distributed=True requires a mesh"
            init_state, self._update = make_ddppo(
                evaluate_actions, cfg.ppo, mesh, axis=cfg.mesh_axis)
        else:
            init_state, self._update = make_ppo(evaluate_actions, cfg.ppo)
            self._update = jax.jit(self._update)
        self.state = init_state(params)

        self._act = jax.jit(
            lambda p, obs, h, prev, m, key: self.policy.apply(
                p, obs, h, prev, m, key, method=PointNavPolicy.act))
        self._get_value = jax.jit(
            lambda p, obs, h, prev, m: self.policy.apply(
                p, obs, h, prev, m, method=PointNavPolicy.get_value))

        self.rollouts = RolloutStorage(cfg.num_steps, cfg.num_envs,
                                       self._obs_space, cfg.hidden_size)
        self.window_episode_reward = deque(maxlen=cfg.reward_window_size)
        self.window_episode_metrics: Dict[str, deque] = defaultdict(
            lambda: deque(maxlen=cfg.reward_window_size))
        self._episode_rewards = np.zeros(cfg.num_envs)
        self.metrics_log: List[dict] = []
        self.num_steps_done = 0

    def _fingerprint(self) -> str:
        """Identifies the experiment an interrupted state belongs to."""
        c = self.cfg
        return (f"envs{c.num_envs}-steps{c.num_steps}-hid{c.hidden_size}-"
                f"rgb{int(c.with_rgb)}-acts{self._num_actions}")

    # -- rollout collection (ppo_trainer.py:217-280) -----------------------
    def _collect_rollout_step(self, hidden, prev_actions, masks):
        t = self.rollouts.step
        obs = {k: jnp.asarray(v[t]) for k, v in
               self.rollouts.observations.items()}
        self._rng, key = jax.random.split(self._rng)
        value, action, log_prob, hidden = self._act(
            self.state.params, obs, hidden, prev_actions, masks, key)
        actions_np = np.asarray(action)

        results = self.envs.step([int(a) for a in actions_np])
        obs_list, rewards, dones, infos = zip(*results)
        rewards = np.asarray(rewards, np.float32)
        dones = np.asarray(dones, bool)

        self._episode_rewards += rewards
        for i, d in enumerate(dones):
            if d:
                self.window_episode_reward.append(self._episode_rewards[i])
                self._episode_rewards[i] = 0.0
                for k, v in infos[i].items():
                    if np.isscalar(v) and np.isfinite(v):
                        self.window_episode_metrics[k].append(float(v))

        new_masks = (~dones).astype(np.float32)
        stacked = _stack_obs(list(obs_list))
        self.rollouts.insert(stacked, hidden, actions_np,
                             np.asarray(log_prob), np.asarray(value),
                             rewards, new_masks)
        self.num_steps_done += self.cfg.num_envs
        return hidden, jnp.asarray(actions_np), jnp.asarray(new_masks)

    # -- train loop (ppo_trainer.py:282-420; DD-PPO preemption wiring per
    # ddppo_trainer.py:150-180, 330-380) -----------------------------------
    def train(self, num_updates: Optional[int] = None,
              handle_preemption: bool = False) -> List[dict]:
        cfg = self.cfg
        num_updates = num_updates or cfg.num_updates
        if (cfg.ppo.use_linear_lr_decay or cfg.ppo.use_linear_clip_decay) \
                and cfg.ppo.num_updates not in (0, num_updates):
            print(f"warning: lr/clip decay paced by ppo.num_updates="
                  f"{cfg.ppo.num_updates}, training {num_updates} updates")
        start_update = 0

        if handle_preemption:
            from embodied_object_detection_tpu.rl import ddppo
            ddppo.add_signal_handlers()
            interrupted = ddppo.load_interrupted_state()
            if interrupted is not None and \
                    interrupted.get("fingerprint") == self._fingerprint():
                params = jax.tree_util.tree_map(jnp.asarray,
                                                interrupted["params"])
                opt_state = jax.tree_util.tree_map(
                    jnp.asarray, interrupted["opt_state"])
                start_update = int(interrupted.get("update", 0))
                # update_idx paces the linear lr/clip decay schedules —
                # without restoring it a requeue snaps clip_param back to
                # its full value (lr only survives via Adam's count)
                self.state = self.state._replace(
                    params=params, opt_state=opt_state,
                    update_idx=jnp.asarray(start_update,
                                           self.state.update_idx.dtype))
                self.num_steps_done = int(interrupted.get("steps", 0))
            if interrupted is not None:
                # consume the state file either way: a fingerprint mismatch
                # means it belongs to a different experiment and must not
                # hijack later runs
                f = ddppo._interrupted_state_file()
                if os.path.exists(f):
                    os.remove(f)

        obs_list = self.envs.reset()
        self.rollouts.set_first_observations(_stack_obs(obs_list))
        hidden = jnp.zeros((cfg.num_envs, cfg.hidden_size), jnp.float32)
        prev_actions = jnp.zeros((cfg.num_envs,), jnp.int32)
        masks = jnp.zeros((cfg.num_envs,), jnp.float32)

        for update in range(start_update, num_updates):
            if handle_preemption:
                from embodied_object_detection_tpu.rl import ddppo
                if ddppo.EXIT.is_set():
                    ddppo.save_interrupted_state({
                        "params": jax.tree_util.tree_map(
                            np.asarray, self.state.params),
                        "opt_state": jax.tree_util.tree_map(
                            np.asarray, self.state.opt_state),
                        "fingerprint": self._fingerprint(),
                        "update": update, "steps": self.num_steps_done})
                    ddppo.requeue_job()
                    return self.metrics_log
            for _ in range(cfg.num_steps):
                hidden, prev_actions, masks = self._collect_rollout_step(
                    hidden, prev_actions, masks)

            t = self.rollouts.step
            last_obs = {k: jnp.asarray(v[t]) for k, v in
                        self.rollouts.observations.items()}
            next_value = self._get_value(self.state.params, last_obs,
                                         hidden, prev_actions, masks)
            self.rollouts.compute_returns(np.asarray(next_value),
                                          cfg.ppo.use_gae, cfg.ppo.gamma,
                                          cfg.ppo.tau)

            self._rng, perm_key = jax.random.split(self._rng)
            self.state, metrics = self._update(
                self.state, self.rollouts.batch(), perm_key)
            self.rollouts.after_update()

            row = {
                "update": update,
                "steps": self.num_steps_done,
                "reward": (float(np.mean(self.window_episode_reward))
                           if self.window_episode_reward else 0.0),
                **{k: float(np.asarray(v)) for k, v in metrics.items()},
                **{f"metrics/{k}": float(np.mean(v))
                   for k, v in self.window_episode_metrics.items() if v},
            }
            self.metrics_log.append(row)
            if cfg.checkpoint_interval and cfg.checkpoint_folder and \
                    (update + 1) % cfg.checkpoint_interval == 0:
                self.save_checkpoint(f"ckpt.{update}.pkl")
        return self.metrics_log

    # -- checkpointing (ppo_trainer.py:64-101) -----------------------------
    def save_checkpoint(self, name: str) -> str:
        os.makedirs(self.cfg.checkpoint_folder, exist_ok=True)
        path = os.path.join(self.cfg.checkpoint_folder, name)
        blob = {
            "params": jax.tree_util.tree_map(np.asarray, self.state.params),
            "update_idx": int(self.state.update_idx),
            "num_steps_done": self.num_steps_done,
        }
        with open(path, "wb") as f:
            pickle.dump(blob, f)
        return path

    def load_checkpoint(self, path: str) -> None:
        with open(path, "rb") as f:
            blob = pickle.load(f)
        params = jax.tree_util.tree_map(jnp.asarray, blob["params"])
        self.state = self.state._replace(params=params)
        self.num_steps_done = blob.get("num_steps_done", 0)

    # -- eval (ppo_trainer.py:422-647 _eval_checkpoint) --------------------
    def evaluate(self, env, num_episodes: int = 4,
                 max_steps: int = 200) -> Dict[str, float]:
        """Deterministic rollout over `num_episodes`; returns mean metrics."""
        totals: Dict[str, List[float]] = defaultdict(list)
        for _ in range(num_episodes):
            obs = env.reset()
            hidden = jnp.zeros((1, self.cfg.hidden_size), jnp.float32)
            prev = jnp.zeros((1,), jnp.int32)
            mask = jnp.zeros((1,), jnp.float32)
            done = False
            steps = 0
            ep_reward = 0.0
            info: dict = {}
            while not done and steps < max_steps:
                bobs = {k: jnp.asarray(np.asarray(v, np.float32))[None]
                        for k, v in obs.items()}
                self._rng, key = jax.random.split(self._rng)
                _, action, _, hidden = self._act(
                    self.state.params, bobs, hidden, prev, mask, key)
                obs, reward, done, info = env.step(int(np.asarray(action)[0]))
                ep_reward += reward
                mask = jnp.ones((1,), jnp.float32)
                steps += 1
            totals["reward"].append(ep_reward)
            for k, v in info.items():
                if np.isscalar(v) and np.isfinite(v):
                    totals[k].append(float(v))
        return {k: float(np.mean(v)) for k, v in totals.items()}

    def close(self) -> None:
        self.envs.close()
