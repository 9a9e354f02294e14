"""Decentralized Distributed PPO (DD-PPO) over a jax Mesh.

Re-designs the reference's DD-PPO layer:

- `DDPPO` / `DecentralizedDistributedMixin`
  (habitat_baselines/rl/ddppo/algo/ddppo.py:45-96): DDP gradient hooks +
  globally-normalized advantages. TPU-native: the PPO update runs under
  `shard_map` over the mesh's data axis with envs sharded across devices;
  gradients are `pmean`ed and advantage statistics are `psum`ed inside
  the jitted program (`distributed_mean_and_var`, ddppo.py:18-42). XLA
  emits the all-reduces over ICI — there is no NCCL/GLOO analog to wire.
- Preemption/requeue machinery (`ddp_utils.py:26-110`): EXIT/REQUEUE
  signal events, interrupted-state save/load, SLURM detection.

The sync-frac early-stop (`ddppo_trainer.py:335-340`, a TCPStore counter
that lets stragglers abort rollout collection) is host-side coordination;
`NumRolloutsDoneStore` provides the same contract backed by
`jax.experimental.multihost_utils` when distributed is initialized and a
trivial local counter otherwise.
"""

from __future__ import annotations

import os
import pickle
import signal
import threading
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from embodied_object_detection_tpu.rl.ppo import (
    PPOConfig, PPOState, distributed_mean_and_var, make_ppo)

__all__ = [
    "make_ddppo", "distributed_mean_and_var", "EXIT", "REQUEUE",
    "add_signal_handlers", "save_interrupted_state",
    "load_interrupted_state", "requeue_job", "NumRolloutsDoneStore",
]


# --------------------------------------------------------------------------
# Distributed update
# --------------------------------------------------------------------------

# distributed_mean_and_var lives in ppo.py (the local update uses it under
# shard_map too) and is re-exported here for its reference-analog home.


def make_ddppo(evaluate_actions: Callable, cfg: PPOConfig, mesh: Mesh,
               axis: str = "data", tx=None):
    """Build (init_state, update) where update is sharded over `axis`.

    The rollout batch's env dimension (axis 1 of [T, N, ...] arrays, axis 0
    of hidden0) is split across the mesh axis; params/opt-state are
    replicated. Each shard runs the full PPO epoch/minibatch schedule on
    its local envs (identical permutations via the shared key — the
    reference's per-worker generators are independent too) and
    contributes to a pmean'd gradient per minibatch, which is DDP's
    exact semantics: decentralized rollouts, synchronous averaged grads.
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    init_state, local_update = make_ppo(evaluate_actions, cfg,
                                        axis_name=axis, tx=tx)

    def _spec_for_batch(batch):
        specs = {k: jax.tree_util.tree_map(lambda _: P(None, axis), v)
                 if k == "observations" else P(None, axis)
                 for k, v in batch.items() if k != "hidden0"}
        specs["hidden0"] = P(axis)
        return specs

    # One compiled program per (state, batch) tree structure: a fresh
    # shard_map closure + jax.jit wrapper per call would defeat the jit
    # cache (it is keyed on the wrapper object) and recompile the whole
    # epoch x minibatch program every update — minutes per PPO update on
    # TPU. Structures are stable across a run, so this compiles once.
    compiled = {}

    def update(state: PPOState, batch: Dict, perm_key: jax.Array):
        key = (jax.tree_util.tree_structure(state),
               jax.tree_util.tree_structure(batch))
        fn = compiled.get(key)
        if fn is None:
            batch_specs = _spec_for_batch(batch)
            replicated = jax.tree_util.tree_map(lambda _: P(), state)
            fn = jax.jit(shard_map(
                local_update, mesh=mesh,
                in_specs=(replicated, batch_specs, P()),
                out_specs=(replicated,
                           {"value_loss": P(), "action_loss": P(),
                            "dist_entropy": P()})))
            compiled[key] = fn
        return fn(state, batch, perm_key)

    return init_state, update


# --------------------------------------------------------------------------
# Preemption / requeue (ddp_utils.py analog)
# --------------------------------------------------------------------------

EXIT = threading.Event()
REQUEUE = threading.Event()

SLURM_JOBID = os.environ.get("SLURM_JOB_ID", None)


def _interrupted_state_file() -> str:
    base = os.path.join(os.path.expanduser("~"), ".interrupted_states")
    job = SLURM_JOBID or "local"
    return os.path.join(base, f"{job}.pkl")


def _clean_exit_handler(signum, frame):
    EXIT.set()
    print("Exiting cleanly", flush=True)


def _requeue_handler(signum, frame):
    print("Got signal to requeue", flush=True)
    EXIT.set()
    REQUEUE.set()


def add_signal_handlers() -> None:
    """SIGINT/SIGTERM/SIGUSR2 -> clean exit; SIGUSR1 -> requeue
    (ddp_utils.py:42-56)."""
    signal.signal(signal.SIGINT, _clean_exit_handler)
    signal.signal(signal.SIGTERM, _clean_exit_handler)
    signal.signal(signal.SIGUSR2, _clean_exit_handler)
    signal.signal(signal.SIGUSR1, _requeue_handler)


def save_interrupted_state(state: Dict, filename: Optional[str] = None):
    """Persist trainer state at preemption (ddp_utils.py:59-72). `state`
    must be picklable; jax arrays are converted to numpy first."""
    filename = filename or _interrupted_state_file()
    os.makedirs(os.path.dirname(filename), exist_ok=True)
    state = jax.tree_util.tree_map(
        lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, state)
    with open(filename, "wb") as f:
        pickle.dump(state, f)


def load_interrupted_state(filename: Optional[str] = None) -> Optional[Dict]:
    filename = filename or _interrupted_state_file()
    if not os.path.exists(filename):
        return None
    with open(filename, "rb") as f:
        return pickle.load(f)


def requeue_job() -> None:
    """Re-queue the SLURM job if REQUEUE was signalled
    (ddp_utils.py:86-96)."""
    if not (REQUEUE.is_set() and SLURM_JOBID):
        return
    import subprocess
    print(f"Requeueing job {SLURM_JOBID}", flush=True)
    subprocess.check_call(["scontrol", "requeue", SLURM_JOBID])


class NumRolloutsDoneStore:
    """Counter letting workers see how many peers finished their rollout,
    for sync-frac early stopping (ddppo_trainer.py:143-146, 335-340).

    Multi-process backing uses a shared file with advisory locking (the
    TCPStore analog that works in this env); single-process uses a plain
    int.
    """

    def __init__(self, path: Optional[str] = None):
        self._path = path
        self._local = 0
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            if not os.path.exists(path):
                with open(path, "w") as f:
                    f.write("0")

    def add(self, n: int = 1) -> None:
        if self._path is None:
            self._local += n
            return
        import fcntl
        with open(self._path, "r+") as f:
            fcntl.flock(f, fcntl.LOCK_EX)
            v = int(f.read() or 0) + n
            f.seek(0), f.truncate(), f.write(str(v))
            fcntl.flock(f, fcntl.LOCK_UN)

    def get(self) -> int:
        if self._path is None:
            return self._local
        with open(self._path) as f:
            return int(f.read() or 0)

    def reset(self) -> None:
        if self._path is None:
            self._local = 0
        else:
            with open(self._path, "w") as f:
                f.write("0")
