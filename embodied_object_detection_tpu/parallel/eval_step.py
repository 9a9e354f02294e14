"""Mesh-sharded episode-parallel inference (the TPU-native AsyncPredictor).

ref: the reference scales inference with one *process per GPU* pulling from
task queues (`AsyncPredictor`, Detic/detic/predictor.py:441-529) because its
episode loop is host-driven. Here an episode is a `lax.scan`, so episode
parallelism is just a sharded batch axis: one device runs one (or more)
episode stream(s), each with its own memory carry — streams never interact,
so the only collectives XLA inserts are for the replicated params (none at
steady state). Timing/AP aggregation happens host-side exactly like the
single-chip path.

Layout contract: frames and init_memory carry a leading [B] stream axis
sharded over the mesh 'data' axis (B % data_size == 0; pad with repeated
streams and drop them host-side). Params and zs_weight are replicated.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import DetectorConfig
from ..models.detector import (EmbodiedDetector, EpisodeOutputs,
                               make_batched_episode_runner)
from ..structures import MemoryState
from .mesh import replicate, shard_batch


def make_sharded_episode_runner(model: EmbodiedDetector, cfg: DetectorConfig,
                                mesh: Mesh, data_axis: str = "data"):
    """Returns run(params, frames, zs_weight, init_memory) -> EpisodeOutputs
    with every [B, ...] output sharded over the data axis.

    `frames` is a FrameInputs pytree with leading [B, T] axes; `init_memory`
    a MemoryState with leading [B]. The function device_puts inputs with the
    right shardings and calls the jitted batched runner — XLA partitions the
    vmapped scan along the stream axis with zero cross-stream traffic.
    """
    episode = make_batched_episode_runner(model, cfg)
    replicated = NamedSharding(mesh, P())
    jitted = jax.jit(episode)

    def run(params, frames, zs_weight, init_memory) -> EpisodeOutputs:
        b = frames.image.shape[0]
        d = mesh.shape[data_axis]
        if b % d != 0:
            raise ValueError(
                f"stream count {b} must be a multiple of the '{data_axis}' "
                f"axis size {d}; pad with repeated streams and drop "
                f"host-side")
        with mesh:
            params_d = replicate(mesh, params)
            zs_d = replicate(mesh, zs_weight)
            frames_d = shard_batch(mesh, frames, data_axis)
            mem_d = shard_batch(mesh, init_memory, data_axis)
            return jitted(params_d, frames_d, zs_d, mem_d)

    return run


def pad_streams(frames, init_memory: MemoryState, n_streams: int, multiple: int):
    """Pad the stream axis to a multiple by repeating stream 0; returns
    (frames, init_memory, real_count). Host-side; dropped after the run."""
    b = n_streams
    pad = (-b) % multiple
    if pad == 0:
        return frames, init_memory, b

    def rep(x):
        return np.concatenate([x, np.repeat(x[:1], pad, axis=0)], axis=0)

    frames = jax.tree_util.tree_map(rep, frames)
    init_memory = jax.tree_util.tree_map(rep, init_memory)
    return frames, init_memory, b
