"""Device mesh construction and sharding helpers.

Replaces the reference's process-per-GPU launch stack — detectron2 `launch` +
DistributedDataParallel + NCCL/GLOO/TCPStore rendezvous
(train_mp3d.py:747-752, 826-857; habitat ddp_utils.py:114-166) — with a
single-program jax.sharding Mesh. Collectives (loss psum = the analog of
comm.reduce_dict, gradient all-reduce = the analog of DDP buckets) are
inserted by XLA from sharding annotations and ride ICI; multi-host meshes
extend over DCN with no extra code (jax.distributed.initialize).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ParallelConfig


def make_mesh(cfg: Optional[ParallelConfig] = None,
              devices=None) -> Mesh:
    cfg = cfg or ParallelConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    mp = max(1, cfg.model_parallel)
    dp = cfg.data_parallel if cfg.data_parallel > 0 else n // mp
    if dp * mp != n:
        raise ValueError(
            f"{n} devices do not factor into data_parallel={dp} x "
            f"model_parallel={mp}; silently dropping devices would lose "
            "throughput (set parallel.data_parallel/model_parallel "
            "explicitly)")
    arr = np.asarray(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(arr, (cfg.data_axis, cfg.model_axis))


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Shard the leading (batch) dim of every leaf across the data axis."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def shard_zs_weight(mesh: Mesh, zs_weight, axis: str = "model"):
    """Shard the class dimension of the CLIP classifier matrix over the
    model axis — lightweight tensor parallelism for the zs_weight matmul
    (logits columns computed per shard; XLA re-gathers where needed). The
    reference has no TP (SURVEY §2.4); this is the one place the detector's
    math offers a clean model axis (the [D, C+1] classifier, C up to 22k for
    in21k vocabularies). Falls back to replication when the class count
    doesn't divide the axis."""
    n = mesh.shape[axis]
    if zs_weight.shape[-1] % n != 0:
        return jax.device_put(zs_weight, NamedSharding(mesh, P()))
    return jax.device_put(zs_weight, NamedSharding(mesh, P(None, axis)))
