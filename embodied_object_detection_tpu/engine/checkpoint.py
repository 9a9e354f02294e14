"""Checkpoint / resume.

ref: fvcore DetectionCheckpointer + PeriodicCheckpointer usage
(train_mp3d.py:520-532, 716-719) -> orbax; and the memory-state h5 snapshots
written under TEST_SAVE_SEMMAP (custom_rcnn.py:518-530) / read back via
SEMMAP_PATH (loader.py:216-227) — including the reference's `impicit_memory`
key typo, preserved for dataset-level interoperability.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def save_checkpoint(directory: str, step: int, state: Any) -> str:
    """Save a pytree (params / TrainState) with orbax. Overwrites an
    existing checkpoint of the same step like fvcore's Checkpointer —
    re-running training into the same output_dir must not crash at the
    first checkpoint_period (orbax raises on existing destinations)."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(directory, f"ckpt_{step:07d}"))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    return path


def restore_checkpoint(path: str, template: Any) -> Any:
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), template)


def latest_checkpoint(directory: str) -> Optional[str]:
    if not os.path.isdir(directory):
        return None
    # skip orbax in-progress temp dirs — resuming from a half-written
    # checkpoint after a crash is exactly what resume must survive
    cands = sorted(x for x in os.listdir(directory)
                   if x.startswith("ckpt_") and "tmp" not in x)
    return os.path.join(directory, cands[-1]) if cands else None


class PeriodicCheckpointer:
    """ref: fvcore PeriodicCheckpointer semantics (every `period` iters +
    final)."""

    def __init__(self, directory: str, period: int, max_iter: int):
        self.directory = directory
        self.period = period
        self.max_iter = max_iter

    def step(self, iteration: int, state: Any):
        # period <= 0 disables periodic saves (fvcore semantics); the
        # final-iteration save still happens
        periodic = self.period > 0 and (iteration + 1) % self.period == 0
        if periodic or (iteration + 1) == self.max_iter:
            save_checkpoint(self.directory, iteration + 1, state)


def save_memory_h5(output_dir: str, sequence_name: str, semmap: np.ndarray,
                   implicit_memory: np.ndarray, observations: np.ndarray):
    """Memory snapshot in the reference's exact h5 schema
    (custom_rcnn.py:527-530): datasets `semmap` (int32), `impicit_memory`
    [sic] (float32), `observations` (float32)."""
    import h5py
    os.makedirs(os.path.join(output_dir, "memory"), exist_ok=True)
    path = os.path.join(output_dir, "memory", sequence_name)
    with h5py.File(path, "w") as f:
        f.create_dataset("semmap", data=np.asarray(semmap, np.int32))
        f.create_dataset("impicit_memory",
                         data=np.asarray(implicit_memory, np.float32))
        f.create_dataset("observations",
                         data=np.asarray(observations, np.float32))
    return path


def load_memory_h5(path: str):
    """Inverse of save_memory_h5 (ref: loader.py:216-223 — also bumps semmap
    ids by +1 there; we return raw values and let callers shift)."""
    import h5py
    with h5py.File(path, "r") as f:
        return (np.array(f["semmap"]), np.array(f["impicit_memory"]),
                np.array(f["observations"]))
