"""Training loop (the do_train analog).

ref: Detic/train_mp3d.py:509-659. Protocol reproduced:
  * random chunk sampling (TrainingSampler), IMS_PER_BATCH chunks per step
  * per-frame losses averaged over the whole batch of frames
    (custom_rcnn.py:541-544)
  * precomputed memory per frame from SEMMAP_PATH snapshots
  * finite-loss assert (train_mp3d.py:618), metrics.json JSON-lines writer
    (:537), periodic checkpoint + eval

The reference's serial per-frame python loop becomes one jitted sharded step
over a [B_frames] batch (frames are independent in training — the memory is
precomputed, never written online).
"""

from __future__ import annotations

import json
import math
import os
import time
from typing import Callable, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DetectorConfig
from ..data.episode_dataset import EpisodeDataset, EpisodeChunk
from ..models.detector import EmbodiedDetector
from ..parallel.mesh import make_mesh, replicate, shard_batch
from ..parallel.train_step import (TrainBatch, TrainState, jit_train_step,
                                   make_train_step)
from .checkpoint import PeriodicCheckpointer, latest_checkpoint, restore_checkpoint


def chunks_to_train_batch(chunks: List[EpisodeChunk], cfg: DetectorConfig,
                          frames_per_chunk: Optional[int] = None,
                          rng: Optional[np.random.RandomState] = None,
                          pad_to_multiple: int = 1,
                          pad_to_total: Optional[int] = None) -> TrainBatch:
    """Flatten chunks into a frame batch with padded precomputed memory.
    Pads with zero-weight frames up to a multiple of `pad_to_multiple`
    (the mesh data-axis size), and up to `pad_to_total` when given — the
    train loop passes ims_per_batch * t_max so the jitted step sees ONE
    batch shape regardless of ragged chunks (every distinct total would
    otherwise recompile, minutes per shape on a tunneled backend)."""
    cells = cfg.memory.max_cells
    d = cfg.memory.memory_dim
    images, projs, memfs, memos, gbs, gcs, gvs = [], [], [], [], [], [], []
    for ch in chunks:
        t = int(ch.frame_valid.sum())
        ids = range(t)
        if frames_per_chunk is not None and frames_per_chunk < t:
            r = rng or np.random
            ids = sorted(r.choice(t, frames_per_chunk, replace=False))
        # fail loudly like the eval path (chunk_to_frame_inputs): a scene
        # bigger than memory.max_cells would train on silently truncated
        # memory with gather-clamped proj indices — losses stay finite,
        # the corruption is invisible
        hi = int(ch.proj_indices.max())
        if hi >= cells:
            raise ValueError(
                f"{ch.sequence_name}: proj index {hi} >= memory.max_cells="
                f"{cells}; raise memory.max_cells")
        memf = np.zeros((cells, d), np.float32)
        memo = np.zeros((cells,), np.float32)
        if ch.memory_features is not None:
            if ch.memory_features.shape[0] > cells or \
                    ch.memory_features.shape[1] != d:
                raise ValueError(
                    f"{ch.sequence_name}: memory snapshot "
                    f"{ch.memory_features.shape} does not fit "
                    f"[{cells}, {d}]")
            n = ch.memory_features.shape[0]
            memf[:n] = ch.memory_features
            if ch.observations is not None:
                memo[:n] = ch.observations[:n]
        for i in ids:
            images.append(ch.images[i].astype(np.float32))
            projs.append(ch.proj_indices[i])
            memfs.append(memf)
            memos.append(memo)
            gbs.append(ch.gt_boxes[i])
            gcs.append(ch.gt_classes[i])
            gvs.append(ch.gt_valid[i])
    b = len(images)
    if b == 0:
        raise ValueError(
            "no valid frames in the sampled chunks "
            f"({[ch.sequence_name for ch in chunks]}) — a sensor h5 with an "
            "empty detection_data table yields frame_valid all-False; fix "
            "or exclude the file")
    target = b + (-b) % max(pad_to_multiple, 1)
    if pad_to_total is not None:
        if b > pad_to_total:
            raise ValueError(f"{b} frames exceed pad_to_total={pad_to_total}")
        target = max(target,
                     pad_to_total + (-pad_to_total) % max(pad_to_multiple, 1))
    pad = target - b
    weight = [1.0] * b + [0.0] * pad
    # reference normalizer: n_chunks * frames-in-FIRST-chunk
    # (custom_rcnn.py:541-544); equals b when every chunk is full
    t_first = int(chunks[0].frame_valid.sum())
    if frames_per_chunk is not None:
        t_first = min(t_first, frames_per_chunk)
    loss_norm = float(len(chunks) * t_first)
    for _ in range(pad):
        images.append(np.zeros_like(images[0]))
        projs.append(np.zeros_like(projs[0]))
        memfs.append(np.zeros_like(memfs[0]))
        memos.append(np.zeros_like(memos[0]))
        gbs.append(np.zeros_like(gbs[0]))
        gcs.append(np.zeros_like(gcs[0]))
        gvs.append(np.zeros_like(gvs[0]))
    return TrainBatch(
        image=np.stack(images), proj_indices=np.stack(projs),
        mem_features=np.stack(memfs), mem_obs=np.stack(memos),
        gt_boxes=np.stack(gbs), gt_classes=np.stack(gcs),
        gt_valid=np.stack(gvs), weight=np.asarray(weight, np.float32),
        loss_norm=np.full(len(weight), loss_norm, np.float32))


class MetricsWriter:
    """detectron2 JSONWriter + TensorboardXWriter analog
    (train_mp3d.py:534-542): one JSON line per logging period, mirrored
    into a tensorboard events file under <output_dir>/tb/."""

    def __init__(self, output_dir: str, tensorboard: bool = True):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, "metrics.json")
        self._tb = None
        if tensorboard:
            from ..utils.tb_writer import SummaryWriter
            self._tb = SummaryWriter(os.path.join(output_dir, "tb"))

    def write(self, iteration: int, scalars: Dict[str, float]):
        rec = {"iteration": iteration,
               **{k: float(v) for k, v in scalars.items()}}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            self._tb.add_scalars(
                {k: v for k, v in rec.items() if k != "iteration"},
                iteration)


def load_fed_freq_weight(cfg: DetectorConfig) -> Optional[np.ndarray]:
    """Class-frequency table for the federated loss / zero-cat masking.

    ref: detic_fast_rcnn.py:85-89 — freq_weight is loaded when use_fed_loss
    OR ignore_zero_cats (consumed at :214 and :225/:243); a short table is
    zero-padded to num_classes (:91-97). Returns None when neither knob is
    set."""
    if not (cfg.roi.use_fed_loss or cfg.roi.ignore_zero_cats):
        return None
    from ..data.catalog import load_class_freq
    fed_w = load_class_freq(cfg.roi.cat_freq_path)
    if fed_w.shape[0] < cfg.roi.num_classes:
        fed_w = np.concatenate(
            [fed_w, np.zeros(cfg.roi.num_classes - fed_w.shape[0],
                             fed_w.dtype)])
    elif fed_w.shape[0] > cfg.roi.num_classes:
        raise ValueError(
            f"cat_freq_path table has {fed_w.shape[0]} classes, model "
            f"has only {cfg.roi.num_classes}")
    n_pos = int((fed_w > 0).sum())
    if cfg.roi.use_fed_loss and cfg.roi.fed_loss_num_cat > n_pos:
        # torch.multinomial(replacement=False) would raise at runtime the
        # first time it is asked for more samples than positive-weight
        # classes; fail at build time instead
        raise ValueError(
            f"roi.fed_loss_num_cat={cfg.roi.fed_loss_num_cat} exceeds "
            f"the {n_pos} positive-frequency classes in "
            f"{cfg.roi.cat_freq_path}; the federated mask would "
            f"degenerate to all-ones (torch errors here)")
    return fed_w


def train(model: EmbodiedDetector, params, cfg: DetectorConfig,
          dataset: EpisodeDataset, zs_weight: np.ndarray,
          max_iter: Optional[int] = None, resume: bool = False,
          frames_per_chunk: Optional[int] = None,
          eval_fn: Optional[Callable[[TrainState], None]] = None,
          eval_period: int = 0, log_period: int = 20,
          seed: int = 0, verbose: bool = True,
          batch_fn: Optional[Callable] = None) -> TrainState:
    """`batch_fn(it, rng, dp) -> TrainBatch` overrides the episode-chunk
    loader (dataset may then be None) — the vanilla single-frame trainer
    (train_net.py analog, engine/coco.py batches) shares this loop's
    solver/resume/metrics/prefetch machinery instead of duplicating it."""
    solver = cfg.solver
    max_iter = max_iter if max_iter is not None else solver.max_iter
    mesh = make_mesh(cfg.parallel)

    fed_w = load_fed_freq_weight(cfg)
    init_state, step_fn = make_train_step(model, cfg, fed_freq_weight=fed_w)
    state, _ = init_state(params)
    start_iter = 0
    if resume:
        ck = latest_checkpoint(cfg.output_dir)
        if ck:
            state = restore_checkpoint(ck, state)
            start_iter = int(state.step)
            if verbose:
                print(f"resumed from {ck} @ iter {start_iter}")

    writer = MetricsWriter(cfg.output_dir)
    checkpointer = PeriodicCheckpointer(cfg.output_dir,
                                        solver.checkpoint_period, max_iter)
    zs = jnp.asarray(zs_weight, jnp.float32)

    def iter_rng(it: int) -> np.random.RandomState:
        # per-iteration stream keyed on (seed, iteration): a resumed run
        # continues sampling where it left off instead of replaying the
        # pre-crash index sequence (detectron2's seeded TrainingSampler
        # continues its stream; a single RandomState rebuilt at resume
        # would restart it)
        return np.random.RandomState(
            np.random.SeedSequence([seed, it]).generate_state(1)[0])

    with mesh:
        # the jitted step donates its state argument, and device_put into
        # the replicated sharding can ALIAS the caller's buffers (it does
        # on the CPU backend; on TPU the in-mesh source device's shard
        # may alias too) — donation would then delete the params the
        # caller still holds. Replicate an explicit copy.
        state = replicate(mesh, jax.tree_util.tree_map(jnp.array, state))
        zs_d = replicate(mesh, zs)
        step = jit_train_step(step_fn, mesh)
        t_start = time.perf_counter()
        data_t = step_t = 0.0
        dp = mesh.shape[cfg.parallel.data_axis]

        # ONE static batch shape across iterations: ragged final chunks
        # would otherwise retrace the step per distinct frame total
        # load_batch's worker thread reads this at execution time — it must
        # never be rebound in the loop body (a reused name races with the
        # prefetch closure)
        pad_total_frames = solver.ims_per_batch * (
            frames_per_chunk or cfg.input.max_sequence_length)

        if batch_fn is not None:
            def load_batch(it):
                return batch_fn(it, iter_rng(it), dp)
        else:
            def load_batch(it):
                r = iter_rng(it)
                idx = r.choice(len(dataset), solver.ims_per_batch,
                               replace=len(dataset) < solver.ims_per_batch)
                chunks = [dataset[int(i)] for i in idx]
                return chunks_to_train_batch(chunks, cfg, frames_per_chunk,
                                             r, pad_to_multiple=dp,
                                             pad_to_total=pad_total_frames)

        # one-batch lookahead: host h5 reads overlap the device step (the
        # DataLoader-workers analog, train_mp3d.py:564-573). try/finally:
        # the finite-loss assert (or any step error) must not leave a
        # non-daemon worker thread loading a batch nobody will consume.
        from concurrent.futures import ThreadPoolExecutor
        pool = ThreadPoolExecutor(max_workers=1)
        from .solver import lr_schedule
        sched = lr_schedule(solver)
        window: List[Dict[str, float]] = []
        last_log = start_iter
        try:
            pending = pool.submit(load_batch, start_iter)
            for it in range(start_iter, max_iter):
                t0 = time.perf_counter()
                batch = pending.result()
                if it + 1 < max_iter:
                    pending = pool.submit(load_batch, it + 1)
                batch = shard_batch(mesh, batch,
                                    axis=cfg.parallel.data_axis)
                data_t += time.perf_counter() - t0

                t0 = time.perf_counter()
                state, losses = step(state, batch, zs_d)
                loss_val = float(losses["total_loss"])
                step_t += time.perf_counter() - t0
                # ref: train_mp3d.py:618 — finite-loss assert
                assert math.isfinite(loss_val), \
                    {k: float(v) for k, v in losses.items()}

                window.append({k: float(v) for k, v in losses.items()})
                if (it + 1) % log_period == 0:
                    # window MEDIANS like detectron2's JSONWriter (a spike
                    # in one iteration shouldn't define the logged curve),
                    # plus the per-iteration 'lr' scalar the reference logs
                    n_win = it + 1 - last_log  # < log_period right after
                    #                            an unaligned resume
                    scalars = {
                        k: float(np.median([w[k] for w in window]))
                        for k in window[-1]}
                    scalars["lr"] = float(sched(it))
                    scalars["data_time"] = data_t / n_win
                    scalars["time"] = step_t / n_win
                    writer.write(it + 1, scalars)
                    if verbose:
                        eta = (max_iter - it - 1) * \
                            (time.perf_counter() - t_start) \
                            / max(it + 1 - start_iter, 1)
                        print(f"iter {it + 1}/{max_iter} "
                              f"total_loss {loss_val:.4f} "
                              f"step {step_t / n_win:.3f}s "
                              f"eta {eta/60:.1f}m")
                    data_t = step_t = 0.0
                    window.clear()
                    last_log = it + 1
                checkpointer.step(it, state)
                # no in-loop eval at the final iteration — the reference
                # guards with `iteration != max_iter` because do_test runs
                # after training (a duplicate final eval costs minutes)
                if eval_period > 0 and (it + 1) % eval_period == 0 \
                        and it + 1 != max_iter and eval_fn:
                    eval_fn(state)
        finally:
            pool.shutdown(wait=False, cancel_futures=True)
        if eval_fn is not None:
            # the do_test-after-do_train analog (train_mp3d.py:757-759:
            # main always runs one full eval after training) — this is WHY
            # the in-loop eval skips the final iteration; without it a
            # caller whose max_iter aligns with eval_period would silently
            # lose the final eval
            eval_fn(state)
    return state
