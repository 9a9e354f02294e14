"""Trace the flagship training step on TPU and attribute device time.

Like tools/trace_episode.py but for the fwd+bwd+AdamW step
(tools/bench_train.py shapes). Prints self-time by op class and total
device time by source line.
"""
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from trace_episode import aggregate_by_source, aggregate_self_time


def main():
    from embodied_object_detection_tpu.config import DetectorConfig
    from embodied_object_detection_tpu.models.detector import build_detector
    from embodied_object_detection_tpu.parallel.train_step import (
        TrainBatch, make_train_step)

    cfg = DetectorConfig()
    model, params = build_detector(cfg, jax.random.PRNGKey(0))
    init_state, step_fn = make_train_step(model, cfg)
    state, _ = init_state(params)

    b, h, w = 2, 480, 640
    cells, g = cfg.memory.max_cells, 64
    rng = np.random.RandomState(0)
    batch = TrainBatch(
        image=jnp.asarray(rng.randint(0, 255, (b, h, w, 3)).astype(np.float32)),
        proj_indices=jnp.asarray(rng.randint(0, cells, (b, h, w)).astype(np.int32)),
        mem_features=jnp.zeros((b, cells, cfg.memory.memory_dim), jnp.float32),
        mem_obs=jnp.zeros((b, cells), jnp.float32),
        gt_boxes=jnp.asarray(np.tile(np.array([[10, 10, 100, 100]], np.float32),
                                     (b, g, 1))),
        gt_classes=jnp.zeros((b, g), jnp.int32),
        gt_valid=jnp.asarray(np.tile(np.arange(g) < 5, (b, 1))),
        weight=jnp.ones((b,), jnp.float32))
    zs = jnp.asarray(rng.randn(cfg.roi.zs_weight_dim,
                               cfg.roi.num_classes + 1).astype(np.float32))

    jit_step = jax.jit(step_fn)
    state, losses = jit_step(state, batch, zs)
    float(losses["total_loss"])

    trace_dir = "/tmp/eodt_train_trace"
    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        state, losses = jit_step(state, batch, zs)
    float(losses["total_loss"])
    jax.profiler.stop_trace()

    files = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
    print("trace files:", files, flush=True)
    if not files:
        print("no trace files produced — the backend may not support "
              "device tracing")
        return
    with gzip.open(sorted(files)[-1]) as f:
        trace = json.load(f)
    agg = aggregate_self_time(trace)
    total = sum(agg.values())
    print(f"-- self time by op class (3 steps, batch {b}) --")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{dur/1e3:9.2f} ms  {100*dur/total:5.1f}%  {name}")
    print("\n-- by source line --")
    for loc, dur in sorted(aggregate_by_source(trace).items(),
                           key=lambda kv: -kv[1])[:25]:
        print(f"{dur/1e3:9.2f} ms  {loc}")


if __name__ == "__main__":
    main()
