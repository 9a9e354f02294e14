"""Benchmark: per-frame throughput of the flagship embodied detector.

Measures the full recurrent implicit-memory pipeline (ResNet50+FPN + memory
read fusion + CenterNet proposals + 3-stage cascade + final NMS + mask head +
memory write) at the reference eval resolution (480x640, 20-frame episode
chunks compiled to one lax.scan program), on one chip.

Baseline note: the reference publishes no throughput numbers
(BASELINE.md: "published": {}); its own eval logs s/iter per run. The
vs_baseline denominator below uses 10 frames/s — a documented estimate for
the PyTorch reference pipeline on a datacenter GPU (upstream CenterNet2-R50
reports 24 FPS on a Titan RTX *without* the memory machinery or the
per-frame host round-trips; the embodied loop adds memory read/write, mask
pasting and per-frame python overhead). The north-star target is >=5x this
(BASELINE.json).

Prints exactly one JSON line on stdout.
"""

import json
import sys
import time

import numpy as np

REFERENCE_FPS_ESTIMATE = 10.0


def main():
    import jax
    import jax.numpy as jnp
    from embodied_object_detection_tpu.config import DetectorConfig
    from embodied_object_detection_tpu.models.detector import (
        FrameInputs, build_detector, make_episode_runner)
    from embodied_object_detection_tpu.structures import MemoryState

    cfg = DetectorConfig()
    model, params = build_detector(cfg, jax.random.PRNGKey(0))
    h, w = cfg.input.height, cfg.input.width
    t = cfg.input.max_sequence_length

    rng = np.random.RandomState(0)
    from embodied_object_detection_tpu.engine.eval import obs_visibility_host
    proj_np = rng.randint(0, cfg.memory.max_cells, (t, h, w)).astype(np.int32)
    frames = FrameInputs(
        image=jnp.asarray(rng.randint(0, 255, (t, h, w, 3)).astype(np.float32)),
        proj_indices=jnp.asarray(proj_np),
        outlier_mask=jnp.zeros((t, h, w), bool),
        obs_visibility=jnp.asarray(
            obs_visibility_host(proj_np, cfg.memory.max_cells)),
        memory_reset=jnp.asarray([True] + [False] * (t - 1)),
        episode_start=jnp.asarray([True] + [False] * (t - 1)),
    )
    zs = jnp.asarray(rng.randn(cfg.roi.zs_weight_dim,
                               cfg.roi.num_classes + 1).astype(np.float32))
    init = MemoryState.zeros(cfg.memory.max_cells, cfg.memory.memory_dim)

    runner = jax.jit(make_episode_runner(model, cfg))

    def sync(out):
        # NOTE: on the tunneled 'axon' backend block_until_ready does not
        # actually block; synchronize by pulling one scalar to host.
        return float(jnp.sum(out.detections.scores) +
                     jnp.sum(out.memory.obs_count))

    # warmup/compile
    out = runner(params, frames, zs, init)
    sync(out)

    # timed: chained episode chunks (memory carried, serial dependency), like
    # the eval protocol; one host sync at the end amortizes tunnel latency.
    iters = 5
    mem = init
    t0 = time.perf_counter()
    for _ in range(iters):
        out = runner(params, frames, zs, mem)
        mem = out.memory
    sync(out)
    per_chunk = (time.perf_counter() - t0) / iters
    fps = t / per_chunk
    result = {
        "metric": "embodied_implicit_memory_frames_per_sec_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_FPS_ESTIMATE, 3),
        "detail": {
            "resolution": f"{h}x{w}",
            "chunk_frames": t,
            "p50_latency_ms_per_frame": round(1000 * per_chunk / t, 3),
            "memory_cells": cfg.memory.max_cells,
            "device": str(jax.devices()[0]),
            "baseline_note": "reference publishes no numbers; 10 fps documented estimate (see bench.py docstring)",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
