"""On-chip profiling harness: per-component and episode steady-state timings.

Usage: python tools/profile_tpu.py [--variants]
Synchronizes via scalar pulls (block_until_ready is a no-op on tunneled
backends). See ARCHITECTURE.md for the latest recorded numbers.
"""
import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", action="store_true")
    args = ap.parse_args()

    import jax, jax.numpy as jnp
    from embodied_object_detection_tpu.config import DetectorConfig
    from embodied_object_detection_tpu.models.detector import (
        FrameInputs, build_detector, make_episode_runner)
    from embodied_object_detection_tpu.structures import MemoryState

    # input shapes derive from the config — hardcoding them would silently
    # desync (out-of-range proj cells clamp instead of failing) if a
    # default ever changes
    base = DetectorConfig()
    h, w = base.input.height, base.input.width
    t, cells = 20, base.memory.max_cells
    rng = np.random.RandomState(0)
    from embodied_object_detection_tpu.engine.eval import obs_visibility_host
    proj_np = rng.randint(0, cells, (t, h, w)).astype(np.int32)
    frames = FrameInputs(
        image=jnp.asarray(rng.randint(0, 255, (t, h, w, 3)).astype(np.float32)),
        proj_indices=jnp.asarray(proj_np),
        outlier_mask=jnp.zeros((t, h, w), bool),
        obs_visibility=jnp.asarray(obs_visibility_host(proj_np, cells)),
        memory_reset=jnp.asarray([True] + [False] * (t - 1)),
        episode_start=jnp.asarray([True] + [False] * (t - 1)))
    zs_np = rng.randn(base.roi.zs_weight_dim,
                      base.roi.num_classes + 1).astype(np.float32)

    def run(name, cfg):
        assert (cfg.input.height, cfg.input.width,
                cfg.memory.max_cells) == (h, w, cells), \
            "variant changed input shapes; rebuild frames from cfg"
        model, params = build_detector(cfg, jax.random.PRNGKey(0))
        zs = jnp.asarray(zs_np)
        init = MemoryState.zeros(cfg.memory.max_cells, cfg.memory.memory_dim)
        runner = jax.jit(make_episode_runner(model, cfg))
        t0 = time.perf_counter()
        out = runner(params, frames, zs, init)
        float(jnp.sum(out.detections.scores[-1, :1]))
        c = time.perf_counter() - t0
        k, mem = 5, init
        t0 = time.perf_counter()
        for _ in range(k):
            out = runner(params, frames, zs, mem)
            mem = out.memory
        float(jnp.sum(out.detections.scores[-1, :1]))
        dt = (time.perf_counter() - t0) / k
        print(f"{name}: compile {c:.0f}s steady {dt*1000:.0f}ms/chunk = "
              f"{dt/t*1000:.1f}ms/frame ({t/dt:.1f} fps)", flush=True)

    run("full", base)
    if args.variants:
        run("no_write", base.replace(memory=dataclasses.replace(
            base.memory, write_memory=False)))
        run("image_only", base.replace(memory=dataclasses.replace(
            base.memory, memory_type="image_only", write_memory=False)))


if __name__ == "__main__":
    main()
