"""Round-4 single-chip throughput experiments (VERDICT r3 next #3/#4).

1. serial     — make_episode_runner, the r3 headline protocol.
2. pipelined  — make_pipelined_episode_runner: trunk(chunk k+1) enqueued
                before scan(chunk k) retires (two jitted programs, async
                dispatch overlaps them device-side).
3. batched BN — make_batched_episode_runner at B=2/4: N independent scene
                streams in one vmapped scan; aggregate fps = B*T/chunk.
                Re-measures the stale r2 negative result with the r3
                kernels (align_impl=v2, hoisted batched trunk, host-side
                visibility).

Synchronizes via scalar pulls (block_until_ready is a no-op on the
tunneled axon backend). Prints one line per variant, flush=True.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from embodied_object_detection_tpu.config import DetectorConfig
    from embodied_object_detection_tpu.engine.eval import obs_visibility_host
    from embodied_object_detection_tpu.models.detector import (
        FrameInputs, build_detector, make_batched_episode_runner,
        make_episode_runner, make_pipelined_episode_runner)
    from embodied_object_detection_tpu.structures import MemoryState

    cfg = DetectorConfig()
    h, w = cfg.input.height, cfg.input.width
    t = cfg.input.max_sequence_length
    cells = cfg.memory.max_cells
    rng = np.random.RandomState(0)
    model, params = build_detector(cfg, jax.random.PRNGKey(0))
    zs = jnp.asarray(rng.randn(cfg.roi.zs_weight_dim,
                               cfg.roi.num_classes + 1).astype(np.float32))

    def make_frames(b=None):
        shape = (t, h, w) if b is None else (b, t, h, w)
        proj = rng.randint(0, cells, shape).astype(np.int32)
        if b is None:
            vis = obs_visibility_host(proj, cells)
            reset = np.asarray([True] + [False] * (t - 1))
        else:
            vis = np.stack([obs_visibility_host(proj[i], cells)
                            for i in range(b)])
            reset = np.stack([[True] + [False] * (t - 1)] * b)
        return FrameInputs(
            image=jnp.asarray(rng.randint(0, 255, shape + (3,))
                              .astype(np.float32)),
            proj_indices=jnp.asarray(proj),
            outlier_mask=jnp.zeros(shape, bool),
            obs_visibility=jnp.asarray(vis),
            memory_reset=jnp.asarray(reset),
            episode_start=jnp.asarray(reset))

    results = {}

    # ---- 1. serial baseline
    frames = make_frames()
    init = MemoryState.zeros(cells, cfg.memory.memory_dim)
    runner = jax.jit(make_episode_runner(model, cfg))
    t0 = time.perf_counter()
    out = runner(params, frames, zs, init)
    float(jnp.sum(out.detections.scores[-1, :1]))
    print(f"serial: compile+1 {time.perf_counter()-t0:.0f}s", flush=True)
    k, mem = 6, init
    t0 = time.perf_counter()
    for _ in range(k):
        out = runner(params, frames, zs, mem)
        mem = out.memory
    float(jnp.sum(out.detections.scores[-1, :1]))
    dt = (time.perf_counter() - t0) / k
    results["serial"] = t / dt
    print(f"serial: {dt/t*1000:.2f} ms/frame = {t/dt:.1f} fps", flush=True)

    # ---- 2. pipelined trunk/scan
    trunk_fn, scan_fn = make_pipelined_episode_runner(model, cfg)
    trunk_j = jax.jit(trunk_fn)
    scan_j = jax.jit(scan_fn)
    chunks = [make_frames() for _ in range(3)]   # rotate inputs
    t0 = time.perf_counter()
    feats = trunk_j(params, chunks[0].image)
    out = scan_j(params, chunks[0], zs, init, feats)
    float(jnp.sum(out.detections.scores[-1, :1]))
    print(f"pipelined: compile+1 {time.perf_counter()-t0:.0f}s", flush=True)
    # steady state: enqueue trunk(k+1) before consuming scan(k)
    mem = init
    feats = trunk_j(params, chunks[0].image)
    t0 = time.perf_counter()
    for i in range(k):
        nxt = chunks[(i + 1) % 3]
        out = scan_j(params, chunks[i % 3], zs, mem, feats)
        feats = trunk_j(params, nxt.image)   # overlaps with scan above
        mem = out.memory
    float(jnp.sum(out.detections.scores[-1, :1]))
    dt = (time.perf_counter() - t0) / k
    results["pipelined"] = t / dt
    print(f"pipelined: {dt/t*1000:.2f} ms/frame = {t/dt:.1f} fps", flush=True)

    # numerical identity spot-check vs serial on one chunk
    o1 = runner(params, chunks[0], zs, init)
    f0 = trunk_j(params, chunks[0].image)
    o2 = scan_j(params, chunks[0], zs, init, f0)
    d = float(jnp.max(jnp.abs(o1.detections.scores - o2.detections.scores)))
    print(f"pipelined max |score diff| vs serial: {d:.2e}", flush=True)

    # ---- 3. batched streams
    for b in (2, 4):
        bf = make_frames(b)
        binit = MemoryState(
            features=jnp.zeros((b, cells, cfg.memory.memory_dim),
                               jnp.float32),
            obs_count=jnp.zeros((b, cells), jnp.float32))
        brun = jax.jit(make_batched_episode_runner(model, cfg))
        t0 = time.perf_counter()
        out = brun(params, bf, zs, binit)
        float(jnp.sum(out.detections.scores[:, -1, :1]))
        print(f"batched B={b}: compile+1 {time.perf_counter()-t0:.0f}s",
              flush=True)
        mem = binit
        t0 = time.perf_counter()
        for _ in range(k):
            out = brun(params, bf, zs, mem)
            mem = out.memory
        float(jnp.sum(out.detections.scores[:, -1, :1]))
        dt = (time.perf_counter() - t0) / k
        results[f"batched_b{b}"] = b * t / dt
        print(f"batched B={b}: {dt/(b*t)*1000:.2f} ms/frame aggregate = "
              f"{b*t/dt:.1f} fps total ({dt/t*1000:.2f} ms/chunk-frame "
              f"latency)", flush=True)

    print("SUMMARY " + " ".join(f"{n}={v:.1f}fps"
                                for n, v in results.items()), flush=True)


if __name__ == "__main__":
    main()
