"""TPU training-step throughput bench.

Measures the jitted flagship train step (full 480x640 frames, recurrent
detector with memory inputs) in frames/sec on the attached chip — the
analog of the reference's logged s/iter instrumentation
(train_mp3d.py:582-604), which commits no reference value (SURVEY §6).

Usage: python tools/bench_train.py [--batch 2] [--iters 10]
       python tools/bench_train.py --variants   # remat A/B in one process
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _run_one(cfg, batch_args, iters):
    """Build + time one train-step config; returns the result dict."""
    import jax
    import jax.numpy as jnp
    from embodied_object_detection_tpu.models.detector import build_detector
    from embodied_object_detection_tpu.parallel.train_step import (
        TrainBatch, make_train_step)

    b, h, w = batch_args
    model, params = build_detector(cfg, jax.random.PRNGKey(0))
    init_state, step_fn = make_train_step(model, cfg)
    state, _ = init_state(params)

    cells, g = cfg.memory.max_cells, 64
    d = cfg.memory.memory_dim
    zs_dim = cfg.roi.zs_weight_dim
    rng = np.random.RandomState(0)
    batch = TrainBatch(
        image=jnp.asarray(rng.randint(0, 255, (b, h, w, 3)).astype(np.float32)),
        proj_indices=jnp.asarray(rng.randint(0, cells, (b, h, w)).astype(np.int32)),
        mem_features=jnp.zeros((b, cells, d), jnp.float32),
        mem_obs=jnp.zeros((b, cells), jnp.float32),
        gt_boxes=jnp.asarray(np.tile(np.array([[10, 10, 100, 100]], np.float32),
                                     (b, g, 1))),
        gt_classes=jnp.zeros((b, g), jnp.int32),
        gt_valid=jnp.asarray(np.tile(np.arange(g) < 5, (b, 1))),
        weight=jnp.ones((b,), jnp.float32))
    zs = jnp.asarray(rng.randn(zs_dim,
                               cfg.roi.num_classes + 1).astype(np.float32))

    jit_step = jax.jit(step_fn, donate_argnums=(0,))
    state, losses = jit_step(state, batch, zs)
    float(losses["total_loss"])  # sync (block_until_ready no-ops on axon)

    t0 = time.perf_counter()
    for _ in range(iters):
        state, losses = jit_step(state, batch, zs)
    total = float(losses["total_loss"])
    dt = (time.perf_counter() - t0) / iters
    return {"train_ms_per_step": round(dt * 1e3, 2),
            "train_frames_per_s": round(b / dt, 2),
            "batch": b, "resolution": f"{h}x{w}",
            "remat_backbone": cfg.backbone.train_remat,
            "remat_stages": cfg.roi.train_stage_remat,
            "total_loss": round(total, 3)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--remat-backbone", action="store_true",
                    help="rematerialize trunk+FPN (byte diet experiment)")
    ap.add_argument("--remat-stages", action="store_true",
                    help="rematerialize each cascade stage")
    ap.add_argument("--align-impl", default=None,
                    help="override roi.align_impl (v1/v2/v3/v4) for the "
                         "gather-vs-matmul ROIAlign A/B")
    ap.add_argument("--variants", action="store_true",
                    help="SMOKE-TEST ONLY: time all four remat combos in "
                         "one process. In-process coexistence inflates the "
                         "baseline (~102 ms vs the true 93.8; "
                         "ARCHITECTURE.md byte-diet) — for real A/B "
                         "numbers run each combo in its own process")
    args = ap.parse_args()

    import dataclasses

    from embodied_object_detection_tpu.config import DetectorConfig

    def with_knobs(remat_backbone, remat_stages):
        cfg = DetectorConfig()
        cfg = cfg.replace(backbone=dataclasses.replace(
            cfg.backbone, train_remat=remat_backbone))
        roi = dataclasses.replace(cfg.roi, train_stage_remat=remat_stages)
        if args.align_impl:
            roi = dataclasses.replace(roi, align_impl=args.align_impl)
        return cfg.replace(roi=roi)

    combos = ([(False, False), (True, False), (False, True), (True, True)]
              if args.variants
              else [(args.remat_backbone, args.remat_stages)])
    batch_args = (args.batch, args.height, args.width)
    for rb, rs in combos:
        res = _run_one(with_knobs(rb, rs), batch_args, args.iters)
        print(res, flush=True)


if __name__ == "__main__":
    main()
