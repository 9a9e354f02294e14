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

# Peak numbers for %-of-peak reporting (per chip). Source: public TPU specs
# (cloud.google.com/tpu/docs): v5e (aka "v5 lite") 197 TFLOP/s bf16 and
# 819 GB/s HBM BW; v4 275 TFLOP/s bf16, 1228 GB/s; v5p 459 TFLOP/s,
# 2765 GB/s; v6e 918 TFLOP/s, 1640 GB/s. f32 matmul peak is half bf16
# (MXU passes).
_PEAKS = {
    "v5 lite": (197e12, 819e9), "v5e": (197e12, 819e9),
    "v5p": (459e12, 2765e9),
    "v4": (275e12, 1228e9),
    "v6e": (918e12, 1640e9), "v6 lite": (918e12, 1640e9),
}


def device_peaks(device_str: str):
    s = device_str.lower()
    for key, peaks in _PEAKS.items():
        if key in s:
            return peaks
    return None, None


def _bound_label(frac_flops: float, frac_bw: float) -> str:
    """Roofline wall label: the dominant wall, or 'latency' when the program
    sits far from both (<35% of each) — then neither FLOPs nor bytes explain
    the wall-clock and the cost is op dispatch / gather row latency / serial
    NMS chains."""
    if max(frac_flops, frac_bw) < 0.35:
        return "latency"
    return "memory" if frac_bw > frac_flops else "compute"


def cost_numbers(compiled):
    """flops + HBM bytes from XLA's own cost model (VERDICT r3 #3:
    jit().lower().compile().cost_analysis())."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), \
            float(ca.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


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

    lowered = jax.jit(make_episode_runner(model, cfg)).lower(
        params, frames, zs, init)
    compiled = lowered.compile()
    runner = compiled
    eval_flops, eval_bytes = cost_numbers(compiled)

    def sync(out):
        # NOTE: on the tunneled 'axon' backend block_until_ready does not
        # actually block; synchronize by pulling one scalar to host.
        return float(jnp.sum(out.detections.scores) +
                     jnp.sum(out.memory.obs_count))

    # warmup
    out = runner(params, frames, zs, init)
    sync(out)

    # timed: chained episode chunks (memory carried, serial dependency), like
    # the eval protocol; one host sync at the end amortizes tunnel latency.
    # Throughput comes from this chained run (the protocol's steady state).
    iters = 5
    mem = init
    t0 = time.perf_counter()
    for _ in range(iters):
        out = runner(params, frames, zs, mem)
        mem = out.memory
    sync(out)
    per_chunk = (time.perf_counter() - t0) / iters
    fps = t / per_chunk
    per_frame_s = per_chunk / t

    # latency distribution under the SAME chained protocol as the
    # throughput number: enqueue every chunk up front (async dispatch keeps
    # the device queue full), then record each chunk's completion by
    # host-reading its tiny any_detection output buffer — a device_get of
    # an already-scheduled buffer, NOT a new device computation, so reading
    # chunk i does not serialize behind chunks i+1.. already in the queue.
    # Consecutive arrival deltas are per-chunk device times in steady
    # state; their median is a true p50 of the protocol being reported.
    # (A per-chunk host sync instead stalls the queue every chunk, so that
    # protocol's median carries one dispatch gap per chunk and can exceed
    # the chained mean — kept in detail as p50_synced for transparency.)
    n_lat = 9
    outs = []
    mem = init
    for _ in range(n_lat):
        out = runner(params, frames, zs, mem)
        mem = out.memory
        outs.append(out)
    arrivals = []
    for out in outs:
        np.asarray(out.any_detection)          # blocks until chunk done
        arrivals.append(time.perf_counter())
    deltas = np.diff(np.asarray(arrivals))     # first arrival carries the
    #                                            pipeline fill + get RTT
    p50_frame_ms = 1000 * float(np.median(deltas)) / t

    # per-chunk-synced variant (one queue stall + tunnel round-trip per
    # chunk): the worst-case single-chunk dispatch latency a caller sees
    # when NOT pipelining chunks.
    chunk_times = []
    mem = init
    for _ in range(5):
        tc = time.perf_counter()
        out = runner(params, frames, zs, mem)
        mem = out.memory
        sync(out)
        chunk_times.append(time.perf_counter() - tc)
    p50_synced_frame_ms = 1000 * float(np.median(chunk_times)) / t

    # ---- roofline / MFU detail (VERDICT r3 #3): XLA's own cost model
    device = str(jax.devices()[0])
    peak_flops, peak_bw = device_peaks(device)
    detail = {
        "resolution": f"{h}x{w}",
        "chunk_frames": t,
        "mean_latency_ms_per_frame": round(1000 * per_frame_s, 3),
        "p50_latency_ms_per_frame": round(p50_frame_ms, 3),
        "p50_synced_ms_per_frame": round(p50_synced_frame_ms, 3),
        "latency_note": "p50 = median of per-chunk arrival deltas over a "
                        "9-chunk chained pipeline (same protocol as the "
                        "mean); p50_synced = median with a host sync per "
                        "chunk (adds one dispatch gap + tunnel round-trip)",
        "memory_cells": cfg.memory.max_cells,
        "device": device,
        "baseline_note": "reference publishes no numbers; 10 fps documented estimate (see bench.py docstring)",
    }

    # Since round 5 the DEFAULT write path is the parity-exact one (the
    # per-row compacted ::8-of-compacted-observed selection the four golden
    # parity configs need — it also measures FASTER than the legacy strided
    # approximation, so divergence #1 is retired and the headline IS the
    # parity number). parity_exact_fps is kept as an explicit alias so
    # downstream comparisons with BENCH_r04 stay type-stable, and the
    # legacy strided path is measured as the A/B detail. Best-effort:
    # compile failures must not lose the headline.
    assert cfg.memory.exact_write_subsample, \
        "headline config must be the parity-exact write path"
    detail["parity_exact_fps"] = round(fps, 3)
    detail["parity_exact_ms_per_frame"] = round(1000 * per_frame_s, 3)
    detail["parity_note"] = ("default == parity-exact write since r5; "
                             "legacy_strided_fps is the retired fast path")
    try:
        import dataclasses as _dc
        cfg_leg = cfg.replace(memory=_dc.replace(
            cfg.memory, exact_write_subsample=False))
        model_leg = type(model)(cfg_leg)
        run_leg = jax.jit(make_episode_runner(model_leg, cfg_leg)).lower(
            params, frames, zs, init).compile()
        out = run_leg(params, frames, zs, init)
        sync(out)
        # identical protocol to the headline (chained chunks, one sync)
        mem = init
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run_leg(params, frames, zs, mem)
            mem = out.memory
        sync(out)
        leg_s = (time.perf_counter() - t0) / iters
        detail["legacy_strided_fps"] = round(t / leg_s, 3)
    except Exception as e:                                   # pragma: no cover
        detail["legacy_strided_fps"] = None
        detail["legacy_strided_error"] = repr(e)[:200]
    if eval_flops > 0:
        fpf = eval_flops / t                     # flops per frame
        bpf = eval_bytes / t                     # HBM bytes per frame
        detail["eval_roofline"] = {
            "gflops_per_frame": round(fpf / 1e9, 2),
            "hbm_gb_per_frame": round(bpf / 1e9, 3),
            "achieved_tflops": round(fpf / per_frame_s / 1e12, 3),
            "achieved_hbm_gbps": round(bpf / per_frame_s / 1e9, 1),
            # XLA's cost model counts a lax.scan/while body ONCE, not x
            # trip-count, so the scan-resident part of the frame (FPN +
            # heads + write) is under-counted by ~T; the hoisted batched
            # backbone is counted fully. Treat these as lower bounds.
            "cost_model_note": "scan body counted once; lower bound",
        }
        if peak_flops:
            detail["eval_roofline"].update({
                "pct_peak_flops": round(100 * fpf / per_frame_s / peak_flops, 2),
                "pct_peak_hbm_bw": round(100 * bpf / per_frame_s / peak_bw, 1),
                # which wall the program leans on at the XLA cost model's
                # operational intensity; "latency" = far from BOTH walls
                # (small-op / gather / NMS serial-chain bound)
                "bound": _bound_label(fpf / per_frame_s / peak_flops,
                                      bpf / per_frame_s / peak_bw),
            })

    # ---- train-step MFU (best-effort: a failure here must not lose the
    # headline eval number)
    try:
        detail["train_roofline"] = _train_roofline(
            jax, jnp, model, cfg, params, np.random.RandomState(1),
            peak_flops, peak_bw)
    except Exception as e:                                   # pragma: no cover
        detail["train_roofline"] = {"error": repr(e)[:200]}

    result = {
        "metric": "embodied_implicit_memory_frames_per_sec_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_FPS_ESTIMATE, 3),
        "detail": detail,
    }
    print(json.dumps(result))


def _train_roofline(jax, jnp, model, cfg, params, rng, peak_flops, peak_bw):
    """Compile + time the batch-2 fwd+bwd+AdamW step (tools/bench_train.py
    protocol) and report flops / bytes / %-peak from cost_analysis."""
    from embodied_object_detection_tpu.parallel.train_step import (
        make_train_step, TrainBatch)

    b = cfg.solver.ims_per_batch
    h, w = cfg.input.height, cfg.input.width
    g = cfg.input.max_gt_boxes
    gt_boxes = np.zeros((b, g, 4), np.float32)
    gt_valid = np.zeros((b, g), bool)
    gt_boxes[:, :2] = [[40, 40, 200, 180], [260, 120, 420, 300]]
    gt_valid[:, :2] = True
    batch = TrainBatch(
        image=jnp.asarray(rng.randint(0, 255, (b, h, w, 3)).astype(np.float32)),
        proj_indices=jnp.asarray(
            rng.randint(0, cfg.memory.max_cells, (b, h, w)).astype(np.int32)),
        mem_features=jnp.zeros((b, cfg.memory.max_cells,
                                cfg.memory.memory_dim), jnp.float32),
        mem_obs=jnp.zeros((b, cfg.memory.max_cells), jnp.float32),
        gt_boxes=jnp.asarray(gt_boxes),
        gt_classes=jnp.zeros((b, g), jnp.int32),
        gt_valid=jnp.asarray(gt_valid),
        weight=jnp.ones((b,), jnp.float32))
    zs = jnp.asarray(rng.randn(cfg.roi.zs_weight_dim,
                               cfg.roi.num_classes + 1).astype(np.float32))

    init_state, step_fn = make_train_step(model, cfg)
    state, _ = init_state(params)
    compiled = jax.jit(step_fn, donate_argnums=(0,)).lower(
        state, batch, zs).compile()
    flops, bytes_ = cost_numbers(compiled)

    state, losses = compiled(state, batch, zs)
    float(losses["total_loss"])                              # sync
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        state, losses = compiled(state, batch, zs)
    float(losses["total_loss"])
    step_s = (time.perf_counter() - t0) / iters

    out = {
        "batch": b,
        "step_ms": round(1000 * step_s, 2),
        "frames_per_s": round(b / step_s, 2),
        "gflops_per_step": round(flops / 1e9, 2),
        "hbm_gb_per_step": round(bytes_ / 1e9, 3),
        "achieved_tflops": round(flops / step_s / 1e12, 3),
        "achieved_hbm_gbps": round(bytes_ / step_s / 1e9, 1),
    }
    if peak_flops and flops > 0:
        out["pct_peak_flops"] = round(100 * flops / step_s / peak_flops, 2)
        out["pct_peak_hbm_bw"] = round(100 * bytes_ / step_s / peak_bw, 1)
        out["bound"] = _bound_label(flops / step_s / peak_flops,
                                    bytes_ / step_s / peak_bw)
    return out


if __name__ == "__main__":
    main()
