"""Capture a jax.profiler trace of the episode scan and print top device ops."""
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from embodied_object_detection_tpu.config import DetectorConfig
    from embodied_object_detection_tpu.models.detector import (
        FrameInputs, build_detector, make_episode_runner)
    from embodied_object_detection_tpu.structures import MemoryState

    cfg = DetectorConfig()
    model, params = build_detector(cfg, jax.random.PRNGKey(0))
    # shapes from the config, not hardcoded (see tools/profile_tpu.py)
    h, w = cfg.input.height, cfg.input.width
    t, cells = 20, cfg.memory.max_cells
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
    zs = jnp.asarray(rng.randn(cfg.roi.zs_weight_dim,
                               cfg.roi.num_classes + 1).astype(np.float32))
    init = MemoryState.zeros(cells, cfg.memory.memory_dim)
    runner = jax.jit(make_episode_runner(model, cfg))
    out = runner(params, frames, zs, init)
    float(jnp.sum(out.detections.scores[-1, :1]))

    trace_dir = "/tmp/eodt_trace"
    jax.profiler.start_trace(trace_dir)
    mem = init
    for _ in range(2):
        out = runner(params, frames, zs, mem)
        mem = out.memory
    float(jnp.sum(out.detections.scores[-1, :1]))
    jax.profiler.stop_trace()

    files = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
    print("trace files:", files, flush=True)
    if not files:
        print("no trace captured (backend may not support device tracing)")
        return
    with gzip.open(sorted(files)[-1]) as f:
        trace = json.load(f)
    agg = aggregate_self_time(trace)
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:30]
    total = sum(agg.values())
    for name, dur in top:
        print(f"{dur/1e3:9.2f} ms  {100*dur/total:5.1f}%  {name}")

    print("\n-- by source line (device ops with source metadata) --")
    src = aggregate_by_source(trace)
    src_top = sorted(src.items(), key=lambda kv: -kv[1])[:20]
    for loc, dur in src_top:
        print(f"{dur/1e3:9.2f} ms  {loc}")


def aggregate_self_time(trace: dict) -> dict:
    """Per-op SELF time (duration minus nested children) aggregated by name.

    The scan compiles to a `while` op whose child fusions nest *inside* its
    trace event — flat summing double-counts and the umbrella hides the
    breakdown (round-1 gap). Events on each (pid, tid) track form a proper
    nesting; a stack walk subtracts child durations from their parent.
    """
    from collections import defaultdict
    events = [e for e in trace.get("traceEvents", [])
              if e.get("ph") == "X" and e.get("dur", 0) > 0
              and "ts" in e]
    tracks = defaultdict(list)
    for e in events:
        tracks[(e.get("pid"), e.get("tid"))].append(
            dict(name=e["name"], ts=float(e["ts"]), dur=float(e["dur"]),
                 child=0.0))
    agg = {}
    for tr in tracks.values():
        # parents start no later and end no earlier: sort ts asc, dur desc
        tr.sort(key=lambda e: (e["ts"], -e["dur"]))
        stack = []
        for e in tr:
            while stack and e["ts"] >= stack[-1]["ts"] + stack[-1]["dur"] - 1e-9:
                stack.pop()
            if stack:
                stack[-1]["child"] += e["dur"]
            stack.append(e)
        for e in tr:
            name = e["name"].split(".")[0][:60]
            agg[name] = agg.get(name, 0.0) + max(e["dur"] - e["child"], 0.0)
    return agg


def aggregate_by_source(trace: dict) -> dict:
    """Total device time per source file:line (from XLA op metadata).

    Complements the name aggregation: fusions/reshapes carry the python
    frame that emitted the op, so this answers "which line of OUR code is
    the time going to" directly.
    """
    agg = {}
    for e in trace.get("traceEvents", []):
        if e.get("ph") != "X" or e.get("dur", 0) <= 0:
            continue
        srcline = (e.get("args") or {}).get("source", "")
        if not srcline or "embodied_object_detection_tpu" not in srcline:
            continue
        loc = "embodied_object_detection_tpu" + srcline.split(
            "embodied_object_detection_tpu", 1)[1]
        agg[loc] = agg.get(loc, 0.0) + float(e["dur"])
    return agg


if __name__ == "__main__":
    main()
