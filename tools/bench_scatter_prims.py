"""Primitive-level scatter/segment-sum timings on TPU (round 5).

Tests the hypotheses behind the parity-exact write gap:
  h1: segment_sum cost is per-ROW latency (scales with P, not bytes)
  h2: 100-wide f32 rows (400 B, lane-unaligned) pay a relayout per row;
      padding N to 128 lanes makes the scatter stream at full rate
  h3: the Pallas one-hot MXU segment-sum beats the XLA scatter at full P
"""

import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from embodied_object_detection_tpu.ops.pallas_scatter import scatter_sum_pallas

CELLS = 8192


def bench(fn, *args, iters=30, label=""):
    out = fn(*args)
    float(jnp.sum(out[..., :1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out[..., :1]))
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{label:36s} {dt:8.3f} ms")
    return dt


def main():
    rng = np.random.RandomState(0)
    print("device:", jax.devices()[0])
    seg = jax.jit(partial(jax.ops.segment_sum, num_segments=CELLS))
    for p in (307200, 38400):
        idx = jnp.asarray(rng.randint(0, CELLS, p).astype(np.int32))
        for n in (100, 128):
            w = jnp.asarray(rng.rand(p, n).astype(np.float32))
            bench(seg, w, idx, label=f"segment_sum P={p} N={n}")
        w = jnp.asarray(rng.rand(p, 128).astype(np.float32))
        try:
            bench(jax.jit(partial(scatter_sum_pallas, num_cells=CELLS,
                                  pixel_tile=512)),
                  w, idx, label=f"pallas_onehot P={p} N=128")
        except Exception as e:
            print(f"pallas_onehot P={p}: {type(e).__name__} {str(e)[:80]}")
        # blocky (spatially coherent) indices like a real projection
        blk = rng.randint(0, CELLS, p // 64)
        idx_blk = jnp.asarray(np.repeat(blk, 64).astype(np.int32))
        w = jnp.asarray(rng.rand(p, 128).astype(np.float32))
        bench(seg, w, idx_blk, label=f"segment_sum blocky P={p} N=128")


if __name__ == "__main__":
    main()
