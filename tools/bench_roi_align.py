"""Micro-bench ROIAlign variants on TPU.

Realistic flagship shapes: FPN p3-p5 at 480x640 (60x80, 30x40, 15x20),
C=256; box pooler 256 ROIs 7x7 (x3 cascade stages) + mask pooler 100 ROIs
14x14. Compares the current implementation against candidate
optimizations. Run: python tools/bench_roi_align.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from embodied_object_detection_tpu.ops import roi_align as ra


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x[..., :1, :1])), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    # axon: sync via scalar pull, not block_until_ready
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x[..., :1, :1])), out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.RandomState(0)
    dtype = jnp.bfloat16
    shapes = [(60, 80), (30, 40), (15, 20)]
    feats = [jnp.asarray(rng.randn(h, w, 256).astype(np.float32), dtype)
             for h, w in shapes]
    boxes256 = jnp.asarray(
        np.stack([rng.uniform(0, 500, 256), rng.uniform(0, 400, 256),
                  rng.uniform(100, 640, 256), rng.uniform(80, 480, 256)],
                 axis=1).astype(np.float32))
    boxes100 = boxes256[:100]

    for impl in ("v1", "v2"):
        from functools import partial

        @partial(jax.jit, static_argnames=("which",))
        def pipeline(feats, b256, b100, which=impl):
            outs = []
            cur = b256
            for s in range(3):  # cascade stages
                outs.append(ra.multilevel_roi_align(
                    feats, cur, strides=(8, 16, 32), output_size=7,
                    impl=which))
                # real cascade stages pool DIFFERENT (refined) boxes —
                # identical inputs would let XLA CSE collapse the three
                # pools into one and the bench would measure 1/3 the work
                cur = cur + jnp.float32(1.5) * (s + 1)
            outs.append(ra.multilevel_roi_align(
                feats, b100, strides=(8, 16, 32), output_size=14,
                impl=which))
            return outs

        ms = timeit(pipeline, feats, boxes256, boxes100)
        print(f"roi_align[{impl}] pipeline (3x256x7 + 1x100x14): {ms:.3f} ms")


if __name__ == "__main__":
    main()
