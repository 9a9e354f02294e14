"""ROIAlign impl A/B on TPU (round 5, VERDICT r4 #4 / #7).

Times multilevel_roi_align fwd and fwd+bwd at flagship shapes
(480x640 FPN p3-p5, C=256, R=512 ROIs — one cascade stage's pooling) for
impl v2 (4 thin-row gathers per sample) vs v3 (neighbor-packed [T, 4C]
single gather). Gathers here are row-latency-bound; v3 quarters the row
count at constant bytes.

Usage: python tools/bench_roi_align.py
"""

import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from embodied_object_detection_tpu.ops.roi_align import multilevel_roi_align

C = 256
SHAPES = [(60, 80), (30, 40), (15, 20)]
STRIDES = (8, 16, 32)
R = 512


def bench(fn, *args, iters=30, label=""):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf[..., :1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf[..., :1]))
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{label:28s} {dt:8.3f} ms")
    return dt


def main():
    rng = np.random.RandomState(0)
    print("device:", jax.devices()[0])
    for dtype in (jnp.bfloat16, jnp.float32):
        feats = [jnp.asarray(rng.randn(h, w, C).astype(np.float32),
                             dtype=dtype) for h, w in SHAPES]
        boxes = np.zeros((R, 4), np.float32)
        boxes[:, 0] = rng.uniform(0, 560, R)
        boxes[:, 1] = rng.uniform(0, 400, R)
        boxes[:, 2] = boxes[:, 0] + rng.uniform(8, 300, R)
        boxes[:, 3] = boxes[:, 1] + rng.uniform(8, 300, R)
        boxes = jnp.asarray(boxes)

        for impl in ("v2", "v3", "v4"):
            fwd = jax.jit(partial(multilevel_roi_align, strides=STRIDES,
                                  output_size=7, impl=impl))
            bench(fwd, feats, boxes, label=f"{dtype.__name__} {impl} fwd")

            def loss(fs, b, impl=impl):
                pooled = multilevel_roi_align(fs, b, STRIDES, 7, impl=impl)
                return jnp.sum(pooled.astype(jnp.float32) ** 2)
            gfn = jax.jit(jax.grad(loss))
            bench(gfn, feats, boxes,
                  label=f"{dtype.__name__} {impl} fwd+bwd")


if __name__ == "__main__":
    main()
