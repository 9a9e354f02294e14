"""Measure the zs_weight classifier matmul at large vocabularies on TPU.

VERDICT r3 #9: model-axis (tp) sharding of the [512, C+1] classifier exists
for the LVIS/22k-column vocabularies — quantify what it could ever save.
Only one real chip is attached, so the tp benefit is bounded analytically:
a tp-N shard computes 1/N of the logits columns but must pay an
all-gather of the [R, C+1] logits (or keep them sharded into the NMS
top-k). The measurable quantity on one chip is the replicated matmul's
cost at C = 20 / 1203 / 22047 against the ~10 ms frame budget.

Usage: python tools/measure_tp_zs.py [--rows 768]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    # 256 proposals x 3 cascade stages: every zs matmul in a frame
    ap.add_argument("--rows", type=int, default=768)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(args.rows, 512).astype(np.float32))

    results = {}
    chain = args.iters
    for c in (20, 1203, 22047):
        zs = jnp.asarray(rng.randn(512, c + 1).astype(np.float32))

        @jax.jit
        def f(x, w):
            # `chain` dependent matmuls inside ONE jit: amortizes the
            # tunnel dispatch latency so the per-matmul time is device time.
            # The result feeds back through a cheap projection to keep a
            # serial dependency (no overlap).
            def body(carry, _):
                # the production contraction (fp32-forced, roi_heads.py:108)
                logits = jnp.dot(carry, w,
                                 precision=jax.lax.Precision.HIGHEST,
                                 preferred_element_type=jnp.float32)
                carry = carry + logits[:, :1] * 1e-9
                return carry, logits[0, 0]
            _, outs = jax.lax.scan(body, x, None, length=chain)
            return outs[-1]

        float(f(feats, zs))                     # compile + sync (axon)
        t0 = time.perf_counter()
        float(f(feats, zs))
        dt = (time.perf_counter() - t0) / chain
        results[c] = dt * 1e3

    print({"rows": args.rows, "chain": chain,
           "device_ms_per_zs_matmul": {k: round(v, 4)
                                       for k, v in results.items()}})


if __name__ == "__main__":
    main()
