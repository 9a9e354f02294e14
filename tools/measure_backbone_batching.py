"""Measure: backbone batched over a chunk's frames vs inside the scan.

The episode scan is serial ONLY because of the memory carry; the
ResNet trunk (stem -> C3/C4/C5) never sees memory — fusion happens in the
FPN (timm.py:142-192). If a batched backbone pass over all T frames is
faster per frame than the scan-internal batch-1 trunk, the episode runner
can be split into [vmap backbone over T] -> [scan FPN+heads+write], a
pure re-association with identical numerics.

Usage: python tools/measure_backbone_batching.py [--frames 20]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from embodied_object_detection_tpu.config import DetectorConfig
    from embodied_object_detection_tpu.models.detector import (
        EmbodiedDetector, build_detector)

    cfg = DetectorConfig()
    model, params = build_detector(cfg, jax.random.PRNGKey(0))
    h, w = cfg.input.height, cfg.input.width
    t = args.frames
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 255, (t, h, w, 3)).astype(np.float32))

    def backbone_one(params, image):
        def run(self, image):
            x = self._normalize(image)
            return self.backbone(x)
        return model.apply(params, image, method=run)

    # A: scan (the current serial placement)
    @jax.jit
    def scan_backbone(params, images):
        def step(carry, im):
            c3, c4, c5 = backbone_one(params, im)
            return carry + jnp.sum(c5[:1, :1].astype(jnp.float32)), None
        out, _ = jax.lax.scan(step, jnp.zeros(()), images)
        return out

    # B: vmap (batched over frames)
    @jax.jit
    def vmap_backbone(params, images):
        c3, c4, c5 = jax.vmap(lambda im: backbone_one(params, im))(images)
        return jnp.sum(c5[:, :1, :1].astype(jnp.float32))

    for name, fn in (("scan", scan_backbone), ("vmap", vmap_backbone)):
        out = fn(params, images)
        float(out)                               # compile+sync (axon)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(params, images)
        float(out)
        dt = (time.perf_counter() - t0) / args.iters
        print({name + "_ms_per_frame": round(dt / t * 1e3, 3),
               name + "_ms_per_chunk": round(dt * 1e3, 2)})


if __name__ == "__main__":
    main()
