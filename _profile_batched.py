import time
import numpy as np, jax, jax.numpy as jnp
from embodied_object_detection_tpu.config import DetectorConfig
from embodied_object_detection_tpu.models.detector import (
    FrameInputs, build_detector, make_batched_episode_runner)
from embodied_object_detection_tpu.structures import MemoryState

cfg = DetectorConfig()
model, params = build_detector(cfg, jax.random.PRNGKey(0))
h, w, t, cells = 480, 640, 20, 8192
rng = np.random.RandomState(0)
zs = jnp.asarray(rng.randn(512, 21).astype(np.float32))

for B in (2, 4):
    frames = FrameInputs(
        image=jnp.asarray(rng.randint(0,255,(B,t,h,w,3)).astype(np.float32)),
        proj_indices=jnp.asarray(rng.randint(0,cells,(B,t,h,w)).astype(np.int32)),
        outlier_mask=jnp.zeros((B,t,h,w), bool),
        memory_reset=jnp.asarray(np.tile([True]+[False]*(t-1), (B,1))),
        episode_start=jnp.asarray(np.tile([True]+[False]*(t-1), (B,1))))
    init = jax.tree_util.tree_map(lambda x: jnp.tile(x[None], (B,)+(1,)*x.ndim),
                                  MemoryState.zeros(cells, 512))
    runner = jax.jit(make_batched_episode_runner(model, cfg))
    t0=time.perf_counter(); out = runner(params, frames, zs, init)
    _=float(jnp.sum(out.detections.scores[:, -1, :1]))
    c=time.perf_counter()-t0
    K=4; mem=init
    t0=time.perf_counter()
    for _ in range(K):
        out = runner(params, frames, zs, mem); mem = out.memory
    _=float(jnp.sum(out.detections.scores[:, -1, :1]))
    dt=(time.perf_counter()-t0)/K
    fps = B*t/dt
    print(f"B={B}: compile {c:.0f}s steady {dt*1000:.0f}ms/chunk-batch = {fps:.1f} fps ({dt/(B*t)*1000:.1f} ms/frame)", flush=True)
