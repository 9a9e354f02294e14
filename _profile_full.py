import time
import numpy as np, jax, jax.numpy as jnp
from embodied_object_detection_tpu.config import DetectorConfig
from embodied_object_detection_tpu.models.detector import (
    EmbodiedDetector, FrameInputs, build_detector, make_episode_runner)
from embodied_object_detection_tpu.structures import MemoryState

cfg = DetectorConfig()
t0 = time.perf_counter()
model, params = build_detector(cfg, jax.random.PRNGKey(0))
print("init(+device warmup)", time.perf_counter()-t0, flush=True)
h, w, t = 480, 640, 20
rng = np.random.RandomState(0)
image = jnp.asarray(rng.randint(0,255,(h,w,3)).astype(np.float32))
zs = jnp.asarray(rng.randn(512, 21).astype(np.float32))
memf = jnp.zeros((8192,512)); memo = jnp.zeros((8192,))
proj = jnp.asarray(rng.randint(0,8192,(h,w)).astype(np.int32))
outl = jnp.zeros((h,w), bool)

fs = jax.jit(lambda p, im, mf, mo: model.apply(p, im, zs, mf, mo, proj, outl, method=EmbodiedDetector.frame_step))
t0=time.perf_counter(); out = fs(params, image, memf, memo)
_=float(jnp.sum(out.detections.scores)); print("frame_step compile+run", time.perf_counter()-t0, flush=True)
K=20
t0=time.perf_counter()
mf, mo = memf, memo
for _ in range(K):
    out = fs(params, image, mf, mo)
    mf = memf + out.write.features_update; mo = memo + out.write.obs_update
_=float(jnp.sum(out.detections.scores))
dt=(time.perf_counter()-t0)/K
print(f"frame_step steady {dt*1000:.1f}ms -> {1/dt:.1f} fps", flush=True)

frames = FrameInputs(
    image=jnp.asarray(rng.randint(0,255,(t,h,w,3)).astype(np.float32)),
    proj_indices=jnp.asarray(rng.randint(0,8192,(t,h,w)).astype(np.int32)),
    outlier_mask=jnp.zeros((t,h,w), bool),
    memory_reset=jnp.asarray([True]+[False]*(t-1)),
    episode_start=jnp.asarray([True]+[False]*(t-1)))
init = MemoryState.zeros(8192, 512)
runner = jax.jit(make_episode_runner(model, cfg))
t0=time.perf_counter(); out = runner(params, frames, zs, init)
_=float(jnp.sum(out.detections.scores)); print("episode compile+run", time.perf_counter()-t0, flush=True)
K=5
mem = init
t0=time.perf_counter()
for _ in range(K):
    out = runner(params, frames, zs, mem); mem = out.memory
_=float(jnp.sum(out.detections.scores))
dt=(time.perf_counter()-t0)/K
print(f"episode(20f) steady {dt*1000:.1f}ms -> {t/dt:.1f} fps", flush=True)
