import time, sys
import numpy as np, jax, jax.numpy as jnp
from embodied_object_detection_tpu.config import DetectorConfig
from embodied_object_detection_tpu.models.detector import EmbodiedDetector, build_detector
from embodied_object_detection_tpu.models.centernet import decode_proposals
from embodied_object_detection_tpu.ops.memory_ops import memory_read
from embodied_object_detection_tpu.ops.nms import multiclass_nms

cfg = DetectorConfig()
t0=time.perf_counter()
model, params = build_detector(cfg, jax.random.PRNGKey(0))
print("init", time.perf_counter()-t0, flush=True)
h, w = 480, 640
rng = np.random.RandomState(0)
image = jnp.asarray(rng.randint(0,255,(h,w,3)).astype(np.float32))
zs = jnp.asarray(rng.randn(512, 21).astype(np.float32))
memf = jnp.zeros((8192,512)); memo = jnp.zeros((8192,))
proj = jnp.asarray(rng.randint(0,8192,(h,w)).astype(np.int32))
outl = jnp.zeros((h,w), bool)

def timeit(name, f, *a, n=3):
    t0=time.perf_counter(); o = f(*a); s=float(jnp.sum(jax.tree_util.tree_leaves(o)[0].astype(jnp.float32).ravel()[:1])); compile_t = time.perf_counter()-t0
    t0=time.perf_counter()
    for _ in range(n):
        o = f(*a)
    s=float(jnp.sum(jax.tree_util.tree_leaves(o)[0].astype(jnp.float32).ravel()[:1]))
    dt=(time.perf_counter()-t0)/n
    print(f"{name}: compile+run {compile_t:.2f}s, steady {dt*1000:.1f}ms", flush=True)
    return o

# 1. backbone+fpn+centernet head
def feats_fn(params, image):
    def m(mdl): 
        ego = memory_read(memf, memo, proj)
        fs = mdl._features(image, ego)
        return mdl.centernet(fs)
    return model.apply(params, method=m)
f1 = jax.jit(feats_fn)
agn, regs = timeit("backbone+fpn+head(+memread)", f1, params, image)

# 2. decode
f2 = jax.jit(lambda a, r: decode_proposals(a, r, cfg.centernet))
props = timeit("decode+nms(0.9)", f2, agn, regs)

# 3. cascade
def casc_fn(params, agn, regs, props):
    def m(mdl):
        ego = memory_read(memf, memo, proj)
        p3,p4,p5,p6,p7 = mdl._features(image, ego)
        return mdl.roi_heads.run_cascade((p3,p4,p5), props, zs, (h,w))
    return model.apply(params, method=m)
f3 = jax.jit(casc_fn)
casc = timeit("features+cascade", f3, params, agn, regs, props)

# 4. final nms
scores = jnp.sqrt(casc.mean_scores * jnp.maximum(props.scores[:,None],0))
f4 = jax.jit(lambda b, s, v: multiclass_nms(b, s, v, 0.02, 0.5, 300))
dets = timeit("final multiclass nms", f4, casc.final_boxes, scores, props.valid)

# 5. full frame step
f5 = jax.jit(lambda p, im: model.apply(p, im, zs, memf, memo, proj, outl, method=EmbodiedDetector.frame_step))
out = timeit("FULL frame_step", f5, params, image)
