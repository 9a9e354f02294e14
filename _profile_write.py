import time
import numpy as np, jax, jax.numpy as jnp
from embodied_object_detection_tpu.ops.mask_paste import paste_masks
from embodied_object_detection_tpu.ops.memory_ops import memory_write

h, w, n, cells = 480, 640, 100, 8192
rng = np.random.RandomState(0)
feats = jnp.asarray(rng.randn(n, 512).astype(np.float32))
boxes_np = rng.rand(n, 4) * 300
boxes_np[:, 2:] += boxes_np[:, :2] + 30
boxes = jnp.asarray(boxes_np.astype(np.float32))
mask_logits = jnp.asarray(rng.rand(n, 28, 28).astype(np.float32))
proj = jnp.asarray(rng.randint(0, cells, (h, w)).astype(np.int32))
outl = jnp.zeros((h, w), bool)
valid = jnp.ones((n,), bool)

def timeit(name, f, *a, n_it=3):
    t0=time.perf_counter(); o = f(*a)
    s=float(jnp.sum(jax.tree_util.tree_leaves(o)[0].astype(jnp.float32).ravel()[:1])); c=time.perf_counter()-t0
    t0=time.perf_counter()
    for _ in range(n_it): o = f(*a)
    s=float(jnp.sum(jax.tree_util.tree_leaves(o)[0].astype(jnp.float32).ravel()[:1]))
    print(f"{name}: compile {c:.2f}s steady {(time.perf_counter()-t0)/n_it*1000:.1f}ms", flush=True)
    return o

f1 = jax.jit(lambda m, b: paste_masks(m, b, h, w, 0.5))
masks = timeit("paste_masks(100)", f1, mask_logits, boxes)

f2 = jax.jit(lambda fe, ma, v, p, o: memory_write(fe, ma, v, p, o, num_cells=cells))
out = timeit("memory_write", f2, feats, masks, valid, proj, outl)

# sub-pieces of memory_write
def segsum_only(ma, p):
    masks_f = ma.reshape(n, -1).astype(jnp.float32)
    c = jnp.sum(masks_f, axis=0)
    pix_w = masks_f.T / jnp.maximum(c,1)[:,None]
    return jax.ops.segment_sum(pix_w, p.reshape(-1), num_segments=cells)
f3 = jax.jit(segsum_only)
timeit("segment_sum [307200,100]", f3, masks, proj)

f4 = jax.jit(lambda p: jnp.zeros((cells,), jnp.float32).at[p.reshape(-1)].max(1.0))
timeit("scatter-max obs", f4, proj)

f5 = jax.jit(lambda ma: jnp.cumsum((jnp.sum(ma.reshape(n,-1),0)>0).astype(jnp.int32)))
timeit("cumsum 307200", f5, masks)
