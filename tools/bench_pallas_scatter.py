"""Compare XLA segment_sum vs the pallas one-hot MXU kernel on TPU."""
import time
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from embodied_object_detection_tpu.ops.pallas_scatter import scatter_sum_pallas

p, n, cells = 38400, 128, 8192
rng = np.random.RandomState(0)
K = 20
ws = [jnp.asarray(rng.rand(p, n).astype(np.float32)) for _ in range(4)]
idxs = [jnp.asarray(rng.randint(0, cells, p).astype(np.int32)) for _ in range(4)]

f_xla = jax.jit(lambda w, i: jax.ops.segment_sum(w, i, num_segments=cells))
f_pl = jax.jit(lambda w, i: scatter_sum_pallas(w, i, cells))

for name, f in (("xla segment_sum", f_xla), ("pallas onehot-mxu", f_pl)):
    out = f(ws[0], idxs[0]); float(jnp.sum(out[:1, :1]))
    t0 = time.perf_counter()
    for k in range(K):
        out = f(ws[k % 4], idxs[k % 4])
    float(jnp.sum(out[:1, :1]))
    dt = (time.perf_counter() - t0) / K
    print(f"{name}: {dt*1000:.2f} ms", flush=True)

# correctness on device
a = np.asarray(f_xla(ws[0], idxs[0]))
b = np.asarray(f_pl(ws[0], idxs[0]))
print("max rel err:", float(np.max(np.abs(a - b) / (np.abs(a) + 1e-3))))
