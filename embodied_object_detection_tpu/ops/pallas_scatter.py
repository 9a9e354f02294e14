"""Pallas TPU kernel: segment-sum as tiled one-hot MXU matmuls.

The memory write's core contraction is a scatter-add of per-pixel weight rows
into map cells (ops/memory_ops.py: `segment_sum(pix_w [P, N], idx) ->
[cells, N]`). XLA lowers scatter on TPU to a serialized update loop; this
kernel re-expresses it as dense compute the MXU eats:

    for each (cell_tile i, pixel_tile j):
        onehot = (idx[jP : jP+Pt] == cell_ids[i*Ct : (i+1)*Ct])   # VPU compare
        acc[i] += onehot^T @ w[jP : jP+Pt]                        # MXU

The output block index ignores j, and j is the innermost grid dim, so Mosaic
keeps the accumulator block resident in VMEM across the j sweep (the standard
pallas reduction pattern). Total FLOPs for the production shapes
(P=40960, cells=8192, N=128): ~86 GFLOP bf16 — well under a millisecond of
MXU time, vs a 300k-element serialized scatter.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(idx_ref, w_ref, out_ref):
    """Single pixel-tile grid; the full [cells, N] accumulator is the output
    block itself (same index every step -> stays resident in VMEM), so
    weights/indices stream through exactly once."""
    j = pl.program_id(0)
    cells = out_ref.shape[0]
    pt = idx_ref.shape[0]

    @pl.when(j == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    idx = idx_ref[:, 0]                                    # [Pt] int32
    w = w_ref[:, :].astype(jnp.bfloat16)
    # cell tiles of <=512 keep the one-hot block MXU-shaped; pick the
    # largest divisor of `cells` so no tail cells are dropped
    ct = min(512, cells)
    while cells % ct:
        ct -= 1
    for i in range(cells // ct):
        cell_ids = i * ct + jax.lax.broadcasted_iota(
            jnp.int32, (pt, ct), 1)
        onehot = (idx[:, None] == cell_ids).astype(jnp.bfloat16)
        out_ref[i * ct:(i + 1) * ct, :] += jax.lax.dot_general(
            onehot, w,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [Ct, N]


@partial(jax.jit, static_argnames=("num_cells", "cell_tile", "pixel_tile",
                                   "interpret"))
def scatter_sum_pallas(pix_w: jax.Array, idx: jax.Array, num_cells: int,
                       cell_tile: int = 512, pixel_tile: int = 2048,
                       interpret: bool = False) -> jax.Array:
    """segment_sum(pix_w [P, N], idx [P]) -> [num_cells, N] float32.

    P is padded to a multiple of pixel_tile (padded rows carry idx -1, which
    matches no cell); N should be a multiple of 128 for MXU efficiency.
    `cell_tile` is ignored — the kernel picks its own internal tile — and
    kept only for call-site compatibility.

    NOTE: the one-hot product accumulates in bf16 x bf16 -> f32 on the MXU;
    the one-hot factor is exact in bf16, so precision equals a bf16 rounding
    of the weights — acceptable for the write's mask-weight sums (weights are
    small rationals), and the final feature matmul stays f32.
    """
    p, n = pix_w.shape
    pad = (-p) % pixel_tile
    if pad:
        pix_w = jnp.pad(pix_w, ((0, pad), (0, 0)))
        idx = jnp.pad(idx, (0, pad), constant_values=-1)
    p_padded = p + pad

    del cell_tile  # retained in the signature for call-site compatibility
    grid = (p_padded // pixel_tile,)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((pixel_tile, 1), lambda j: (j, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((pixel_tile, n), lambda j: (j, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((num_cells, n), lambda j: (0, 0),
                               memory_space=pl.ANY if interpret else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_cells, n), jnp.float32),
        interpret=interpret,
    )(idx.reshape(-1, 1).astype(jnp.int32), pix_w.astype(jnp.float32))
