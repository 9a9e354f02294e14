"""Pallas scatter-sum kernel vs jax.ops.segment_sum (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from embodied_object_detection_tpu.ops.pallas_scatter import scatter_sum_pallas


def test_matches_segment_sum(rng):
    p, n, cells = 4096, 128, 1024
    w = rng.rand(p, n).astype(np.float32)
    idx = rng.randint(0, cells, p).astype(np.int32)
    got = np.asarray(scatter_sum_pallas(jnp.asarray(w), jnp.asarray(idx),
                                        cells, cell_tile=256, pixel_tile=1024,
                                        interpret=True))
    want = np.asarray(jax.ops.segment_sum(jnp.asarray(w), jnp.asarray(idx),
                                          num_segments=cells))
    # bf16 one-hot matmul: tolerance at bf16 rounding of the sums
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
    # structure exact: zero rows where no pixel maps
    empty = np.setdiff1d(np.arange(cells), idx)
    np.testing.assert_allclose(got[empty], 0.0)


def test_padding_rows_ignored(rng):
    # P not a multiple of pixel_tile: padded rows must not contribute
    p, n, cells = 700, 128, 256
    w = rng.rand(p, n).astype(np.float32)
    idx = rng.randint(0, cells, p).astype(np.int32)
    got = np.asarray(scatter_sum_pallas(jnp.asarray(w), jnp.asarray(idx),
                                        cells, cell_tile=128, pixel_tile=512,
                                        interpret=True))
    want = np.asarray(jax.ops.segment_sum(jnp.asarray(w), jnp.asarray(idx),
                                          num_segments=cells))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_scatter_sum_non_multiple_of_512_cells(rng):
    """Regression: cells like 768 (multiple of cell_tile but not of the
    kernel's internal 512 tile) must not silently drop the tail cells."""
    import jax.numpy as jnp
    from embodied_object_detection_tpu.ops.pallas_scatter import (
        scatter_sum_pallas)
    p, n, cells = 256, 128, 768
    w = rng.rand(p, n).astype(np.float32)
    idx = rng.randint(0, cells, p).astype(np.int32)
    idx[:32] = 700  # force traffic into the would-be-dropped tail
    out = np.asarray(scatter_sum_pallas(jnp.asarray(w), jnp.asarray(idx),
                                        num_cells=cells, cell_tile=256,
                                        interpret=True))
    want = np.zeros((cells, n), np.float32)
    np.add.at(want, idx, w)
    np.testing.assert_allclose(out, want, rtol=2e-2, atol=2e-2)
