"""DMA row-gather kernels vs numpy oracles (interpret mode on CPU).

The chip measurement (does dynamically-addressed DMA beat XLA's gather?)
lives in experiments/gather_bench.py + DESIGN.md §8; these tests pin the
semantics: gather_rows == jnp.take, gather_reduce == the ELL SpMM einsum.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tagrec_tpu.ops import dma_gather as dg


@pytest.mark.parametrize("r", [7, 256, 1024, 2500])
def test_gather_rows_matches_take(r):
    rng = np.random.default_rng(r)
    x = rng.standard_normal((300, 64)).astype(np.float32)
    idx = rng.integers(0, 300, size=r).astype(np.int32)
    out = dg.gather_rows(jnp.asarray(x), jnp.asarray(idx), block_rows=256)
    np.testing.assert_array_equal(np.asarray(out), x[idx])


def test_gather_rows_chunked_path():
    """r > MAX_PREFETCH_IDS exercises the lax.map chunking."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((50, 8)).astype(np.float32)
    idx = rng.integers(0, 50, size=1000).astype(np.int32)
    old = dg.MAX_PREFETCH_IDS
    dg.MAX_PREFETCH_IDS = 256
    try:
        out = dg.gather_rows(jnp.asarray(x), jnp.asarray(idx), block_rows=64)
    finally:
        dg.MAX_PREFETCH_IDS = old
    np.testing.assert_array_equal(np.asarray(out), x[idx])


@pytest.mark.parametrize("n,k", [(64, 25), (300, 7)])
def test_gather_reduce_matches_einsum(n, k):
    rng = np.random.default_rng(n + k)
    x = rng.standard_normal((200, 64)).astype(np.float32)
    idx = rng.integers(0, 200, size=(n, k)).astype(np.int32)
    val = rng.standard_normal((n, k)).astype(np.float32)
    # pad slots: id anything, val 0
    val[rng.random((n, k)) < 0.2] = 0.0
    out = dg.gather_reduce(jnp.asarray(x), jnp.asarray(idx),
                           jnp.asarray(val), block_n=64)
    ref = np.einsum("nk,nkd->nd", val, x[idx])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)
