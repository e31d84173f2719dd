"""Pallas factor-softmax routing kernels vs the XLA chunked oracles.

Off-TPU these run the SAME kernel bodies in Pallas interpret mode, so the test
pins kernel semantics (tiling, padding, masking, accumulation) — TPU-specific
lowering is exercised by the scale benches.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tagrec_tpu.ops import dense_adj, flash_routing


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(21)
    f, n, m, r, dx = 3, 70, 50, 8, 5
    q = jnp.asarray(rng.standard_normal((f, n, r)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((f, m, r)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((f, m, dx)).astype(np.float32))
    mask = jnp.asarray(rng.random((n, m)) < 0.2)
    mask = mask.at[5, :].set(False)  # empty row
    return q, k, x, mask


def _oracle_mm(q, k, mask, x, base):
    s = base + jnp.einsum("fnr,fmr->fnm", q, k)
    p = jax.nn.softmax(s, axis=0) * mask[None]
    return jnp.einsum("fnm,fmd->fnd", p, x)


def test_routed_mm_matches_oracle(data):
    q, k, x, mask = data
    for base in (0.0, 1.0):
        out = flash_routing.routed_mm(q, k, mask, x, base)
        want = _oracle_mm(q, k, mask, x, base)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)


def test_routed_mm_grad_matches_oracle(data):
    q, k, x, mask = data
    w = jnp.asarray(np.random.default_rng(1).standard_normal(
        (q.shape[0], q.shape[1], x.shape[2])).astype(np.float32))

    def f_kernel(xx):
        return jnp.sum(flash_routing.routed_mm(q, k, mask, xx, 1.0) * w)

    def f_oracle(xx):
        # oracle with the same detach semantics (P constant)
        s = 1.0 + jnp.einsum("fnr,fmr->fnm", q, k)
        p = jax.lax.stop_gradient(jax.nn.softmax(s, axis=0)) * mask[None]
        return jnp.sum(jnp.einsum("fnm,fmd->fnd", p, xx) * w)

    g1 = jax.grad(f_kernel)(x)
    g2 = jax.grad(f_oracle)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)


def test_routed_rowsum_matches_oracle(data):
    q, k, x, mask = data
    d = flash_routing.routed_rowsum(q, k, mask, base=1.0)
    s = 1.0 + jnp.einsum("fnr,fmr->fnm", q, k)
    want = jnp.sum(jax.nn.softmax(s, axis=0) * mask[None], axis=2)
    np.testing.assert_allclose(np.asarray(d), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
    # empty row -> zero degree
    assert np.allclose(np.asarray(d)[:, 5], 0.0)


def test_kernels_match_dense_adj(data):
    """Cross-check against the ops.dense_adj chunked formulations."""
    q, k, x, mask = data
    out = flash_routing.routed_mm(q, k, mask, k, 0.0)
    want = dense_adj.routed_agg_dense(q, k, mask, chunk=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
