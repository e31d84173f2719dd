"""Two-segment dot-score flash kernels (KGAT dense mode) vs a dense XLA
oracle: forward values + all grads, interpret mode on CPU.

(The separable-score DisenHAN flash family was removed after measurement —
see ops/flash_attention.py module docstring; its XLA tier is oracle-tested
in tests/test_dense_adj.py.)
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tagrec_tpu.ops import flash_attention as FA

TI, TJ = FA.TILE_I, FA.TILE_J


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(77)
    ns = TI * 2          # rows (2 row tiles)
    n1, n2 = TJ, TJ * 2  # two column segments (padded to tile multiples)
    dq, dx = 16, 8
    q2 = jnp.asarray(rng.standard_normal((2, ns, dq)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((n1 + n2, dq)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((n1 + n2, dx)).astype(np.float32))
    mask = (rng.random((ns, n1 + n2)) < 0.15).astype(np.int8)
    mask[5, :] = 0  # empty row -> zero output row
    return q2, k, jnp.asarray(mask), x, n1 // TJ


def _oracle(q2, k, mask, x, split_j):
    """Dense XLA reference: per-column q-plane selection + masked row softmax
    spanning both segments."""
    nd = k.shape[0]
    col_tile = jnp.arange(nd) // TJ
    sel = (col_tile >= split_j).astype(jnp.int32)          # [Nd]
    s0 = q2[0] @ k.T                                       # [Ns, Nd]
    s1 = q2[1] @ k.T
    s = jnp.where(sel[None, :] == 1, s1, s0)
    mv = mask.astype(jnp.float32)
    s = jnp.where(mv > 0, s, -1e30)
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m) * mv
    z = jnp.sum(e, axis=1, keepdims=True)
    p = e / jnp.where(z == 0, 1.0, z)
    return p @ x


def test_dot_flash_forward_matches_oracle(data):
    q2, k, mask, x, split_j = data
    ms, zs = FA.dot_flash_stats(q2, k, mask, split_j)
    out = FA.dot_flash_apply(q2, k, mask, ms, zs, x, split_j)
    want = _oracle(q2, k, mask, x, split_j)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
    assert np.allclose(np.asarray(out)[5], 0.0)


def test_dot_flash_grads_match_oracle(data):
    q2, k, mask, x, split_j = data
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.standard_normal((q2.shape[1],
                                         x.shape[1])).astype(np.float32))

    def f_kernel(q2_, k_, x_):
        ms, zs = FA.dot_flash_stats(jax.lax.stop_gradient(q2_),
                                    jax.lax.stop_gradient(k_), mask, split_j)
        return jnp.sum(FA.dot_flash_apply(q2_, k_, mask, ms, zs, x_,
                                          split_j) * w)

    def f_oracle(q2_, k_, x_):
        return jnp.sum(_oracle(q2_, k_, mask, x_, split_j) * w)

    g1 = jax.grad(f_kernel, argnums=(0, 1, 2))(q2, k, x)
    g2 = jax.grad(f_oracle, argnums=(0, 1, 2))(q2, k, x)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
