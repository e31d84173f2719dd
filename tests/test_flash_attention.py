"""DisenHAN flash attention kernels vs the XLA oracle (values + all grads)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tagrec_tpu.ops import dense_adj, flash_attention


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(31)
    f, ns, nd, dk = 3, 40, 55, 6
    hs = jnp.asarray(rng.standard_normal((f, ns)).astype(np.float32))
    ts = jnp.asarray(rng.standard_normal((f, nd)).astype(np.float32))
    r = jnp.asarray(jax.nn.softmax(
        rng.standard_normal((f, ns)).astype(np.float32), axis=0))
    x = jnp.asarray(rng.standard_normal((f, nd, dk)).astype(np.float32))
    mask = jnp.asarray(rng.random((ns, nd)) < 0.25)
    mask = mask.at[7, :].set(False)  # empty row -> zero output row
    return hs, ts, r, x, mask


def _oracle(hs, ts, r, x, mask):
    e = jax.nn.relu(hs[:, :, None] + ts[:, None, :])
    er = jnp.sum(e * r[:, :, None], axis=0)
    p = dense_adj.masked_row_softmax(er, mask)
    return jnp.einsum("nm,fmd->fnd", p, x)


def test_forward_matches_oracle(data):
    hs, ts, r, x, mask = data
    out = flash_attention.disenhan_attention(hs, ts, r, mask, x)
    want = _oracle(hs, ts, r, x, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
    assert np.allclose(np.asarray(out)[:, 7], 0.0)


def test_grads_match_oracle(data):
    hs, ts, r, x, mask = data
    w = jnp.asarray(np.random.default_rng(2).standard_normal(
        (hs.shape[0], hs.shape[1], x.shape[2])).astype(np.float32))

    def f_kernel(hh, tt, rr, xx):
        return jnp.sum(flash_attention.disenhan_attention(hh, tt, rr, mask,
                                                          xx) * w)

    def f_oracle(hh, tt, rr, xx):
        return jnp.sum(_oracle(hh, tt, rr, xx, mask) * w)

    g1 = jax.grad(f_kernel, argnums=(0, 1, 2, 3))(hs, ts, r, x)
    g2 = jax.grad(f_oracle, argnums=(0, 1, 2, 3))(hs, ts, r, x)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_matches_dense_adj_rela(data):
    hs, ts, r, x, mask = data
    out = flash_attention.disenhan_attention(hs, ts, r, mask, x)
    want = dense_adj.disenhan_dense_rela(hs, ts, r, x, mask, chunk=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
