"""Dense (MXU-streamed) attention paths must match the bucketed ELL/edgemap
paths exactly (same math, different execution) — forward outputs AND gradients.

The ELL paths are themselves parity-tested against independent torch mirrors
of the reference semantics (tests/test_parity_torch.py), so dense == ell
transitively pins the dense paths to the reference too.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tagrec_tpu.config import model_preset
from tagrec_tpu.models import MODEL_REGISTRY


def _compare_model(name, tiny_graph, rtol=2e-4, atol=2e-5, mode="dense",
                   **overrides):
    cfg_d = model_preset(name, reg=1e-4, adj_mode=mode, **overrides)
    cfg_e = model_preset(name, reg=1e-4, adj_mode="ell", **overrides)
    m_d = MODEL_REGISTRY[name](tiny_graph, cfg_d)
    m_e = MODEL_REGISTRY[name](tiny_graph, cfg_e)
    params = m_d.init(jax.random.PRNGKey(3))
    gd, ge = m_d.device_data(), m_e.device_data()

    out_d = m_d.forward(params, gd)
    out_e = m_e.forward(params, ge)
    for a, b in zip(jax.tree_util.tree_leaves(out_d),
                    jax.tree_util.tree_leaves(out_e)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=rtol, atol=atol)

    batch = jnp.asarray([[0, 1, 2], [1, 0, 3], [2, 2, 1]], dtype=jnp.int32)

    def loss_d(p):
        return sum(m_d.bpr_loss(p, gd, batch, key=jax.random.PRNGKey(0)))

    def loss_e(p):
        return sum(m_e.bpr_loss(p, ge, batch, key=jax.random.PRNGKey(0)))

    (ld, gd_), (le, ge_) = (jax.value_and_grad(loss_d)(params),
                            jax.value_and_grad(loss_e)(params))
    np.testing.assert_allclose(float(ld), float(le), rtol=rtol)
    for a, b in zip(jax.tree_util.tree_leaves(gd_),
                    jax.tree_util.tree_leaves(ge_)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5)


def test_kgat_dense_matches_ell(tiny_graph):
    _compare_model("kgat", tiny_graph, agg_type="bi_inter")


def test_dgcf_dense_matches_ell(tiny_graph):
    _compare_model("dgcf", tiny_graph)


def test_disengcn_dense_matches_ell(tiny_graph):
    _compare_model("disengcn", tiny_graph)


def test_disenhan_dense_matches_ell(tiny_graph):
    _compare_model("disenhan", tiny_graph)


def test_kgat_dense_xla_matches_ell(tiny_graph):
    """The chunked-XLA tier (escape hatch behind the Pallas default)."""
    _compare_model("kgat", tiny_graph, mode="dense_xla", agg_type="bi_inter")


def test_dgcf_dense_xla_matches_ell(tiny_graph):
    _compare_model("dgcf", tiny_graph, mode="dense_xla")


def test_dense_chunking_is_shape_safe(tiny_graph):
    """Chunk size not dividing N exercises the padded tail path."""
    from tagrec_tpu.ops import dense_adj

    rng = np.random.default_rng(0)
    n, m, f, dk = 13, 9, 3, 4
    mask = jnp.asarray(rng.random((n, m)) < 0.3)
    head = jnp.asarray(rng.standard_normal((f, n, dk)).astype(np.float32))
    tail = jnp.asarray(rng.standard_normal((f, m, dk)).astype(np.float32))
    # row with no edges must produce zero aggregation rows
    mask = mask.at[4, :].set(False)
    full = dense_adj.routed_agg_dense(head, tail[:, :m], mask, chunk=5)
    one = dense_adj.routed_agg_dense(head, tail[:, :m], mask, chunk=64)
    np.testing.assert_allclose(np.asarray(full), np.asarray(one),
                               rtol=1e-5, atol=1e-6)
