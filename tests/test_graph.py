"""Golden tests for COO algebra, joint adjacency, and normalizations.

Oracles: scipy.sparse re-derivations of the reference formulas
(model/help/adj.py:7-110) and hand-computable tiny graphs (the reference
author's own verification style, tutorial/torch-geometric.py).
"""

import numpy as np
import scipy.sparse as sp
import pytest

from tagrec_tpu.data.graph import COO, joint_adjacency, normalize_adj


def scipy_of(coo: COO) -> sp.coo_matrix:
    return sp.coo_matrix((coo.val, (coo.row, coo.col)), shape=coo.shape)


def test_coo_sums_duplicates():
    c = COO.from_edges([0, 0, 1], [1, 1, 2], (3, 4))
    d = c.to_dense()
    assert d[0, 1] == 2.0 and d[1, 2] == 1.0
    assert c.nnz == 2


def test_joint_adjacency_bipartite_matches_scipy_blocks():
    rng = np.random.default_rng(3)
    r, c = rng.integers(0, 5, 30), rng.integers(0, 7, 30)
    ui = COO.from_edges(r, c, (5, 7))
    joint = joint_adjacency(ui)
    s = scipy_of(ui).tocsr()
    n = 12
    expect = sp.lil_matrix((n, n), dtype=np.float32)
    expect[:5, 5:] = s
    expect[5:, :5] = s.T
    np.testing.assert_allclose(joint.to_dense(), expect.toarray(), rtol=1e-6)


def test_joint_adjacency_tripartite_matches_scipy_blocks():
    rng = np.random.default_rng(4)
    ui = COO.from_edges(rng.integers(0, 4, 20), rng.integers(0, 6, 20), (4, 6))
    ut = COO.from_edges(rng.integers(0, 4, 15), rng.integers(0, 3, 15), (4, 3))
    it = COO.from_edges(rng.integers(0, 6, 18), rng.integers(0, 3, 18), (6, 3))
    joint = joint_adjacency(ui, ut, it)
    n = 13
    expect = sp.lil_matrix((n, n), dtype=np.float32)
    expect[:4, 4:10] = scipy_of(ui).tocsr()
    expect[:4, 10:] = scipy_of(ut).tocsr()
    expect[4:10, :4] = scipy_of(ui).tocsr().T
    expect[4:10, 10:] = scipy_of(it).tocsr()
    expect[10:, :4] = scipy_of(ut).tocsr().T
    expect[10:, 4:10] = scipy_of(it).tocsr().T
    np.testing.assert_allclose(joint.to_dense(), expect.toarray(), rtol=1e-6)


def _ref_bi_norm(adj: sp.spmatrix) -> np.ndarray:
    row_sum = np.array(adj.sum(1)).flatten()
    with np.errstate(divide="ignore"):
        dis = np.power(row_sum, -0.5)
    dis[np.isinf(dis)] = 0.0
    d = sp.diags(dis)
    return (d @ adj @ d).toarray()


def _ref_si_norm(adj: sp.spmatrix) -> np.ndarray:
    row_sum = np.array(adj.sum(1)).flatten()
    with np.errstate(divide="ignore"):
        di = np.power(row_sum, -1.0)
    di[np.isinf(di)] = 0.0
    return (sp.diags(di) @ adj).toarray()


@pytest.fixture
def square_adj():
    rng = np.random.default_rng(5)
    r = rng.integers(0, 9, 40)
    c = rng.integers(0, 9, 40)
    # include an isolated row (node 9 has no edges) to exercise inf->0
    return COO.from_edges(r, c, (10, 10))


@pytest.mark.parametrize("norm", ["bi_norm", "si_norm", "si_norm_self", "ngcf", "plain"])
def test_normalizations_match_reference_formulas(square_adj, norm):
    ours = normalize_adj(square_adj, norm).to_dense()
    s = scipy_of(square_adj).tocsr()
    n = s.shape[0]
    if norm == "bi_norm":
        expect = _ref_bi_norm(s)
    elif norm == "si_norm":
        expect = _ref_si_norm(s)
    elif norm == "si_norm_self":
        expect = _ref_si_norm(s + sp.eye(n, dtype=s.dtype))
    elif norm == "ngcf":
        expect = _ref_si_norm(s) + np.eye(n, dtype=np.float32)
    else:
        expect = s.toarray()
    np.testing.assert_allclose(ours, expect, rtol=1e-5, atol=1e-7)


def test_hand_computed_bi_norm():
    # path graph 0-1-2: degrees [1,2,1]
    adj = COO.from_edges([0, 1, 1, 2], [1, 0, 2, 1], (3, 3))
    out = normalize_adj(adj, "bi_norm").to_dense()
    s = 1.0 / np.sqrt(2.0)
    expect = np.array([[0, s, 0], [s, 0, s], [0, s, 0]], dtype=np.float32)
    np.testing.assert_allclose(out, expect, rtol=1e-6)


def test_relation_edges_offsets(tiny_graph):
    rel = tiny_graph.relation_edges()
    nu, ni = tiny_graph.n_user, tiny_graph.n_item
    assert rel[0][0].max() < nu and rel[0][1].min() >= nu
    assert rel[1][0].min() >= nu
    assert rel[2][1].min() >= nu + ni
    assert rel[5][0].min() >= nu + ni
    # ui and iu are transposes
    np.testing.assert_array_equal(np.sort(rel[0][0]), np.sort(rel[1][1]))
