"""Tests for ELL kernels, losses, sampling, and metrics.

Loss oracles are independent torch re-implementations of the reference math
(model/help/loss.py) — torch (CPU) is available in the image.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as tF

from tagrec_tpu.data.graph import COO, normalize_adj
from tagrec_tpu.ops import ell as ell_lib
from tagrec_tpu.ops import losses, metrics, sampling
from tagrec_tpu.ops.propagate import (coo_spmm, edge_dropout, ell_mm,
                                      ell_softmax, l2_normalize)


@pytest.fixture(scope="module")
def rand_coo():
    rng = np.random.default_rng(11)
    n = 50
    r = rng.integers(0, n, 400)
    c = rng.integers(0, n, 400)
    coo = COO.from_edges(r, c, (n, n), rng.random(400).astype(np.float32))
    return coo


def test_ell_mm_matches_dense_and_segment(rand_coo):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((50, 16)).astype(np.float32)
    h = ell_lib.ell_from_coo(rand_coo)
    e = ell_lib.to_device(h)
    out = np.asarray(ell_mm(e, jnp.asarray(x)))
    expect = rand_coo.to_dense() @ x
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)
    seg = np.asarray(coo_spmm(jnp.asarray(rand_coo.row), jnp.asarray(rand_coo.col),
                              jnp.asarray(rand_coo.val), jnp.asarray(x), 50))
    np.testing.assert_allclose(seg, expect, rtol=1e-4, atol=1e-5)


def test_ell_mm_chunked(rand_coo):
    rng = np.random.default_rng(2)
    x = rng.standard_normal((50, 8)).astype(np.float32)
    e = ell_lib.to_device(ell_lib.ell_from_coo(rand_coo))
    full = np.asarray(ell_mm(e, jnp.asarray(x)))
    chunked = np.asarray(ell_mm(e, jnp.asarray(x), row_chunk=16))
    np.testing.assert_allclose(full, chunked, rtol=1e-5)


def test_ell_buckets_cover_all_rows(rand_coo):
    b = ell_lib.build_ell_buckets(rand_coo.row, rand_coo.col, rand_coo.val,
                                  50, 50, boundaries=(2, 6))
    rows = np.concatenate(b.rows)
    assert len(np.unique(rows)) == 50
    # reassemble and compare against dense matmul
    rng = np.random.default_rng(3)
    x = rng.standard_normal((50, 4)).astype(np.float32)
    out = np.zeros((50, 4), dtype=np.float32)
    for h, r in zip(b.buckets, b.rows):
        e = ell_lib.to_device(h)
        out[r] = np.asarray(ell_mm(e, jnp.asarray(x)))
    np.testing.assert_allclose(out, rand_coo.to_dense() @ x, rtol=1e-4, atol=1e-5)


def test_ell_softmax_matches_masked_dense(rand_coo):
    h = ell_lib.ell_from_coo(rand_coo)
    e = ell_lib.to_device(h)
    rng = np.random.default_rng(4)
    scores = rng.standard_normal(h.idx.shape).astype(np.float32)
    probs = np.asarray(ell_softmax(e, jnp.asarray(scores)))
    mask = np.arange(h.idx.shape[1])[None, :] < h.deg[:, None]
    for i in range(h.idx.shape[0]):
        if h.deg[i] == 0:
            assert np.all(probs[i] == 0)
            continue
        s = scores[i][mask[i]]
        expect = np.exp(s - s.max())
        expect /= expect.sum()
        np.testing.assert_allclose(probs[i][mask[i]], expect, rtol=1e-5)
        assert np.all(probs[i][~mask[i]] == 0)


def test_edge_dropout_statistics(rand_coo):
    e = ell_lib.to_device(ell_lib.ell_from_coo(rand_coo))
    key = jax.random.PRNGKey(0)
    dropped = edge_dropout(e, 0.4, key, training=True)
    v0, v1 = np.asarray(e.val), np.asarray(dropped.val)
    nz = v0 > 0
    kept = (v1[nz] > 0).mean()
    assert abs(kept - 0.6) < 0.1
    # survivors rescaled by 1/keep
    sel = (v1 > 0) & nz
    np.testing.assert_allclose(v1[sel], v0[sel] / 0.6, rtol=1e-5)
    # eval mode: unchanged
    same = edge_dropout(e, 0.4, key, training=False)
    np.testing.assert_array_equal(np.asarray(same.val), v0)


# ---------------------------------------------------------------- losses

def test_bpr_loss_matches_torch():
    rng = np.random.default_rng(5)
    u, p, n = [rng.standard_normal((32, 8)).astype(np.float32) for _ in range(3)]
    tu, tp, tn = map(torch.tensor, (u, p, n))
    pos_s = (tu * tp).sum(1)
    neg_s = (tu * tn).sum(1)
    expect_sp = tF.softplus(neg_s - pos_s).mean().item()
    expect_ls = (-tF.logsigmoid(pos_s - neg_s)).mean().item()
    got_sp = float(losses.bpr_loss(*map(jnp.asarray, (u, p, n)), "softplus"))
    got_ls = float(losses.bpr_loss(*map(jnp.asarray, (u, p, n)), "logsigmoid"))
    assert abs(got_sp - expect_sp) < 1e-5
    assert abs(got_ls - expect_ls) < 1e-5


def test_l2reg_matches_torch():
    rng = np.random.default_rng(6)
    a, b = [rng.standard_normal((16, 4)).astype(np.float32) for _ in range(2)]
    expect = (0.5 * (torch.tensor(a).norm(2) ** 2 + torch.tensor(b).norm(2) ** 2)
              / 16).item()
    got = float(losses.l2reg_loss(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - expect) < 1e-4


def test_trans_losses_match_torch():
    rng = np.random.default_rng(7)
    h, r, tp_, tn_ = [rng.standard_normal((16, 8)).astype(np.float32) for _ in range(4)]
    th, tr, ttp, ttn = map(torch.tensor, (h, r, tp_, tn_))
    pos = (th + tr - ttp).norm(2, dim=1)
    neg = (th + tr - ttn).norm(2, dim=1)
    expect_tt = torch.relu(1.0 + pos - neg).mean().item()
    expect_te = tF.softplus(pos - neg).mean().item()
    expect_sq = tF.softplus(pos.pow(2) - neg.pow(2)).mean().item()
    args = tuple(map(jnp.asarray, (h, r, tp_, tn_)))
    assert abs(float(losses.transtag_loss(*args, margin=1.0)) - expect_tt) < 1e-5
    assert abs(float(losses.transe_loss(*args)) - expect_te) < 1e-5
    assert abs(float(losses.transe_loss_sq(*args)) - expect_sq) < 1e-4


def test_cor_loss_matches_torch_reference_formula():
    # independent torch re-derivation of model/help/loss.py:53-81
    rng = np.random.default_rng(8)
    chunks = [rng.standard_normal((20, 4)).astype(np.float32) for _ in range(4)]

    def t_centered(x):
        r = (x ** 2).sum(1, keepdim=True)
        d = torch.sqrt(torch.clamp(r - 2 * x @ x.T + r.T, min=0.0) + 1e-8)
        return d - d.mean(0, keepdim=True) - d.mean(1, keepdim=True) + d.mean()

    def t_dcov(d1, d2):
        n = d1.shape[0]
        return torch.sqrt(torch.clamp((d1 * d2).sum() / (n * n), min=0.0) + 1e-8)

    def t_dcor(x, y):
        d1, d2 = t_centered(x), t_centered(y)
        return t_dcov(d1, d2) / (torch.sqrt(torch.clamp(t_dcov(d1, d1) * t_dcov(d2, d2), min=0.0)) + 1e-10)

    tc = [torch.tensor(c) for c in chunks]
    expect = sum(t_dcor(tc[i], tc[i + 1]) for i in range(3)) / (5.0 * 4 / 2)
    got = float(losses.cor_loss([jnp.asarray(c) for c in chunks], 4))
    # fp32 sqrt-of-cancellation in the pairwise-distance matrix is
    # accumulation-order dependent; 1% agreement is the fp32 noise floor here.
    assert abs(got - float(expect)) < 5e-3


# ---------------------------------------------------------------- sampling

def test_negative_sampling_avoids_positives():
    pos = {0: [1, 2, 3], 1: [0], 2: list(range(20))}
    pt = sampling.build_pos_table(pos, 3, 30)
    heads = jnp.asarray(np.array([0, 1, 2] * 50, dtype=np.int32))
    # rounds=64: residual collision prob (20/30)^64 ~ 5e-12 even for the
    # two-thirds-dense head
    neg = np.asarray(sampling.sample_negatives(jax.random.PRNGKey(0), pt, heads,
                                               rounds=64))
    for h, n in zip(np.asarray(heads), neg):
        assert n not in pos[int(h)]
        assert 0 <= n < 30


def test_positive_sampling_in_set():
    pos = {0: [5, 7], 1: [2], 2: [9, 11, 13]}
    pt = sampling.build_pos_table(pos, 3, 20)
    heads = jnp.asarray(np.array([0, 1, 2] * 40, dtype=np.int32))
    got = np.asarray(sampling.sample_positive(jax.random.PRNGKey(1), pt, heads))
    for h, p in zip(np.asarray(heads), got):
        assert p in pos[int(h)]


def test_triple_table_sampling():
    triples = np.array([[0, 0, 5], [0, 0, 6], [0, 1, 7], [1, 0, 5]])
    pt, keys = sampling.build_triple_table(triples, n_rel=2, n_ids=10)
    kd = jnp.asarray(np.repeat(keys, 30).astype(np.int32))
    neg = np.asarray(sampling.sample_negatives(jax.random.PRNGKey(2), pt, kd,
                                               rounds=64))
    observed = {(0, 0): {5, 6}, (0, 1): {7}, (1, 0): {5}}
    trip_rep = np.repeat(triples, 30, axis=0)
    for (h, r, _), n in zip(trip_rep, neg):
        assert int(n) not in observed[(h, r)]


# ---------------------------------------------------------------- metrics

def test_metrics_match_reference_oracles():
    rng = np.random.default_rng(9)
    B, I, max_k = 12, 40, 20
    scores = jax.nn.sigmoid(jnp.asarray(rng.standard_normal((B, I)).astype(np.float32)))
    scores = np.asarray(scores)
    train_pos = [sorted(rng.choice(I, size=rng.integers(1, 6), replace=False).tolist())
                 for _ in range(B)]
    # test positives disjoint from train
    test_pos = []
    for tp in train_pos:
        avail = np.setdiff1d(np.arange(I), tp)
        test_pos.append(sorted(rng.choice(avail, size=rng.integers(1, 8),
                                          replace=False).tolist()))

    # reference path (numpy oracles, sklearn AUC)
    masked_ref = scores.copy()
    for i, tp in enumerate(train_pos):
        masked_ref[i, tp] = -1024.0
    topk_ref = np.argsort(-masked_ref, axis=1)[:, :max_k]
    label_ref = metrics.ref_get_label(test_pos, topk_ref)
    ref = {}
    for k in (10, 20):
        d = metrics.ref_pre_rec_k(label_ref, test_pos, k)
        d["ndcg"] = metrics.ref_ndcg_k(label_ref, test_pos, k)
        ref[k] = d
    auc_ref = sum(metrics.ref_auc(masked_ref[i], I, test_pos[i]) for i in range(B))

    # device path
    P = max(len(t) for t in train_pos)
    T = max(len(t) for t in test_pos)
    train_pad = np.full((B, P), I, dtype=np.int32)
    test_pad = np.full((B, T), -1, dtype=np.int32)
    tr_deg = np.zeros(B, dtype=np.int32)
    te_deg = np.zeros(B, dtype=np.int32)
    for i in range(B):
        train_pad[i, : len(train_pos[i])] = train_pos[i]
        tr_deg[i] = len(train_pos[i])
        test_pad[i, : len(test_pos[i])] = test_pos[i]
        te_deg[i] = len(test_pos[i])

    masked = metrics.mask_train_positives(jnp.asarray(scores), jnp.asarray(train_pad))
    np.testing.assert_allclose(np.asarray(masked), masked_ref)
    _, topk_ids = jax.lax.top_k(masked, max_k)
    label = metrics.hit_labels(topk_ids, jnp.asarray(test_pad))
    valid = jnp.ones(B, dtype=jnp.int32)
    sums = metrics.batch_metric_sums(label, jnp.asarray(te_deg), (10, 20), valid)
    for ki, k in enumerate((10, 20)):
        assert abs(float(sums["recall"][ki]) - ref[k]["recall"]) < 1e-4
        assert abs(float(sums["precision"][ki]) - ref[k]["precision"]) < 1e-4
        assert abs(float(sums["hr"][ki]) - ref[k]["hr"]) < 1e-4
        assert abs(float(sums["ndcg"][ki]) - ref[k]["ndcg"]) < 1e-4

    auc_sum = float(metrics.batch_auc_sum(masked, jnp.asarray(test_pad),
                                          jnp.asarray(te_deg), jnp.asarray(tr_deg),
                                          valid))
    assert abs(auc_sum - auc_ref) < 1e-3


def test_metric_sums_respect_valid_mask():
    B, I, K = 4, 20, 10
    rng = np.random.default_rng(10)
    scores = jnp.asarray(rng.random((B, I)).astype(np.float32))
    test_pad = jnp.asarray(rng.integers(0, I, (B, 3)).astype(np.int32))
    te_deg = jnp.asarray(np.full(B, 3, dtype=np.int32))
    _, topk_ids = jax.lax.top_k(scores, K)
    label = metrics.hit_labels(topk_ids, test_pad)
    full = metrics.batch_metric_sums(label, te_deg, (10,), jnp.ones(B, jnp.int32))
    half = metrics.batch_metric_sums(label, te_deg, (10,),
                                     jnp.asarray([1, 1, 0, 0], dtype=jnp.int32))
    assert float(half["recall"][0]) <= float(full["recall"][0])


def test_hybrid_matches_dense(rand_coo):
    """Hybrid dense-hub + ELL-tail SpMM == dense matmul, fwd and vjp."""
    from tagrec_tpu.ops.ell import build_adj_pair, adj_pair_to_device
    from tagrec_tpu.ops.propagate import pair_spmm

    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.standard_normal((50, 8)).astype(np.float32))
    for mode, hub_min in (("hybrid", 1), ("hybrid", 6), ("ell", 0),
                          ("dense", 0), ("auto", 0)):
        hp = build_adj_pair(rand_coo, symmetric=False, mode=mode,
                            hub_min_degree=hub_min or 10_000)
        adj = adj_pair_to_device(hp)
        out = np.asarray(pair_spmm(x, adj.fwd, adj.bwd))
        np.testing.assert_allclose(out, rand_coo.to_dense() @ np.asarray(x),
                                   rtol=1e-4, atol=1e-5)
        # vjp: d/dx (sum(A@x * g)) == A^T g
        g = jnp.asarray(rng.standard_normal((50, 8)).astype(np.float32))
        dx = jax.grad(lambda xx: jnp.sum(pair_spmm(xx, adj.fwd, adj.bwd) * g))(x)
        expect = rand_coo.to_dense().T @ np.asarray(g)
        np.testing.assert_allclose(np.asarray(dx), expect, rtol=1e-4, atol=1e-5)


def test_ell_mm_auto_chunking_exact(rng):
    """ELL_GATHER_BUDGET_BYTES auto-chunking (r4 graceful degradation above
    the dense tier, DESIGN §7): chunked fwd AND grad must be exactly the
    unchunked program's results."""
    import jax
    import jax.numpy as jnp
    import tagrec_tpu.ops.propagate as P
    from tagrec_tpu.ops import ell as E

    n, m, d = 500, 300, 64
    row = rng.integers(0, n, 4000)
    col = rng.integers(0, m, 4000)
    val = rng.random(4000).astype(np.float32)
    coo = type("C", (), {"row": row, "col": col, "val": val,
                         "shape": (n, m)})()
    ell = E.to_device(E.ell_from_coo(coo))
    x = jnp.asarray(rng.random((m, d)).astype(np.float32))

    ref = P.ell_mm(ell, x, row_chunk=None)
    g_ref = jax.grad(lambda xx: jnp.sum(P.ell_mm(ell, xx) ** 2))(x)
    old = P.ELL_GATHER_BUDGET_BYTES
    P.ELL_GATHER_BUDGET_BYTES = 1 << 12  # force chunking at this tiny size
    try:
        out = P.ell_mm(ell, x)
        g = jax.grad(lambda xx: jnp.sum(P.ell_mm(ell, xx) ** 2))(x)
    finally:
        P.ELL_GATHER_BUDGET_BYTES = old
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g), rtol=1e-5)


def test_to_device_chunked_matches_asarray(rng):
    """256MB-chunked host->device transfer (r4: a single multi-GB device_put
    crashed the tunneled TPU worker) must be bit-identical to jnp.asarray."""
    from tagrec_tpu.ops.ell import _to_device_chunked

    a = rng.random((1037, 48)).astype(np.float32)
    out = _to_device_chunked(a, max_bytes=16_000)   # forces ~13-row pieces
    np.testing.assert_array_equal(np.asarray(out), a)
    small = rng.random((4, 4)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(_to_device_chunked(small)), small)


def test_triple_set_sampling_matches_table():
    """TripleSet (sorted-pair binary search, O(T) memory) must refuse exactly
    the tails the padded TripleTable refuses — the set replaces the table in
    triple_phase because [n_keys, max_tails] padding hits 40+ GB on zipf hubs
    at 10x scale."""
    rng = np.random.default_rng(3)
    triples = np.stack([rng.integers(0, 40, 600), rng.integers(0, 6, 600),
                        rng.integers(0, 50, 600)], axis=1)
    ts, keys = sampling.build_triple_set(triples, n_rel=6, n_ids=50)
    observed = {}
    for h, r, t in triples:
        observed.setdefault((int(h), int(r)), set()).add(int(t))
    kd = jnp.asarray(np.repeat(keys, 10))
    neg = np.asarray(sampling.sample_negatives_from_set(
        jax.random.PRNGKey(4), ts, kd, rounds=64))
    trip_rep = np.repeat(triples, 10, axis=0)
    for (h, r, _), n in zip(trip_rep, neg):
        assert int(n) not in observed[(int(h), int(r))]
    # membership oracle agreement on every (key, tail) in range
    all_k = np.repeat(np.arange(40 * 6, dtype=np.int32), 50)
    all_t = np.tile(np.arange(50, dtype=np.int32), 40 * 6)
    got = np.asarray(sampling._pair_member(ts, jnp.asarray(all_k),
                                           jnp.asarray(all_t)))
    want = np.array([(k // 6, k % 6) in observed
                     and t in observed[(k // 6, k % 6)]
                     for k, t in zip(all_k, all_t)])
    np.testing.assert_array_equal(got, want)


def test_triple_set_no_int32_code_overflow():
    """keys * n_ids exceeding int32 (the 10x regime that silently truncated
    the single-code design) must still give exact membership."""
    n_ids = 150_000
    triples = np.array([[149_000, 5, 149_999], [149_000, 5, 0],
                        [10, 0, 3]], dtype=np.int64)
    ts, keys = sampling.build_triple_set(triples, n_rel=6, n_ids=n_ids)
    k = jnp.asarray(np.repeat(keys, 2))
    t = jnp.asarray(np.array([149_999, 149_998, 0, 1, 3, 4], dtype=np.int32))
    got = np.asarray(sampling._pair_member(ts, k, t))
    np.testing.assert_array_equal(got, [True, False, True, False, True, False])
