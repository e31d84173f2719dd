"""EdgeMap scatter-free primitives: forward oracles + VJP equivalence.

Every primitive's gradient must match the plain autodiff of the raw
gather/einsum formulation — the custom VJPs only change HOW the cotangents are
computed (transpose-structure gathers instead of scatter-adds), never what.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tagrec_tpu.data.graph import COO
from tagrec_tpu.ops import edgemap as emap


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    n_rows, n_cols, n_edges = 60, 45, 500
    r = rng.integers(0, n_rows, n_edges)
    c = rng.integers(0, n_cols, n_edges)
    coo = COO.from_edges(r, c, (n_rows, n_cols),
                         rng.random(n_edges).astype(np.float32))
    host = emap.build_edge_map(coo.row, coo.col, coo.val, n_rows, n_cols)
    return coo, host, emap.to_device(host)


def _vals_from_payload(em):
    """Static edge payload in fwd layout (pads are zero by construction)."""
    return em.f_val


def test_slot_bijection(setup):
    coo, host, em = setup
    # every edge's fwd slot maps to its bwd slot and back
    f_tot = emap._total_slots(host.f)
    b_tot = emap._total_slots(host.b)
    assert len(np.unique(host.f_slot_of_edge)) == coo.nnz
    assert len(np.unique(host.b_slot_of_edge)) == coo.nnz
    f_src_flat = np.concatenate([a.ravel() for a in host.f_src])
    b_src_flat = np.concatenate([a.ravel() for a in host.b_src])
    np.testing.assert_array_equal(
        f_src_flat[host.f_slot_of_edge], host.b_slot_of_edge)
    np.testing.assert_array_equal(
        b_src_flat[host.b_slot_of_edge], host.f_slot_of_edge)
    # non-edge fwd slots carry the sentinel
    mask = np.ones(f_tot, bool)
    mask[host.f_slot_of_edge] = False
    assert (f_src_flat[mask] == b_tot).all()


def test_edge_reduce_matches_dense(setup):
    coo, host, em = setup
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((coo.shape[1], 16)).astype(np.float32))
    out = np.asarray(emap.edge_reduce(em, _vals_from_payload(em), x))
    np.testing.assert_allclose(out, coo.to_dense() @ np.asarray(x),
                               rtol=1e-4, atol=1e-5)


def test_transpose_vals_roundtrip(setup):
    coo, host, em = setup
    # transpose of the static payload must equal the transpose map's payload
    t = emap.transpose_vals(em, em.f_val)
    for got, want in zip(t, em.b_val):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))


def test_edge_dot_matches_dense(setup):
    coo, host, em = setup
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.standard_normal((coo.shape[0], 8)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((coo.shape[1], 8)).astype(np.float32))
    s = emap.edge_dot(em, a, b)
    dense = np.asarray(a) @ np.asarray(b).T
    for st, idx, rows, deg in zip(s, em.f_idx, em.f_rows, em.f_deg):
        st, idx, rows, deg = map(np.asarray, (st, idx, rows, deg))
        for r in range(idx.shape[0]):
            for k in range(idx.shape[1]):
                want = dense[rows[r], idx[r, k]] if k < deg[r] else 0.0
                assert abs(st[r, k] - want) < 1e-4


def test_edge_gather_matches(setup):
    coo, host, em = setup
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.standard_normal(coo.shape[1]).astype(np.float32))
    s = emap.edge_gather(em, v)
    vn = np.asarray(v)
    for st, idx, deg in zip(s, em.f_idx, em.f_deg):
        st, idx, deg = map(np.asarray, (st, idx, deg))
        k = np.arange(idx.shape[1])[None, :]
        np.testing.assert_allclose(st, vn[idx] * (k < deg[:, None]), rtol=1e-5)


def _raw_reduce(em, vals, x):
    outs = [jnp.einsum("...nk,...nkd->...nd", v, jnp.take(x, idx, axis=-2))
            for v, idx in zip(vals, em.f_idx)]
    return jnp.take(jnp.concatenate(outs, axis=-2), em.f_inv, axis=-2)


def test_edge_reduce_grads_match_autodiff(setup):
    coo, host, em = setup
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((coo.shape[1], 8)).astype(np.float32))
    # differentiable per-slot values with zero pads (mask-multiplied)
    masks = em.masks()
    raw = tuple(jnp.asarray(rng.standard_normal(m.shape).astype(np.float32))
                for m in masks)
    w = jnp.asarray(rng.standard_normal((coo.shape[0], 8)).astype(np.float32))

    def f_custom(raw_vals, xx):
        vals = tuple(v * m for v, m in zip(raw_vals, masks))
        return jnp.sum(emap.edge_reduce(em, vals, xx) * w)

    def f_raw(raw_vals, xx):
        vals = tuple(v * m for v, m in zip(raw_vals, masks))
        return jnp.sum(_raw_reduce(em, vals, xx) * w)

    g1 = jax.grad(f_custom, argnums=(0, 1))(raw, x)
    g2 = jax.grad(f_raw, argnums=(0, 1))(raw, x)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_edge_dot_grads_match_autodiff(setup):
    coo, host, em = setup
    rng = np.random.default_rng(5)
    a = jnp.asarray(rng.standard_normal((coo.shape[0], 8)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((coo.shape[1], 8)).astype(np.float32))
    masks = em.masks()
    w = tuple(jnp.asarray(rng.standard_normal(m.shape).astype(np.float32))
              for m in masks)

    def f_custom(aa, bb):
        s = emap.edge_dot(em, aa, bb)
        return sum(jnp.sum(st * wt) for st, wt in zip(s, w))

    def f_raw(aa, bb):
        out = 0.0
        for idx, rows, m, wt in zip(em.f_idx, em.f_rows, masks, w):
            ar = jnp.take(aa, rows, axis=0)
            bg = jnp.take(bb, idx, axis=0)
            s = jnp.einsum("nd,nkd->nk", ar, bg) * m
            out = out + jnp.sum(s * wt)
        return out

    g1 = jax.grad(f_custom, argnums=(0, 1))(a, b)
    g2 = jax.grad(f_raw, argnums=(0, 1))(a, b)
    for x1, x2 in zip(jax.tree_util.tree_leaves(g1),
                      jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x2),
                                   rtol=1e-4, atol=1e-5)


def test_edge_gather_grad_matches_autodiff(setup):
    coo, host, em = setup
    rng = np.random.default_rng(6)
    v = jnp.asarray(rng.standard_normal(coo.shape[1]).astype(np.float32))
    masks = em.masks()
    w = tuple(jnp.asarray(rng.standard_normal(m.shape).astype(np.float32))
              for m in masks)

    def f_custom(vv):
        s = emap.edge_gather(em, vv)
        return sum(jnp.sum(st * wt) for st, wt in zip(s, w))

    def f_raw(vv):
        out = 0.0
        for idx, m, wt in zip(em.f_idx, masks, w):
            out = out + jnp.sum(jnp.take(vv, idx, axis=0) * m * wt)
        return out

    g1 = jax.grad(f_custom)(v)
    g2 = jax.grad(f_raw)(v)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)


def test_edge_vgather_matches(setup):
    coo, host, em = setup
    rng = np.random.default_rng(10)
    D = 6
    x = jnp.asarray(rng.standard_normal((coo.shape[1], D)).astype(np.float32))
    s = emap.edge_vgather(em, x)
    xn = np.asarray(x)
    for st, idx, deg in zip(s, em.f_idx, em.f_deg):
        st, idx, deg = map(np.asarray, (st, idx, deg))
        k = np.arange(idx.shape[1])[None, :, None]
        np.testing.assert_allclose(st, xn[idx] * (k < deg[:, None, None]),
                                   rtol=1e-5)


def test_edge_vgather_grad_matches_autodiff(setup):
    """Custom VJP vs plain autodiff of the raw gather, and vs a numpy
    scatter-add oracle — including an UNMASKED pad cotangent (ones on every
    slot fed through jax.vjp: pad contributions must be dropped)."""
    coo, host, em = setup
    rng = np.random.default_rng(11)
    D = 5
    x = jnp.asarray(rng.standard_normal((coo.shape[1], D)).astype(np.float32))
    masks = em.masks()
    w = tuple(jnp.asarray(rng.standard_normal(m.shape + (D,)).astype(np.float32))
              for m in masks)

    def f_custom(xx):
        s = emap.edge_vgather(em, xx)
        return sum(jnp.sum(st * wt) for st, wt in zip(s, w))

    def f_raw(xx):
        out = 0.0
        for idx, m, wt in zip(em.f_idx, masks, w):
            out = out + jnp.sum(jnp.take(xx, idx, axis=0)
                                * m[..., None] * wt)
        return out

    g1 = jax.grad(f_custom)(x)
    g2 = jax.grad(f_raw)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)

    # numpy scatter-add oracle for the masked-weight cotangent
    want = np.zeros((coo.shape[1], D), np.float64)
    for idx, m, wt in zip(em.f_idx, masks, w):
        idxn, mn, wn = map(np.asarray, (idx, m, wt))
        contrib = mn[..., None] * wn                        # [Nb, Kb, D]
        np.add.at(want, idxn.ravel(),
                  contrib.reshape(-1, D).astype(np.float64))
    np.testing.assert_allclose(np.asarray(g1), want, rtol=1e-4, atol=1e-5)

    # unmasked all-ones cotangent through jax.vjp: pads must contribute zero
    _, vjp = jax.vjp(lambda xx: emap.edge_vgather(em, xx), x)
    ones = tuple(jnp.ones(st.shape, jnp.float32)
                 for st in emap.edge_vgather(em, x))
    (dv,) = vjp(ones)
    want2 = np.zeros((coo.shape[1], D), np.float64)
    for idx, m in zip(em.f_idx, masks):
        idxn, mn = np.asarray(idx), np.asarray(m)
        np.add.at(want2, idxn.ravel(),
                  np.broadcast_to(mn[..., None], mn.shape + (D,))
                  .reshape(-1, D).astype(np.float64))
    np.testing.assert_allclose(np.asarray(dv), want2, rtol=1e-4, atol=1e-5)


def test_edge_vgather_leading_axis(setup):
    """edge_vgather broadcasts over a leading factor axis and grads flow."""
    coo, host, em = setup
    rng = np.random.default_rng(12)
    F, D = 3, 4
    x = jnp.asarray(rng.standard_normal((F, coo.shape[1], D)).astype(np.float32))
    s = emap.edge_vgather(em, x)
    assert s[0].shape == (F,) + em.f_idx[0].shape + (D,)
    xn = np.asarray(x)
    for st, idx, deg in zip(s, em.f_idx, em.f_deg):
        st, idx, deg = map(np.asarray, (st, idx, deg))
        k = np.arange(idx.shape[1])[None, :, None]
        for f in range(F):
            np.testing.assert_allclose(
                st[f], xn[f][idx] * (k < deg[:, None, None]), rtol=1e-5)

    masks = em.masks()
    w = tuple(jnp.asarray(
        rng.standard_normal((F,) + m.shape + (D,)).astype(np.float32))
        for m in masks)

    def f_custom(xx):
        s = emap.edge_vgather(em, xx)
        return sum(jnp.sum(st * wt) for st, wt in zip(s, w))

    def f_raw(xx):
        out = 0.0
        for idx, m, wt in zip(em.f_idx, masks, w):
            out = out + jnp.sum(jnp.take(xx, idx, axis=-2)
                                * m[..., None] * wt)
        return out

    g1 = jax.grad(f_custom)(x)
    g2 = jax.grad(f_raw)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)


def test_leading_factor_axis(setup):
    """All primitives broadcast over a leading factor axis (DGCF/DisenGCN)."""
    coo, host, em = setup
    rng = np.random.default_rng(8)
    F, D = 3, 4
    x = jnp.asarray(rng.standard_normal((F, coo.shape[1], D)).astype(np.float32))
    a = jnp.asarray(rng.standard_normal((F, coo.shape[0], D)).astype(np.float32))
    vals = tuple(jnp.broadcast_to(v, (F,) + v.shape) for v in em.f_val)
    out = emap.edge_reduce(em, vals, x)
    dense = coo.to_dense()
    for f in range(F):
        np.testing.assert_allclose(np.asarray(out[f]),
                                   dense @ np.asarray(x[f]),
                                   rtol=1e-4, atol=1e-5)
    s = emap.edge_dot(em, a, x)
    assert s[0].shape == (F,) + em.f_idx[0].shape

    # grads flow through the leading axis
    def f(aa, xx):
        s = emap.edge_dot(em, aa, xx)
        soft = emap.edge_softmax(em, tuple(jnp.sum(st, axis=0) for st in s))
        softF = tuple(jnp.broadcast_to(p[None], (F,) + p.shape) for p in soft)
        return jnp.sum(emap.edge_reduce(em, softF, xx) ** 2)

    g = jax.grad(f, argnums=(0, 1))(a, x)
    assert all(np.isfinite(np.asarray(t)).all()
               for t in jax.tree_util.tree_leaves(g))


def test_edge_softmax_rows(setup):
    coo, host, em = setup
    rng = np.random.default_rng(9)
    scores = tuple(jnp.asarray(rng.standard_normal(i.shape).astype(np.float32))
                   for i in em.f_idx)
    soft = emap.edge_softmax(em, scores)
    for p, deg in zip(soft, em.f_deg):
        p, deg = np.asarray(p), np.asarray(deg)
        sums = p.sum(axis=1)
        np.testing.assert_allclose(sums[deg > 0], 1.0, rtol=1e-5)
        assert (sums[deg == 0] == 0.0).all()


def test_chunked_gather_budget_matches_unchunked(setup, monkeypatch):
    """A tiny EDGEMAP_GATHER_BUDGET_BYTES forces the lax.map row-chunk path
    in _reduce_bucket/_dot_bucket; values AND grads must match the unchunked
    forms bit-for-bit semantics (VERDICT r4 #3: 10x KGAT memory)."""
    coo, host, em = setup
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((coo.shape[1], 16)).astype(np.float32))
    a = jnp.asarray(rng.standard_normal((coo.shape[0], 16)).astype(np.float32))
    vals = _vals_from_payload(em)

    ref_reduce = emap.edge_reduce(em, vals, x)
    ref_dot = emap.edge_dot(em, a, x)

    def loss_reduce(vals, x):
        return jnp.sum(emap.edge_reduce(em, vals, x) ** 2)

    def loss_dot(a, b):
        return jnp.sum(jnp.concatenate(
            [s.reshape(-1) for s in emap.edge_dot(em, a, b)]) ** 2)

    g_ref = jax.grad(loss_reduce, argnums=(0, 1))(vals, x)
    gd_ref = jax.grad(loss_dot, argnums=(0, 1))(a, x)

    monkeypatch.setattr(emap, "EDGEMAP_GATHER_BUDGET_BYTES", 1 << 12)
    out = emap.edge_reduce(em, vals, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_reduce),
                               rtol=1e-5, atol=1e-6)
    for s, r in zip(emap.edge_dot(em, a, x), ref_dot):
        np.testing.assert_allclose(np.asarray(s), np.asarray(r),
                                   rtol=1e-5, atol=1e-6)
    g_chunk = jax.grad(loss_reduce, argnums=(0, 1))(vals, x)
    for gc, gr in zip(jax.tree_util.tree_leaves(g_chunk),
                      jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gr),
                                   rtol=1e-4, atol=1e-5)
    gd_chunk = jax.grad(loss_dot, argnums=(0, 1))(a, x)
    for gc, gr in zip(jax.tree_util.tree_leaves(gd_chunk),
                      jax.tree_util.tree_leaves(gd_ref)):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gr),
                                   rtol=1e-4, atol=1e-5)


def test_chunked_gather_leading_axis(setup, monkeypatch):
    """Chunked path with a leading [F] factor axis (the DGCF/DisenGCN shape)."""
    coo, host, em = setup
    rng = np.random.default_rng(4)
    F = 3
    x = jnp.asarray(rng.standard_normal(
        (F, coo.shape[1], 8)).astype(np.float32))
    vals = tuple(jnp.broadcast_to(v, (F,) + v.shape) for v in em.f_val)
    ref = emap.edge_reduce(em, vals, x)
    monkeypatch.setattr(emap, "EDGEMAP_GATHER_BUDGET_BYTES", 1 << 12)
    out = emap.edge_reduce(em, vals, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
