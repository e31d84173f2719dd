"""Dense (MXU-streamed) attention propagation for small/medium graphs.

At hetrec scale the full [N, N] adjacency fits comfortably in HBM, and one
dense matmul streams it at memory bandwidth — measured 3-6x faster than any
gather formulation for the CONSTANT adjacencies (DESIGN.md §7).  This module
extends that finding to the LEARNED adjacencies of the attention/routing
models: their edge scores are low-rank (products/sums of per-node vectors), so
score tiles can be *recomputed* from [N, d] factors on the MXU instead of
gathered per edge — the only [N, N]-sized HBM object is a boolean edge mask
(1 byte/entry) and, for KGAT, the softmaxed attention matrix P that three
propagation layers reuse.

Everything is chunked over rows with ``jax.lax.map`` + ``jax.checkpoint``:
forward materializes only [chunk, N] score tiles in VMEM-sized pieces, and the
backward pass rematerializes them instead of saving [N, N] residuals.

The ops.edgemap (bucketed ELL) formulations remain the exact same math for the
sharded / large-N regime and serve as these functions' correctness oracles
(tests/test_dense_adj.py).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

NEG = -1e30


def use_dense(adj_mode: str, n_rows: int, n_cols: int) -> bool:
    """Resolve a ModelConfig.adj_mode against the dense byte budget."""
    from tagrec_tpu.ops.ell import DENSE_ADJ_BUDGET_BYTES

    if adj_mode in ("dense", "dense_xla"):
        return True
    if adj_mode == "ell":
        return False
    return n_rows * n_cols * 4 <= DENSE_ADJ_BUDGET_BYTES


def dense_mask_host(rows, cols, n_rows: int, n_cols: int) -> np.ndarray:
    """[n_rows, n_cols] bool edge-pattern mask (host, built once)."""
    m = np.zeros((n_rows, n_cols), dtype=bool)
    m[np.asarray(rows, dtype=np.int64), np.asarray(cols, dtype=np.int64)] = True
    return m


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _pad_rows(x, n_pad: int, axis: int):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, n_pad - x.shape[axis])
    return jnp.pad(x, pad) if n_pad != x.shape[axis] else x


def _row_map(fn, n_chunks: int):
    """lax.map over row-chunk indices with rematerialized backward."""
    return jax.lax.map(jax.checkpoint(fn), jnp.arange(n_chunks))


def masked_row_softmax(s, m):
    """Row softmax of ``s`` over masked entries; 0 where mask is False and on
    all-masked rows (torch.sparse.softmax semantics on the dense pattern)."""
    s = jnp.where(m, s, NEG)
    mx = jax.lax.stop_gradient(jnp.max(s, axis=-1, keepdims=True))
    e = jnp.exp(s - jnp.maximum(mx, NEG)) * m
    z = jnp.sum(e, axis=-1, keepdims=True)
    return e / jnp.where(z == 0, 1.0, z)


# ---------------------------------------------------------------------------
# KGAT: sector-stacked attention scores -> row-softmax P (reused by 3 layers)
# ---------------------------------------------------------------------------

def sector_stack(q, k, segs: Sequence[Tuple[int, int]],
                 rel_of: Sequence[Sequence[int]]):
    """Fold per-relation score tables into single score-feature matrices.

    q, k: [R, N, dq] head/tail projections per relation.
    segs: static [(start, length)] node-type segments (rows sorted by type).
    rel_of[a][c]: relation id for (row-type a -> col-type c), or -1 if none.

    Returns qhat, khat [N, P*dq] with one feature plane per valid (a, c) pair
    such that ``qhat @ khat.T`` equals the per-sector relation scores
    q[r_ac, n] . k[r_ac, m] — ONE matmul recovers the whole typed score
    matrix (the Pallas flash kernel computes the same tiles sector-wise).
    """
    n, dq = q.shape[1], q.shape[2]
    planes = [(a, c) for a in range(len(segs)) for c in range(len(segs))
              if rel_of[a][c] >= 0]

    def build(table, key_fn):
        cols = []
        for (a, c) in planes:
            r = rel_of[a][c]
            sel, (start, length) = key_fn(a, c)
            plane = jnp.zeros((n, dq), table.dtype)
            plane = jax.lax.dynamic_update_slice(
                plane, jax.lax.dynamic_slice(table[r], (start, 0),
                                             (length, dq)), (start, 0))
            cols.append(plane)
        return jnp.concatenate(cols, axis=1)

    qhat = build(q, lambda a, c: (a, segs[a]))
    khat = build(k, lambda a, c: (c, segs[c]))
    return qhat, khat


def dense_row_softmax_scores(qhat, khat, mask, chunk: int = 1024):
    """P [N, M] = masked row softmax of qhat @ khat^T, chunked over rows."""
    n, m = qhat.shape[0], khat.shape[0]
    nc = _cdiv(n, chunk)
    qp = _pad_rows(qhat, nc * chunk, 0)
    mp = _pad_rows(mask, nc * chunk, 0)

    def f(i):
        qc = jax.lax.dynamic_slice(qp, (i * chunk, 0), (chunk, qp.shape[1]))
        mc = jax.lax.dynamic_slice(mp, (i * chunk, 0), (chunk, m))
        s = qc @ khat.T
        return masked_row_softmax(s, mc)

    return _row_map(f, nc).reshape(nc * chunk, m)[:n]


# ---------------------------------------------------------------------------
# KGAT true-KG mode: per-CELL relation ids (relation is per edge, not
# sector-determined like the tag graph) -> select-accumulate over relation
# score planes.  Round-3 rationale: at KG-bench scale (N=19k, R=14, E=1.64M)
# the R extra MXU score planes cost ~R * N^2 * d_r FLOPs ~= 0.5 TFLOP/sweep
# (~10ms), far cheaper than 1.6M-edge random gathers at the measured ~12-19x
# off roofline — the "170x score FLOPs" of DESIGN §8 are MXU FLOPs, which
# this chip performs ~2 orders of magnitude faster than it serves random
# 256B gathers.
# ---------------------------------------------------------------------------


def rel_id_host(rows, cols, rels, n_rows: int, n_cols: int):
    """[n_rows, n_cols] int8 relation-id matrix (-1 = no edge), or ``None``
    when the edge set is not dense-representable: parallel edges (one (h, t)
    pair under several relations) cannot share a cell, and int8 caps the
    relation count at 127."""
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    rels = np.asarray(rels, dtype=np.int64)
    if rels.size and int(rels.max()) > 127:
        return None
    key = rows * n_cols + cols
    if len(np.unique(key)) != len(key):
        return None  # parallel edges -> caller falls back to the edge maps
    m = np.full((n_rows, n_cols), -1, dtype=np.int8)
    m[rows, cols] = rels.astype(np.int8)
    return m


def rel_dense_row_softmax_scores(q, k, rel_id, chunk: int = 512,
                                 score_dtype=jnp.float32,
                                 row_segments=None):
    """P [N, M] = masked row softmax of S, S[h, t] = q[r, h] . k[r, t] with
    r = rel_id[h, t] (int8, -1 = no edge).  q, k: [R, N, dq].

    Chunked over rows; each chunk accumulates
    ``sum_r where(rel_id == r, q_r @ k_r^T, .)`` — R static MXU matmuls + R
    selects per sweep.  Relations absent from a chunk still pay their
    matmul; that is the point (MXU FLOPs beat per-edge gathers here).
    Fully differentiable (KGAT attention is not detached); the backward
    rematerializes chunks via jax.checkpoint.

    ``row_segments``: optional static ((start, length, rels_tuple), ...) —
    node-type row ranges with the relation ids that can actually occur on
    those rows.  KGAT's KG node order is [users | entities]: user rows carry
    ONLY the user->item interaction relation (1 plane) while entity rows
    carry the 2*K KG relations + the reverse interaction (data/kgat_load.py:
    22-38) — restricting each segment's plane loop skips the provably-empty
    matmuls (r4, VERDICT item 7).  Segments must tile [0, N) in order.

    ``score_dtype=bf16``: the R score planes (matmul inputs/outputs and the
    select chain) run in bf16 — halves both the plane MXU cost and the
    [chunk, M] HBM spills between the matmuls and the selects; the softmax
    itself stays f32.  Opt-in (ties to ModelConfig.adj_dtype): bf16 scores
    perturb attention logits at ~3 decimal digits."""
    r_, n, dq = q.shape
    m = k.shape[1]
    if row_segments is None:
        row_segments = ((0, n, tuple(range(r_))),)
    q = q.astype(score_dtype)
    kt = [k[r].T.astype(score_dtype) for r in range(r_)]

    parts = []
    for (start, length, rels) in row_segments:
        nc = _cdiv(length, chunk)
        qs = _pad_rows(q[:, start:start + length], nc * chunk, 1)
        # pad rows with -1 (no edge), NOT 0 (a real relation id)
        rs = jnp.pad(rel_id[start:start + length],
                     ((0, nc * chunk - length), (0, 0)), constant_values=-1)

        def f(i, qs=qs, rs=rs, rels=rels):
            qc = jax.lax.dynamic_slice(qs, (0, i * chunk, 0),
                                       (r_, chunk, dq))
            rc = jax.lax.dynamic_slice(rs, (i * chunk, 0), (chunk, m))
            s = jnp.zeros((chunk, m), score_dtype)
            for r in rels:  # static unroll: only this segment's planes
                s = jnp.where(rc == r,
                              jnp.dot(qc[r], kt[r],
                                      preferred_element_type=score_dtype), s)
            return masked_row_softmax(s.astype(jnp.float32), rc >= 0)

        parts.append(_row_map(f, nc).reshape(nc * chunk, m)[:length])
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


# ---------------------------------------------------------------------------
# DisenGCN: per-iteration routed aggregation (factor softmax is detached)
# ---------------------------------------------------------------------------

def routed_agg_dense(head, tail, mask, chunk: int = 1024):
    """agg[f] = (stop_grad(softmax_F(head_f @ tail_f^T)) * mask) @ tail_f.

    head, tail: [F, N, dk]; mask: [N, N] bool.  The routing weights are
    detached (reference model/disengcn.py:36), so the backward pass only needs
    the aggregation matmul — rematerialized chunk-wise.
    """
    f_, n, dk = head.shape
    m = mask.shape[1]
    nc = _cdiv(n, chunk)
    hp = _pad_rows(head, nc * chunk, 1)
    mp = _pad_rows(mask, nc * chunk, 0)

    def f(i):
        hc = jax.lax.dynamic_slice(hp, (0, i * chunk, 0), (f_, chunk, dk))
        mc = jax.lax.dynamic_slice(mp, (i * chunk, 0), (chunk, m))
        s = jnp.einsum("fcd,fnd->fcn", hc, tail)
        p = jax.lax.stop_gradient(jax.nn.softmax(s, axis=0)) * mc[None]
        return jnp.einsum("fcn,fnd->fcd", p, tail)

    out = _row_map(f, nc)                                # [nc, F, chunk, dk]
    return out.transpose(1, 0, 2, 3).reshape(f_, nc * chunk, dk)[:, :n]


# ---------------------------------------------------------------------------
# DGCF: low-rank score state (never materialize [F, N, N])
# ---------------------------------------------------------------------------
# The per-edge score table A_values evolves additively: S_t = 1 + sum_{tau<t}
# H_tau . T_tau^T per factor (model/dgcf.py:103-109), so S tiles are
# recomputable from the stacked [T, F, N, dk] update factors.  The softmaxed,
# degree-normalized adjacency built from S is DETACHED in the reference
# (model/dgcf.py:92) and the additive updates feed only future detached
# adjacencies — score gradients provably never reach the loss — so the whole
# recomputation runs under stop_gradient.

def _dgcf_scores(u_chunk, v, mask_chunk):
    """S [F, C, N] = 1 + sum_t u_chunk[t] @ v[t]^T, then factor softmax, mask."""
    s = 1.0 + jnp.einsum("tfcd,tfnd->fcn", u_chunk, v)
    return jax.nn.softmax(s, axis=0) * mask_chunk[None]


def dgcf_dense_degree(u, v, mask, chunk: int = 1024):
    """Row sums d[f, n] of the routed adjacency A_f (its degree vector)."""
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    t, f_, n, dk = u.shape
    nc = _cdiv(n, chunk)
    up = _pad_rows(u, nc * chunk, 2)
    mp = _pad_rows(mask, nc * chunk, 0)

    def f(i):
        uc = jax.lax.dynamic_slice(up, (0, 0, i * chunk, 0), (t, f_, chunk, dk))
        mc = jax.lax.dynamic_slice(mp, (i * chunk, 0), (chunk, n))
        return jnp.sum(_dgcf_scores(uc, v, mc), axis=-1)     # [F, C]

    d = _row_map(f, nc)                                      # [nc, F, C]
    return d.transpose(1, 0, 2).reshape(f_, nc * chunk)[:, :n]


def dgcf_dense_prop(u, v, mask, x, chunk: int = 1024):
    """A @ x with A = softmax_F(S) * mask (detached): x [F, N, dk_x]."""
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    t, f_, n, dk = u.shape
    nc = _cdiv(n, chunk)
    up = _pad_rows(u, nc * chunk, 2)
    mp = _pad_rows(mask, nc * chunk, 0)

    def f(i):
        uc = jax.lax.dynamic_slice(up, (0, 0, i * chunk, 0), (t, f_, chunk, dk))
        mc = jax.lax.dynamic_slice(mp, (i * chunk, 0), (chunk, n))
        a = _dgcf_scores(uc, v, mc)                          # [F, C, N]
        return jnp.einsum("fcn,fnd->fcd", a, x)

    out = _row_map(f, nc)
    return out.transpose(1, 0, 2, 3).reshape(f_, nc * chunk, -1)[:, :n]


# ---------------------------------------------------------------------------
# DisenHAN: additive separable scores per relation (rectangular blocks)
# ---------------------------------------------------------------------------

def disenhan_dense_rela(hs, ts, r_src, old_dst, mask, chunk: int = 1024):
    """One relation's attention aggregation on the dense rectangular block.

    hs [F, Ns], ts [F, Nd]: separable head/tail score terms;
    r_src [F, Ns]: relation-factor distribution; old_dst [F, Nd, dk];
    mask [Ns, Nd].  Scores e = sum_f relu(hs + ts) * r are fully
    differentiable here (unlike DGCF/DisenGCN there is no detach).
    Returns zk [F, Ns, dk].
    """
    f_, ns = hs.shape
    nd = ts.shape[1]
    nc = _cdiv(ns, chunk)
    hp = _pad_rows(hs, nc * chunk, 1)
    rp = _pad_rows(r_src, nc * chunk, 1)
    mp = _pad_rows(mask, nc * chunk, 0)

    def f(i):
        hc = jax.lax.dynamic_slice(hp, (0, i * chunk), (f_, chunk))
        rc = jax.lax.dynamic_slice(rp, (0, i * chunk), (f_, chunk))
        mc = jax.lax.dynamic_slice(mp, (i * chunk, 0), (chunk, nd))
        e = jax.nn.relu(hc[:, :, None] + ts[:, None, :])     # [F, C, Nd]
        er = jnp.sum(e * rc[:, :, None], axis=0)             # [C, Nd]
        p = masked_row_softmax(er, mc)
        return jnp.einsum("cn,fnd->fcd", p, old_dst)

    out = _row_map(f, nc)
    return out.transpose(1, 0, 2, 3).reshape(f_, nc * chunk, -1)[:, :ns]
