"""EdgeMap — paired forward/transpose ELL structure with scatter-free VJPs.

The attention/routing models (KGAT, DGCF, DisenGCN, DisenHAN) compute *learned*
per-edge values every step, so the constant-adjacency transpose trick of
``ops.propagate.pair_spmm`` does not apply: autodiff of their gather-based
formulations emits scatter-adds (the TPU serializes those — measured as the
dominant cost of the reference-shaped backward pass, DESIGN.md §2).

Observation: every cotangent of every edge op over a fixed edge set is itself
an edge op over the SAME edge set — aggregation transposes to aggregation over
the reversed edges, per-edge products transpose to gathers.  So this module
precomputes, once on host, the forward AND transpose degree-bucketed ELL
tables plus the flat slot bijection between them, and exposes three primitives
whose custom VJPs are written in terms of each other over the transpose
structure — zero scatters in any order of differentiation used by training:

* ``edge_reduce(em, vals, x)``  out[r] = sum_k vals[r,k] * x[idx[r,k]]
    (the learned-value SpMM; replaces torch.sparse.mm with step-dependent
     values, e.g. model/kgat.py:96-106, model/dgcf.py:99-101)
    VJP: d vals = edge_dot(em, g, x); d x = edge_reduce(em^T, T(vals), g).
* ``edge_dot(em, a, b)``        s[r,k] = a[r] . b[idx[r,k]]   (masked)
    (per-edge scores, e.g. model/dgcf.py:103-109, model/disengcn.py:30-33)
    VJP: d a = edge_reduce(em, ds, b); d b = edge_reduce(em^T, T(ds), a).
* ``edge_gather(em, v)``        s[r,k] = v[idx[r,k]]          (masked)
    VJP: d v[m] = sum of ds over m's transposed slots.

``T(.)`` moves per-slot values between the forward and transpose layouts via
the precomputed bijection (a gather with a zero sentinel for padding).
``rows_gather(em, x)`` splits row-ordered node data into bucket order and
inverts as a pure gather (the buckets partition the rows).

All primitives accept leading batch/factor axes on the value operands (the
disentangled models carry a leading [F] factor axis); per-bucket value tuples
are aligned with ``em`` bucket structure.  Padding-slot semantics: outputs of
edge_dot/edge_gather are zero on padding slots; edge_reduce REQUIRES padding
vals to be zero (all in-repo producers guarantee this: softmax/mask outputs).
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from tagrec_tpu.ops import ell as ell_lib


class EdgeMapHost(NamedTuple):
    f: ell_lib.EllBucketsHost
    b: ell_lib.EllBucketsHost
    f_src: List[np.ndarray]  # per fwd bucket [Nb,Kb] -> flat bwd slot (pad: b_total)
    b_src: List[np.ndarray]  # per bwd bucket [Mb,Kb] -> flat fwd slot (pad: f_total)
    f_slot_of_edge: np.ndarray  # [E] flat fwd slot per input edge
    b_slot_of_edge: np.ndarray


class EdgeMap(NamedTuple):
    """Device-side paired structure.  A pytree of int32 arrays — thread it as
    a jit ARGUMENT (never a closure constant, DESIGN.md §3)."""

    f_idx: tuple   # per bucket [Nb,Kb] int32 global tail ids
    f_val: tuple   # per bucket [Nb,Kb] float32 static edge payload (e.g. norm)
    f_rows: tuple  # per bucket [Nb] int32 global row ids
    f_deg: tuple   # per bucket [Nb] int32
    f_inv: jnp.ndarray  # [n_rows] gather perm: concat(bucket rows) -> row order
    b_idx: tuple
    b_val: tuple
    b_rows: tuple
    b_deg: tuple
    b_inv: jnp.ndarray
    f_src: tuple
    b_src: tuple

    @property
    def n_buckets(self) -> int:
        return len(self.f_idx)

    def transpose(self) -> "EdgeMap":
        return EdgeMap(f_idx=self.b_idx, f_val=self.b_val, f_rows=self.b_rows,
                       f_deg=self.b_deg, f_inv=self.b_inv, b_idx=self.f_idx,
                       b_val=self.f_val, b_rows=self.f_rows, b_deg=self.f_deg,
                       b_inv=self.f_inv, f_src=self.b_src, b_src=self.f_src)

    def masks(self, dtype=jnp.float32) -> tuple:
        """Per-bucket [Nb,Kb] validity masks."""
        return tuple(
            (jnp.arange(i.shape[1], dtype=jnp.int32)[None, :] < d[:, None])
            .astype(dtype) for i, d in zip(self.f_idx, self.f_deg))


def build_edge_map(row, col, val, n_rows: int, n_cols: int,
                   boundaries=None, pad_multiple: int = 8) -> EdgeMapHost:
    """Build the paired fwd/transpose bucketed tables + slot bijection."""
    row = np.asarray(row, dtype=np.int64)
    col = np.asarray(col, dtype=np.int64)
    if val is None:
        val = np.ones(len(row), dtype=np.float32)
    f, f_slot = ell_lib.build_ell_buckets_slots(
        row, col, val, n_rows, n_cols, boundaries=boundaries,
        pad_multiple=pad_multiple)
    b, b_slot = ell_lib.build_ell_buckets_slots(
        col, row, val, n_cols, n_rows, boundaries=boundaries,
        pad_multiple=pad_multiple)

    def slot_map(src_host, src_slot, dst_slot, dst_total):
        flat = np.full(_total_slots(src_host), dst_total, dtype=np.int64)
        flat[src_slot] = dst_slot
        out, off = [], 0
        for h in src_host.buckets:
            n = h.idx.shape[0] * h.idx.shape[1]
            out.append(flat[off:off + n].reshape(h.idx.shape).astype(np.int32))
            off += n
        return out

    f_total, b_total = _total_slots(f), _total_slots(b)
    return EdgeMapHost(f=f, b=b,
                       f_src=slot_map(f, f_slot, b_slot, b_total),
                       b_src=slot_map(b, b_slot, f_slot, f_total),
                       f_slot_of_edge=f_slot, b_slot_of_edge=b_slot)


def _total_slots(h: ell_lib.EllBucketsHost) -> int:
    return sum(b.idx.shape[0] * b.idx.shape[1] for b in h.buckets)


def slot_payload(host: EdgeMapHost, per_edge: np.ndarray, fill=0,
                 side: str = "f") -> List[np.ndarray]:
    """Scatter a per-edge array into per-bucket [Nb,Kb] tables (host, once)."""
    h = host.f if side == "f" else host.b
    slot = host.f_slot_of_edge if side == "f" else host.b_slot_of_edge
    per_edge = np.asarray(per_edge)
    flat = np.full(_total_slots(h), fill, dtype=per_edge.dtype)
    flat[slot] = per_edge
    out, off = [], 0
    for bk in h.buckets:
        n = bk.idx.shape[0] * bk.idx.shape[1]
        out.append(flat[off:off + n].reshape(bk.idx.shape))
        off += n
    return out


def to_device(host: EdgeMapHost) -> EdgeMap:
    def side(h):
        return (tuple(jnp.asarray(b.idx) for b in h.buckets),
                tuple(jnp.asarray(b.val) for b in h.buckets),
                tuple(jnp.asarray(r, dtype=jnp.int32) for r in h.rows),
                tuple(jnp.asarray(b.deg) for b in h.buckets),
                jnp.asarray(h.inv_perm))

    f_idx, f_val, f_rows, f_deg, f_inv = side(host.f)
    b_idx, b_val, b_rows, b_deg, b_inv = side(host.b)
    return EdgeMap(f_idx=f_idx, f_val=f_val, f_rows=f_rows, f_deg=f_deg,
                   f_inv=f_inv, b_idx=b_idx, b_val=b_val, b_rows=b_rows,
                   b_deg=b_deg, b_inv=b_inv,
                   f_src=tuple(jnp.asarray(s) for s in host.f_src),
                   b_src=tuple(jnp.asarray(s) for s in host.b_src))


# ---------------------------------------------------------------------------
# raw (non-custom-vjp) implementations
# ---------------------------------------------------------------------------

def _zero_int_cotangent(tree):
    def z(x):
        if jnp.issubdtype(x.dtype, jnp.integer):
            return np.zeros(x.shape, dtype=jax.dtypes.float0)
        return jnp.zeros_like(x)
    return jax.tree_util.tree_map(z, tree)


# Budget for one bucket's [Nb, Kb, D] vector-gather intermediate, with XLA's
# lane/sublane padding priced in (minor dim padded to 128, slot dim to 8 —
# same model as ops.propagate.ELL_GATHER_BUDGET_BYTES; a d=64 table
# materializes at 2x its logical bytes).  Buckets over budget stream in row
# chunks under lax.map + checkpoint — this is what lets the KGAT/routing
# EdgeMap tier degrade gracefully on one chip at 10x scale (the memory role
# of the reference's sequential --split_adj_k folds, model/help/adj.py:114-140)
# instead of materializing ~42 GB of slot intermediates (VERDICT r4 #3).
EDGEMAP_GATHER_BUDGET_BYTES = 1 << 30


def _gather_bytes_per_row(k: int, d: int, itemsize: int = 4) -> int:
    return -(-k // 8) * 8 * (-(-d // 128) * 128) * itemsize


def _lead_n(lead) -> int:
    n = 1
    for s in lead:
        n *= int(s)
    return n


def _row_chunk_for(n: int, k: int, d: int, itemsize: int, lead=()) -> int:
    """0 = no chunking (fits budget); else the row-chunk size (multiple of 8)."""
    per_row = _gather_bytes_per_row(k, d, itemsize) * _lead_n(lead)
    if n == 0 or k == 0 or n * per_row <= EDGEMAP_GATHER_BUDGET_BYTES:
        return 0
    return max(EDGEMAP_GATHER_BUDGET_BYTES // per_row // 8 * 8, 8)


def _reduce_bucket(v, idx, x):
    """sum_k v[..., n, k] * x[..., idx[n,k], :] for ONE bucket, row-chunked
    when the padded [chunk, Kb, D] gather would blow the budget."""
    n, k = idx.shape
    lead = v.shape[:-2]
    chunk = _row_chunk_for(n, k, x.shape[-1], x.dtype.itemsize, lead)
    if chunk == 0 or n <= chunk:
        return jnp.einsum("...nk,...nkd->...nd", v, jnp.take(x, idx, axis=-2))
    pad = (-n) % chunk
    idx_c = jnp.pad(idx, ((0, pad), (0, 0))).reshape(-1, chunk, k)
    v_c = jnp.moveaxis(
        jnp.pad(v, [(0, 0)] * len(lead) + [(0, pad), (0, 0)])
        .reshape(lead + (-1, chunk, k)), -3, 0)

    def body(c):
        ci, cv = c
        return jnp.einsum("...nk,...nkd->...nd", cv,
                          jnp.take(x, ci, axis=-2))

    # checkpoint: autodiff through the raw form (oracle/tests) rematerializes
    # the chunk gather instead of saving every [chunk, Kb, D] residual
    out = jax.lax.map(jax.checkpoint(body), (idx_c, v_c))  # [nc, ..., chunk, D]
    out = jnp.moveaxis(out, 0, -3)
    return out.reshape(lead + (-1, x.shape[-1]))[..., :n, :]


def _reduce_raw(em: EdgeMap, vals, x):
    """out[..., r, :] = sum_k vals[..., rb, k] * x[..., idx[rb,k], :], row order."""
    outs = [_reduce_bucket(v, idx, x) for v, idx in zip(vals, em.f_idx)]
    return jnp.take(jnp.concatenate(outs, axis=-2), em.f_inv, axis=-2)


def _dot_bucket(ar, idx, b):
    """s[..., n, k] = ar[..., n, :] . b[..., idx[n,k], :] for ONE bucket,
    row-chunked on the same budget as _reduce_bucket."""
    n, k = idx.shape
    lead = ar.shape[:-2]
    chunk = _row_chunk_for(n, k, b.shape[-1], b.dtype.itemsize, lead)
    if chunk == 0 or n <= chunk:
        return jnp.einsum("...nd,...nkd->...nk", ar,
                          jnp.take(b, idx, axis=-2))
    pad = (-n) % chunk
    idx_c = jnp.pad(idx, ((0, pad), (0, 0))).reshape(-1, chunk, k)
    ar_c = jnp.moveaxis(
        jnp.pad(ar, [(0, 0)] * len(lead) + [(0, pad), (0, 0)])
        .reshape(lead + (-1, chunk, ar.shape[-1])), -3, 0)

    def body(c):
        ci, ca = c
        return jnp.einsum("...nd,...nkd->...nk", ca,
                          jnp.take(b, ci, axis=-2))

    out = jax.lax.map(jax.checkpoint(body), (idx_c, ar_c))  # [nc, ..., chunk, k]
    out = jnp.moveaxis(out, 0, -3)
    return out.reshape(lead + (-1, k))[..., :n, :]


def _dot_raw(em: EdgeMap, a, b, masked: bool = True):
    """s[..., rb, k] = a[..., rows[rb], :] . b[..., idx[rb,k], :]; zero pads."""
    out = []
    for idx, rows, deg in zip(em.f_idx, em.f_rows, em.f_deg):
        ar = jnp.take(a, rows, axis=-2)                     # [..., Nb, D]
        s = _dot_bucket(ar, idx, b)
        if masked:
            m = (jnp.arange(idx.shape[1], dtype=jnp.int32)[None, :]
                 < deg[:, None])
            s = jnp.where(m, s, 0.0)
        out.append(s)
    return tuple(out)


def _gather_raw(em: EdgeMap, v, masked: bool = True):
    """s[..., rb, k] = v[..., idx[rb,k]]; zero pads."""
    out = []
    for idx, deg in zip(em.f_idx, em.f_deg):
        s = jnp.take(v, idx, axis=-1)                       # [..., Nb, Kb]
        if masked:
            m = (jnp.arange(idx.shape[1], dtype=jnp.int32)[None, :]
                 < deg[:, None])
            s = jnp.where(m, s, 0.0)
        out.append(s)
    return tuple(out)


def transpose_vals(em: EdgeMap, vals):
    """Move per-slot values from fwd layout to the transpose layout.

    Padding slots of the transpose side read a zero sentinel; padding slots of
    the fwd side are never referenced (the bijection maps real edges only).
    """
    lead = vals[0].shape[:-2]
    flat = jnp.concatenate(
        [v.reshape(lead + (-1,)) for v in vals], axis=-1)
    flat = jnp.concatenate(
        [flat, jnp.zeros(lead + (1,), dtype=flat.dtype)], axis=-1)
    return tuple(jnp.take(flat, src, axis=-1) for src in em.b_src)


def _rows_gather_raw(em, x):
    return tuple(jnp.take(x, rows, axis=-2) for rows in em.f_rows)


@jax.custom_vjp
def rows_gather(em: EdgeMap, x):
    """Split row-ordered node data [..., n_rows, D] into per-bucket row order.

    Pure gathers in BOTH directions: the buckets partition the rows, so the
    cotangent is ``take(concat(parts), f_inv)`` — never a scatter."""
    return _rows_gather_raw(em, x)


def _rows_gather_fwd(em, x):
    return _rows_gather_raw(em, x), em


def _rows_gather_bwd(em, dparts):
    dx = jnp.take(jnp.concatenate(dparts, axis=-2), em.f_inv, axis=-2)
    return _zero_int_cotangent(em), dx


rows_gather.defvjp(_rows_gather_fwd, _rows_gather_bwd)


# ---------------------------------------------------------------------------
# custom-vjp primitives (first-order scatter-free)
# ---------------------------------------------------------------------------

@jax.custom_vjp
def edge_reduce(em: EdgeMap, vals, x):
    """Learned-value SpMM over the edge map; see module docstring.

    vals: tuple of [..., Nb, Kb] (padding slots MUST be zero)
    x:    [..., n_cols, D]
    ->    [..., n_rows, D] in row order
    """
    return _reduce_raw(em, vals, x)


def _edge_reduce_fwd(em, vals, x):
    return _reduce_raw(em, vals, x), (em, vals, x)


def _edge_reduce_bwd(res, g):
    em, vals, x = res
    dvals = _dot_raw(em, g, x, masked=True)
    dx = _reduce_raw(em.transpose(), transpose_vals(em, vals), g)
    return _zero_int_cotangent(em), dvals, dx


edge_reduce.defvjp(_edge_reduce_fwd, _edge_reduce_bwd)


@jax.custom_vjp
def edge_dot(em: EdgeMap, a, b):
    """Per-edge inner products s[r,k] = a[row r] . b[idx[r,k]]; zero on pads.

    a: [..., n_rows, D] (row order), b: [..., n_cols, D]
    -> tuple of [..., Nb, Kb]
    """
    return _dot_raw(em, a, b, masked=True)


def _edge_dot_fwd(em, a, b):
    return _dot_raw(em, a, b, masked=True), (em, a, b)


def _edge_dot_bwd(res, ds):
    em, a, b = res
    ds = _mask_tuple(em, ds)
    da = _reduce_raw(em, ds, b)
    db = _reduce_raw(em.transpose(), transpose_vals(em, ds), a)
    return _zero_int_cotangent(em), da, db


edge_dot.defvjp(_edge_dot_fwd, _edge_dot_bwd)


@jax.custom_vjp
def edge_gather(em: EdgeMap, v):
    """Per-slot gather of a per-node vector: s[r,k] = v[idx[r,k]]; zero pads.

    v: [..., n_cols] -> tuple of [..., Nb, Kb]
    """
    return _gather_raw(em, v, masked=True)


def _edge_gather_fwd(em, v):
    return _gather_raw(em, v, masked=True), em


def _edge_gather_bwd(em, ds):
    ds = _mask_tuple(em, ds)
    ds_t = transpose_vals(em, ds)
    dv = jnp.take(jnp.concatenate([jnp.sum(s, axis=-1) for s in ds_t],
                                  axis=-1), em.b_inv, axis=-1)
    return _zero_int_cotangent(em), dv


edge_gather.defvjp(_edge_gather_fwd, _edge_gather_bwd)


def _vgather_raw(em: EdgeMap, x, masked: bool = True):
    """s[..., rb, k, :] = x[..., idx[rb,k], :]; zero vectors on pads."""
    out = []
    for idx, deg in zip(em.f_idx, em.f_deg):
        s = jnp.take(x, idx, axis=-2)                       # [..., Nb, Kb, D]
        if masked:
            m = (jnp.arange(idx.shape[1], dtype=jnp.int32)[None, :]
                 < deg[:, None])
            s = jnp.where(m[..., None], s, 0.0)
        out.append(s)
    return tuple(out)


@jax.custom_vjp
def edge_vgather(em: EdgeMap, x):
    """Per-slot VECTOR gather: s[rb, k, :] = x[idx[rb,k], :]; zeros on pads.

    The vector-valued sibling of ``edge_gather`` — serves per-edge neighbor
    feature loads whose cotangent would otherwise be a scatter-add into the
    node table (the dominant cost of TGCN's Attention1 backward,
    model/tgcn.py:11-37).  d x is computed over the precomputed transpose
    structure: move D into the leading batch axes, ``transpose_vals``, then
    sum each transpose row's slots — gathers only.

    x: [..., n_cols, D] -> tuple of [..., Nb, Kb, D]
    """
    return _vgather_raw(em, x, masked=True)


def _edge_vgather_fwd(em, x):
    return _vgather_raw(em, x, masked=True), em


def _edge_vgather_bwd(em, ds):
    # Padding slots of the fwd side never appear in b_src, so unmasked pad
    # cotangents are dropped by construction.
    # All gathers run on axis -2 with the feature dim D kept contiguous/minor
    # — no physical [D, slots] transposes (the moveaxis formulation cost more
    # than the scatter-add it replaced: 54ms vs 43ms TGCN backward, measured).
    lead = ds[0].shape[:-3]
    d = ds[0].shape[-1]
    flat = jnp.concatenate([s.reshape(lead + (-1, d)) for s in ds], axis=-2)
    flat = jnp.concatenate(
        [flat, jnp.zeros(lead + (1, d), flat.dtype)], axis=-2)
    # [..., Mb, Kb', D] per transpose bucket, then sum each row's slots
    parts = [jnp.sum(jnp.take(flat, src, axis=-2), axis=-2)
             for src in em.b_src]
    dv = jnp.take(jnp.concatenate(parts, axis=-2), em.b_inv, axis=-2)
    return _zero_int_cotangent(em), dv


edge_vgather.defvjp(_edge_vgather_fwd, _edge_vgather_bwd)


def _mask_tuple(em: EdgeMap, vals):
    out = []
    for v, idx, deg in zip(vals, em.f_idx, em.f_deg):
        m = (jnp.arange(idx.shape[1], dtype=jnp.int32)[None, :] < deg[:, None])
        out.append(jnp.where(m, v, 0.0))
    return tuple(out)


def edge_softmax(em: EdgeMap, scores) -> tuple:
    """Row-wise masked softmax over each row's slots (the dense replacement for
    torch.sparse.softmax(adj, dim=1)); probability 0 on padding slots, all-zero
    rows for degree-0 rows.  scores: tuple of [..., Nb, Kb]."""
    out = []
    for s, idx, deg in zip(scores, em.f_idx, em.f_deg):
        if s.shape[-1] == 0:
            out.append(s)
            continue
        m = (jnp.arange(idx.shape[1], dtype=jnp.int32)[None, :] < deg[:, None])
        neg = jnp.finfo(s.dtype).min
        masked = jnp.where(m, s, neg)
        mx = jnp.max(masked, axis=-1, keepdims=True)
        e = jnp.exp(masked - jax.lax.stop_gradient(mx)) * m
        z = jnp.sum(e, axis=-1, keepdims=True)
        out.append(e / jnp.where(z == 0, 1.0, z))
    return tuple(out)


# ---------------------------------------------------------------------------
# cross-layout slot transfer (two EdgeMaps over the SAME edge set)
# ---------------------------------------------------------------------------

def cross_slot_maps(host_from: EdgeMapHost, host_to: EdgeMapHost):
    """Bijective slot maps between two EdgeMaps built over the same edges in
    the same order (e.g. a node-keyed and a (relation,node)-keyed map).

    Returns ``(to_tables, from_tables)``: per-to-bucket [Nb,Kb] indices into
    the from-side flat slots (sentinel = from_total on pads), and vice versa.
    Feed them to ``slot_transfer``.
    """
    assert len(host_from.f_slot_of_edge) == len(host_to.f_slot_of_edge)

    def tables(src_slot, dst_host, dst_slot, src_total):
        flat = np.full(_total_slots(dst_host.f), src_total, dtype=np.int64)
        flat[dst_slot] = src_slot
        out, off = [], 0
        for bk in dst_host.f.buckets:
            n = bk.idx.shape[0] * bk.idx.shape[1]
            out.append(flat[off:off + n].reshape(bk.idx.shape).astype(np.int32))
            off += n
        return out

    f_tot = _total_slots(host_from.f)
    t_tot = _total_slots(host_to.f)
    to_tables = tables(host_from.f_slot_of_edge, host_to,
                       host_to.f_slot_of_edge, f_tot)
    from_tables = tables(host_to.f_slot_of_edge, host_from,
                         host_from.f_slot_of_edge, t_tot)
    return to_tables, from_tables


def _transfer_raw(vals, dst_tables):
    lead = vals[0].shape[:-2]
    flat = jnp.concatenate([v.reshape(lead + (-1,)) for v in vals], axis=-1)
    flat = jnp.concatenate(
        [flat, jnp.zeros(lead + (1,), dtype=flat.dtype)], axis=-1)
    return tuple(jnp.take(flat, t, axis=-1) for t in dst_tables)


@jax.custom_vjp
def slot_transfer(vals, to_tables, from_tables):
    """Move per-slot values between the layouts of two EdgeMaps over the same
    edge set; the cotangent is the inverse transfer (a gather, not a scatter).
    ``to_tables``/``from_tables`` come from ``cross_slot_maps``."""
    return _transfer_raw(vals, to_tables)


def _slot_transfer_fwd(vals, to_tables, from_tables):
    return _transfer_raw(vals, to_tables), (to_tables, from_tables)


def _slot_transfer_bwd(res, ds):
    to_tables, from_tables = res
    return (_transfer_raw(ds, from_tables), _zero_int_cotangent(to_tables),
            _zero_int_cotangent(from_tables))


slot_transfer.defvjp(_slot_transfer_fwd, _slot_transfer_bwd)
