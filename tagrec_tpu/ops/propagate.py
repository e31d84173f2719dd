"""Graph propagation primitives over the ELL format.

``ell_mm`` is the universal propagation kernel — the TPU-native successor of the
reference's ``split_mm``/``torch.sparse.mm`` (model/help/adj.py:158-167).  It
lowers to one dense gather + a weighted reduction, which XLA fuses and tiles;
``coo_spmm`` (gather + segment_sum) is kept as the correctness oracle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import numpy as np

from tagrec_tpu.ops import ell as ell_lib
from tagrec_tpu.ops.ell import AdjPair, Ell, EllBuckets, Hybrid, ell_mask


def coo_spmm(row: jnp.ndarray, col: jnp.ndarray, val: jnp.ndarray,
             x: jnp.ndarray, n_rows: int) -> jnp.ndarray:
    """Oracle SpMM: out[r] = sum_{e: row[e]=r} val[e] * x[col[e]]."""
    gathered = jnp.take(x, col, axis=0) * val[:, None]
    return jax.ops.segment_sum(gathered, row, num_segments=n_rows)


# Budget for the [rows, K, D] gather intermediate of one ELL bucket.  XLA
# lane-pads the gather's minor dim to 128 and the slot dim to 8, so a d=64
# table materializes at 2x its logical bytes (measured: the 10x graph's
# 8GB logical gather padded to 16GB and OOM'd 16GB HBM outright).  Buckets
# whose padded intermediate exceeds this budget stream in row chunks under
# lax.map + checkpoint instead — graceful degradation on one chip, the
# memory role of the reference's sequential --split_adj_k folds
# (model/help/adj.py:114-140).
ELL_GATHER_BUDGET_BYTES = 1 << 30


def _gather_bytes_per_row(k: int, d: int, itemsize: int = 4) -> int:
    return -(-k // 8) * 8 * (-(-d // 128) * 128) * itemsize


def ell_mm(ell: Ell, x: jnp.ndarray, row_chunk: int | None = None) -> jnp.ndarray:
    """Dense ELL SpMM: out[n] = sum_k val[n,k] * x[idx[n,k]].

    Padding slots have val 0, so no mask is needed.  ``row_chunk`` bounds the
    [chunk, K, D] gather intermediate; when None it is derived from
    ELL_GATHER_BUDGET_BYTES (no chunking for graphs whose whole gather fits —
    the common case; XLA fuses the gather + multiply + sum either way).
    """
    n, k = ell.idx.shape
    if row_chunk is None:
        per_row = _gather_bytes_per_row(k, x.shape[1], x.dtype.itemsize)
        if n * per_row > ELL_GATHER_BUDGET_BYTES:
            row_chunk = max(ELL_GATHER_BUDGET_BYTES // per_row // 8 * 8, 8)
    if row_chunk is None or n <= row_chunk:
        return jnp.einsum("nk,nkd->nd", ell.val, jnp.take(x, ell.idx, axis=0))

    pad = (-n) % row_chunk
    idx = jnp.pad(ell.idx, ((0, pad), (0, 0)))
    val = jnp.pad(ell.val, ((0, pad), (0, 0)))
    idx = idx.reshape(-1, row_chunk, idx.shape[1])
    val = val.reshape(-1, row_chunk, val.shape[1])

    def body(c):
        ci, cv = c
        return jnp.einsum("nk,nkd->nd", cv, jnp.take(x, ci, axis=0))

    # checkpoint: autodiff callers rematerialize the chunk gather instead of
    # saving every [chunk, K, D] residual (which would re-create the OOM)
    out = jax.lax.map(jax.checkpoint(body), (idx, val))
    return out.reshape(-1, x.shape[1])[:n]


def ell_buckets_mm(eb: EllBuckets, x: jnp.ndarray) -> jnp.ndarray:
    """Bucketed ELL SpMM: per-bucket dense gather+reduce, then one gather to
    restore row order (no scatter)."""
    outs = [ell_mm(p, x) for p in eb.parts]
    return jnp.take(jnp.concatenate(outs, axis=0), eb.inv_perm, axis=0)


def _zero_cotangent(tree):
    """Zero cotangents for a pytree of device arrays (float0 for ints)."""
    def z(x):
        if jnp.issubdtype(x.dtype, jnp.integer):
            return np.zeros(x.shape, dtype=jax.dtypes.float0)
        return jnp.zeros_like(x)
    return jax.tree_util.tree_map(z, tree)


def dense_sectors_mm(ds, x: jnp.ndarray) -> jnp.ndarray:
    """Sector-blocked dense SpMM: one MXU matmul per nonzero sector block.

    Skips the joint adjacency's structurally-zero diagonal blocks — ~half the
    HBM stream of the full [N, N] dense form at hetrec shape (the dominant
    cost of the constant-adjacency step, measured).  bf16 blocks stream at
    half width with f32 accumulation, like hybrid_mm."""
    offs = [0]
    for s in ds.sizes:
        offs.append(offs[-1] + s)
    xs = [jax.lax.slice_in_dim(x, offs[i], offs[i + 1], axis=0)
          for i in range(len(ds.sizes))]
    outs: list = [None] * len(ds.sizes)
    for b, (ri, ci) in zip(ds.blocks, ds.coords):
        if b.dtype == jnp.bfloat16:
            y = jnp.dot(b, xs[ci].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        else:
            y = jnp.dot(b, xs[ci], preferred_element_type=x.dtype)
        outs[ri] = y if outs[ri] is None else outs[ri] + y
    outs = [o if o is not None
            else jnp.zeros((s, x.shape[1]), dtype=x.dtype)
            for o, s in zip(outs, ds.sizes)]
    return jnp.concatenate(outs, axis=0)


def hybrid_mm(h, x: jnp.ndarray) -> jnp.ndarray:
    """Hybrid SpMM: ELL gather for tail edges + one MXU matmul over the dense
    hub-column block (zipf graphs put ~half their edges on a few hundred
    popular columns — those stream through the MXU at full bandwidth).
    dense_cols=None with a block present means the block is the FULL dense
    adjacency (ops.ell.build_dense).  Also dispatches the sector-blocked
    dense form (ops.ell.DenseSectors)."""
    if isinstance(h, ell_lib.DenseSectors):
        return dense_sectors_mm(h, x)
    if h.dense_block is not None and h.dense_cols is None:
        if h.dense_block.dtype == jnp.bfloat16:
            # bf16-streamed adjacency: halves the HBM traffic of the hot
            # matmul; activations cast tile-wise, f32 accumulation on the MXU
            return jnp.dot(h.dense_block, x.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
        return jnp.dot(h.dense_block, x, preferred_element_type=x.dtype)
    out = ell_buckets_mm(h.ell, x)
    if h.dense_block is not None:
        out = out + h.dense_block @ jnp.take(x, h.dense_cols, axis=0)
    return out


@jax.custom_vjp
def pair_spmm(x: jnp.ndarray, fwd: Hybrid, bwd: Hybrid) -> jnp.ndarray:
    """SpMM with a scatter-free backward: forward aggregates via ``fwd``, the
    cotangent propagates via the transpose structure ``bwd`` (d(A@x)/dx =
    A^T g).  The adjacency is treated as a constant (zero cotangent) — correct
    for the precomputed normalized adjacencies used by LightGCN/NGCF; models
    with learned edge values use the autodiff path instead."""
    return hybrid_mm(fwd, x)


def _pair_spmm_fwd(x, fwd, bwd):
    return hybrid_mm(fwd, x), (fwd, bwd)


def _pair_spmm_bwd(res, g):
    fwd, bwd = res
    dx = hybrid_mm(bwd, g)
    return dx, _zero_cotangent(fwd), _zero_cotangent(bwd)


pair_spmm.defvjp(_pair_spmm_fwd, _pair_spmm_bwd)


def adj_mm(adj, x: jnp.ndarray) -> jnp.ndarray:
    """Propagate with a single Ell, EllBuckets, Hybrid, or AdjPair adjacency."""
    if isinstance(adj, AdjPair):
        return pair_spmm(x, adj.fwd, adj.bwd)
    if isinstance(adj, (Hybrid, ell_lib.DenseSectors)):
        return hybrid_mm(adj, x)
    if isinstance(adj, EllBuckets):
        return ell_buckets_mm(adj, x)
    return ell_mm(adj, x)


def ell_softmax(ell: Ell, scores: jnp.ndarray) -> jnp.ndarray:
    """Row-wise masked softmax over ELL slots — the dense replacement for
    ``torch.sparse.softmax(adj, dim=1)`` (model/kgat.py:97, model/disenhan.py:49).

    ``scores``: [N, K] per-slot logits.  Padding slots get probability 0.
    Rows with zero valid slots return all-zero rows.
    """
    mask = ell_mask(ell)
    neg = jnp.finfo(scores.dtype).min
    masked = jnp.where(mask, scores, neg)
    m = jnp.max(masked, axis=1, keepdims=True)
    e = jnp.exp(masked - jax.lax.stop_gradient(m)) * mask
    s = jnp.sum(e, axis=1, keepdims=True)
    return e / jnp.where(s == 0, 1.0, s)


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """Row L2 normalize matching torch.nn.functional.normalize (clamp-min eps).

    Formulated via a clamped squared-norm so the gradient at exactly-zero rows
    (isolated nodes after propagation) is 0 rather than NaN — jnp.linalg.norm
    has a NaN gradient at 0.
    """
    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    n = jnp.sqrt(jnp.maximum(sq, eps * eps))
    return x / n


def edge_dropout(adj, keep_prob_complement: float, key, training: bool):
    """Edge dropout over ELL values (reference ``node_drop``,
    model/help/adj.py:170-191: drop each edge w.p. ``keep_prob_complement`` —
    the reference's misnamed knob — and rescale survivors by 1/keep).
    Accepts a single Ell or an EllBuckets.
    """
    if not training or keep_prob_complement == 0.0:
        return adj
    if isinstance(adj, AdjPair):
        # dropped adjacency is data-dependent; the transpose-VJP pairing no
        # longer holds, so return the autodiff hybrid form
        return edge_dropout(adj.fwd, keep_prob_complement, key, training)
    keep = 1.0 - keep_prob_complement

    def drop_one(ell: Ell, k) -> Ell:
        u = jax.random.uniform(k, ell.val.shape)
        mask = (u + keep).astype(jnp.int32).astype(ell.val.dtype)  # floor ∈ {0,1}
        return Ell(idx=ell.idx, val=ell.val * mask / keep, deg=ell.deg)

    if isinstance(adj, ell_lib.DenseSectors):
        keys = jax.random.split(key, len(adj.blocks))
        blocks = []
        for b, k in zip(adj.blocks, keys):
            u = jax.random.uniform(k, b.shape)
            mask = (u + keep).astype(jnp.int32).astype(b.dtype)
            blocks.append(b * mask / keep)  # zeros stay zero
        return ell_lib.DenseSectors(blocks, adj.coords, adj.sizes)

    if isinstance(adj, Hybrid):
        k_ell, k_dense = jax.random.split(key)
        ell = edge_dropout(adj.ell, keep_prob_complement, k_ell, training)
        block = adj.dense_block
        if block is not None:
            u = jax.random.uniform(k_dense, block.shape)
            mask = (u + keep).astype(jnp.int32).astype(block.dtype)
            block = block * mask / keep  # zeros stay zero
        return Hybrid(ell=ell, dense_cols=adj.dense_cols, dense_block=block)

    if isinstance(adj, EllBuckets):
        keys = jax.random.split(key, len(adj.parts))
        return EllBuckets(parts=tuple(drop_one(p, k)
                                      for p, k in zip(adj.parts, keys)),
                          inv_perm=adj.inv_perm)
    return drop_one(adj, key)


def message_dropout(x: jnp.ndarray, rate: float, key, training: bool) -> jnp.ndarray:
    """Inverted dropout matching torch.nn.functional.dropout semantics."""
    if not training or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)
