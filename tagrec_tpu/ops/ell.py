"""ELL (padded fixed-width) sparse representation — the framework's one graph format.

TPU-first replacement for the reference's ``torch.sparse_coo_tensor`` +
``torch.sparse.mm`` pipeline (model/help/adj.py:144-167): every node row stores
a fixed-width, zero-padded array of neighbor column ids and edge values.  All
downstream "sparse" operations (SpMM propagation, row softmax, per-edge routing,
edge dropout) become dense gathers and masked reductions with static shapes —
no scatter, no dynamic shapes, MXU/VPU friendly.

The padding width is the max row degree rounded up to a lane-friendly multiple.
For power-law graphs where max degree >> mean degree, use the row-bucketed
variant (``build_ell_buckets``) which splits rows into degree buckets so padding
waste stays bounded.
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp


class Ell(NamedTuple):
    """Device-side ELL adjacency block.

    idx: [N, K] int32 — neighbor column ids (0-padded; use mask to ignore)
    val: [N, K] float32 — edge values (0-padded)
    deg: [N]    int32  — true number of neighbors per row
    """

    idx: jnp.ndarray
    val: jnp.ndarray
    deg: jnp.ndarray


class EllHost(NamedTuple):
    idx: np.ndarray
    val: np.ndarray
    deg: np.ndarray
    n_cols: int


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m if x > 0 else m


def build_ell(row: np.ndarray, col: np.ndarray, val: np.ndarray,
              n_rows: int, n_cols: int, pad_multiple: int = 8,
              width: int | None = None) -> EllHost:
    """Pack row-sorted COO edges into padded [N, K] tables (host, numpy).

    K = max row degree rounded up to ``pad_multiple`` (or the explicit
    ``width``).  Padding slots have idx 0 / val 0; ``deg`` records validity.
    """
    row = np.asarray(row, dtype=np.int64)
    order = np.argsort(row, kind="stable")
    row, col, val = row[order], np.asarray(col)[order], np.asarray(val)[order]
    deg = np.bincount(row, minlength=n_rows).astype(np.int32)
    k = int(deg.max()) if len(deg) and deg.max() > 0 else 1
    k = _round_up(k, pad_multiple)
    if width is not None:
        assert width >= k or width >= int(deg.max()), "explicit width too small"
        k = width
    idx = np.zeros((n_rows, k), dtype=np.int32)
    v = np.zeros((n_rows, k), dtype=np.float32)
    # slot position of each edge within its row
    starts = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(deg, out=starts[1:])
    slot = np.arange(len(row)) - starts[row]
    idx[row, slot] = col.astype(np.int32)
    v[row, slot] = val.astype(np.float32)
    return EllHost(idx=idx, val=v, deg=deg, n_cols=n_cols)


def ell_from_coo(coo, pad_multiple: int = 8, width: int | None = None) -> EllHost:
    """Build an EllHost from a data.graph.COO (duplicates already summed)."""
    return build_ell(coo.row, coo.col, coo.val, coo.shape[0], coo.shape[1],
                     pad_multiple=pad_multiple, width=width)


def to_device(h: EllHost) -> Ell:
    return Ell(idx=jnp.asarray(h.idx), val=jnp.asarray(h.val),
               deg=jnp.asarray(h.deg))


def ell_mask(ell: Ell) -> jnp.ndarray:
    """[N, K] bool — True on valid (non-pad) slots."""
    k = ell.idx.shape[1]
    return jnp.arange(k, dtype=jnp.int32)[None, :] < ell.deg[:, None]


# --------------------------------------------------------------------------
# Degree-bucketed ELL: split rows into buckets by degree so a handful of hub
# rows don't inflate K for everyone.  Each bucket is a standalone ELL over a
# subset of rows; results are scattered back by row id (a cheap dense
# concatenate + permutation, not a scatter-add).
# --------------------------------------------------------------------------

class EllBucketsHost(NamedTuple):
    buckets: List[EllHost]       # per-bucket tables over bucket-local rows
    rows: List[np.ndarray]       # global row ids per bucket
    inv_perm: np.ndarray         # [N] — concat(bucket outputs)[inv_perm] is row-ordered
    n_rows: int
    n_cols: int


class EllBuckets(NamedTuple):
    """Device-side bucketed ELL: tuple of Ell parts + reassembly permutation.

    Static pytree structure (bucket count/widths fixed at trace time); the
    reassembly is a gather, never a scatter.
    """

    parts: tuple
    inv_perm: jnp.ndarray


def auto_boundaries(deg: np.ndarray,
                    quantiles=(0.25, 0.5, 0.75, 0.9, 0.97, 0.995)) \
        -> Tuple[int, ...]:
    """Degree-quantile bucket boundaries (deduped, increasing)."""
    pos = deg[deg > 0]
    if len(pos) == 0:
        return ()
    qs = sorted({int(np.quantile(pos, q)) for q in quantiles})
    mx = int(pos.max())
    return tuple(q for q in qs if 0 < q < mx)


def build_ell_buckets(row, col, val, n_rows: int, n_cols: int,
                      boundaries: Tuple[int, ...] | None = None,
                      pad_multiple: int = 8) -> EllBucketsHost:
    """Bucket rows by degree at the given boundaries, ELL-pack each bucket.

    With ``boundaries=None`` they are derived from degree quantiles, bounding
    padding waste on power-law graphs where max degree >> mean degree.
    """
    row = np.asarray(row, dtype=np.int64)
    deg = np.bincount(row, minlength=n_rows)
    order = np.argsort(row, kind="stable")
    row_s = row[order]
    col_s = np.asarray(col)[order]
    val_s = np.asarray(val)[order]

    if boundaries is None:
        boundaries = auto_boundaries(deg)
    bounds = list(boundaries) + [max(int(deg.max()), 1)]

    lo = -1  # first bucket includes deg-0 rows
    buckets, rows_list = [], []
    for b in bounds:
        sel = np.where((deg > lo) & (deg <= b))[0]
        lo = b
        if len(sel) == 0:
            continue
        sel_mask = np.zeros(n_rows, dtype=bool)
        sel_mask[sel] = True
        e_mask = sel_mask[row_s]
        local_of = np.full(n_rows, -1, dtype=np.int64)
        local_of[sel] = np.arange(len(sel))
        h = build_ell(local_of[row_s[e_mask]], col_s[e_mask], val_s[e_mask],
                      len(sel), n_cols, pad_multiple=pad_multiple)
        buckets.append(h)
        rows_list.append(sel)
        if b >= deg.max():
            break
    perm = np.concatenate(rows_list)
    inv_perm = np.empty(n_rows, dtype=np.int64)
    inv_perm[perm] = np.arange(n_rows)
    return EllBucketsHost(buckets=buckets, rows=rows_list, inv_perm=inv_perm,
                          n_rows=n_rows, n_cols=n_cols)


def buckets_to_device(h: EllBucketsHost) -> EllBuckets:
    return EllBuckets(parts=tuple(to_device(b) for b in h.buckets),
                      inv_perm=jnp.asarray(h.inv_perm))


def build_ell_buckets_slots(row, col, val, n_rows: int, n_cols: int,
                            boundaries: Tuple[int, ...] | None = None,
                            pad_multiple: int = 8):
    """build_ell_buckets + per-edge slot tracking.

    Returns ``(EllBucketsHost, slot_of_edge)`` where ``slot_of_edge[e]`` is the
    flat position of input edge ``e`` in the concatenation of the bucket tables
    (bucket order, each bucket row-major [Nb*Kb]).  This is the substrate for
    the fwd<->transpose slot bijections of ops.edgemap (scatter-free VJPs).

    Unlike ``build_ell_buckets``, degree-0 rows get their own ZERO-WIDTH
    bucket (tables [Nb, 0]) instead of being padded into the first bucket —
    essential for keyed row spaces (e.g. (relation, node) composite keys,
    ops.edgemap.build_keyed_edge_map) where most rows are empty and 8-wide
    padding would dominate the gather volume.
    """
    row = np.asarray(row, dtype=np.int64)
    col = np.asarray(col, dtype=np.int64)
    val = np.asarray(val, dtype=np.float32)
    n_edges = len(row)
    deg = np.bincount(row, minlength=n_rows)
    order = np.argsort(row, kind="stable")
    row_s, col_s, val_s = row[order], col[order], val[order]

    if boundaries is None:
        boundaries = auto_boundaries(deg)
    bounds = list(boundaries) + [max(int(deg.max()) if n_edges else 1, 1)]

    # slot position of each (row-sorted) edge within its row
    starts = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(deg, out=starts[1:])
    slot_in_row = np.arange(n_edges, dtype=np.int64) - starts[row_s]

    lo = 0
    buckets, rows_list = [], []
    zero_rows = np.where(deg == 0)[0]
    if len(zero_rows):
        buckets.append(EllHost(idx=np.zeros((len(zero_rows), 0), np.int32),
                               val=np.zeros((len(zero_rows), 0), np.float32),
                               deg=np.zeros(len(zero_rows), np.int32),
                               n_cols=n_cols))
        rows_list.append(zero_rows)
    slot_of_sorted = np.zeros(n_edges, dtype=np.int64)
    flat_offset = 0
    for b in bounds:
        sel = np.where((deg > lo) & (deg <= b))[0]
        lo = b
        if len(sel) == 0:
            continue
        sel_mask = np.zeros(n_rows, dtype=bool)
        sel_mask[sel] = True
        e_mask = sel_mask[row_s]
        local_of = np.full(n_rows, -1, dtype=np.int64)
        local_of[sel] = np.arange(len(sel))
        local_rows = local_of[row_s[e_mask]]
        h = build_ell(local_rows, col_s[e_mask], val_s[e_mask],
                      len(sel), n_cols, pad_multiple=pad_multiple)
        k = h.idx.shape[1]
        slot_of_sorted[e_mask] = (flat_offset + local_rows * k
                                  + slot_in_row[e_mask])
        flat_offset += len(sel) * k
        buckets.append(h)
        rows_list.append(sel)
        if len(deg) and b >= deg.max():
            break
    perm = (np.concatenate(rows_list) if rows_list
            else np.zeros(0, dtype=np.int64))
    inv_perm = np.empty(n_rows, dtype=np.int64)
    inv_perm[perm] = np.arange(n_rows)
    slot_of_edge = np.empty(n_edges, dtype=np.int64)
    slot_of_edge[order] = slot_of_sorted
    host = EllBucketsHost(buckets=buckets, rows=rows_list, inv_perm=inv_perm,
                          n_rows=n_rows, n_cols=n_cols)
    return host, slot_of_edge


class HybridHost(NamedTuple):
    """Hybrid adjacency: dense hub-column block + ELL tail.

    On zipf-popularity graphs a few hundred hub columns carry a large share of
    all edges; aggregating them as ONE dense [N, H] @ [H, D] matmul puts that
    share on the MXU at streaming bandwidth, leaving only tail edges for the
    random-row gather path.  ``dense_cols``/``dense_block`` are None when no
    column clears the threshold.
    """

    ell: EllBucketsHost
    dense_cols: np.ndarray | None   # [H] column ids
    dense_block: np.ndarray | None  # [N, H] values


class Hybrid(NamedTuple):
    ell: EllBuckets
    dense_cols: jnp.ndarray | None
    dense_block: jnp.ndarray | None


def _empty_buckets(n_rows: int, n_cols: int) -> EllBucketsHost:
    return EllBucketsHost(buckets=[], rows=[],
                          inv_perm=np.zeros(0, dtype=np.int64),
                          n_rows=n_rows, n_cols=n_cols)


def build_dense(coo, dtype=np.float32) -> HybridHost:
    """Fully dense adjacency (dense_cols=None + full block): at small/medium
    scale (N*M*4B within budget) one MXU matmul streams the whole adjacency at
    HBM bandwidth and beats every gather formulation.  dtype=bfloat16 halves
    the stream (values are normalization weights; f32 accumulation in the
    matmul — see ops.propagate.hybrid_mm)."""
    block = coo.to_dense()
    if dtype is not np.float32:
        import jax.numpy as jnp
        block = np.asarray(jnp.asarray(block, dtype=jnp.bfloat16))
    return HybridHost(ell=_empty_buckets(coo.shape[0], coo.shape[1]),
                      dense_cols=None, dense_block=block)


# Hub-block byte budget for the adaptive max_hub_cols default: the dense
# [N, H] block streams at HBM bandwidth once per sweep while every edge it
# absorbs leaves the issue-rate-bound ELL gather tail (~85GB/s effective,
# DESIGN §7) — so above hetrec scale the block should grow with the graph
# instead of staying at the hetrec-tuned 512.  1GB: a 2GB block crashed the
# tunneled TPU worker at 10x scale (single multi-GB transfer; see
# _to_device_chunked) and doubles HBM pressure for diminishing zipf-tail
# coverage.
HUB_BLOCK_BUDGET_BYTES = 1 << 30


def build_hybrid(coo, hub_min_degree: int = 96, max_hub_cols=None,
                 boundaries=None, pad_multiple: int = 8) -> HybridHost:
    """Split a COO into hub columns (in-degree >= hub_min_degree, capped at
    the top ``max_hub_cols``) + bucketed ELL over the remaining edges.

    ``max_hub_cols=None``: adaptive — as many hub columns as fit the
    HUB_BLOCK_BUDGET_BYTES dense block (at least the hetrec-tuned 512)."""
    if max_hub_cols is None:
        max_hub_cols = max(HUB_BLOCK_BUDGET_BYTES // (coo.shape[0] * 4) // 128
                           * 128, 512)
    indeg = np.bincount(coo.col, minlength=coo.shape[1])
    hub = np.where(indeg >= hub_min_degree)[0]
    if len(hub) > max_hub_cols:
        hub = hub[np.argsort(-indeg[hub])[:max_hub_cols]]
        hub = np.sort(hub)
    if len(hub) == 0:
        ell = build_ell_buckets(coo.row, coo.col, coo.val, coo.shape[0],
                                coo.shape[1], boundaries=boundaries,
                                pad_multiple=pad_multiple)
        return HybridHost(ell=ell, dense_cols=None, dense_block=None)

    col_of = np.full(coo.shape[1], -1, dtype=np.int64)
    col_of[hub] = np.arange(len(hub))
    is_hub = col_of[coo.col] >= 0
    block = np.zeros((coo.shape[0], len(hub)), dtype=np.float32)
    block[coo.row[is_hub], col_of[coo.col[is_hub]]] = coo.val[is_hub]
    ell = build_ell_buckets(coo.row[~is_hub], coo.col[~is_hub],
                            coo.val[~is_hub], coo.shape[0], coo.shape[1],
                            boundaries=boundaries, pad_multiple=pad_multiple)
    return HybridHost(ell=ell, dense_cols=hub.astype(np.int32),
                      dense_block=block)


def _to_device_chunked(arr: np.ndarray, max_bytes: int = 256 << 20):
    """Host->device transfer in row chunks: a single multi-GB device_put
    through the tunneled backend can crash the worker (observed with a 2GB
    hub block at 10x scale); ~256MB pieces ride the same data path the
    hetrec-scale sector blocks use, then concatenate on device."""
    nbytes = arr.size * arr.itemsize
    if nbytes <= max_bytes or arr.ndim < 2 or arr.shape[0] < 2:
        return jnp.asarray(arr)
    rows_per = max(int(arr.shape[0] * max_bytes / nbytes), 1)
    pieces = [jnp.asarray(arr[i:i + rows_per])
              for i in range(0, arr.shape[0], rows_per)]
    return jnp.concatenate(pieces, axis=0)


def hybrid_to_device(h: HybridHost) -> Hybrid:
    return Hybrid(ell=buckets_to_device(h.ell),
                  dense_cols=None if h.dense_cols is None
                  else jnp.asarray(h.dense_cols),
                  dense_block=None if h.dense_block is None
                  else _to_device_chunked(h.dense_block))


class DenseSectorsHost(NamedTuple):
    """Sector-blocked dense adjacency (host).

    The joint {user, item, tag} adjacency is block-structured
    ([[0, UI, UT], [IU, 0, IT], [TU, TI, 0]], model/help/adj.py:19-35): its
    diagonal blocks are structurally zero, which is ~50% of the full [N, N]
    area at hetrec shape.  Storing only the nonzero sector blocks and running
    one MXU matmul per block halves the adjacency HBM stream vs the full
    dense form — the dominant cost of LightGCN's step (measured).

    blocks: ((ri, ci, np.ndarray [rows_ri, cols_ci]), ...) nonzero sectors
    sizes:  per-sector node counts (rows == cols: square joint adjacency)
    """

    blocks: tuple
    sizes: tuple


class DenseSectors:
    """Device-side sector-blocked dense adjacency (custom pytree: block
    arrays are leaves, coordinates/sizes are static aux data)."""

    def __init__(self, blocks, coords, sizes):
        self.blocks = tuple(blocks)   # jnp arrays
        self.coords = tuple(coords)   # ((ri, ci), ...) static
        self.sizes = tuple(sizes)

    def tree_flatten(self):
        return self.blocks, (self.coords, self.sizes)

    @classmethod
    def tree_unflatten(cls, aux, blocks):
        coords, sizes = aux
        return cls(blocks, coords, sizes)

    def __repr__(self):
        return (f"DenseSectors(coords={self.coords}, sizes={self.sizes}, "
                f"dtypes={[b.dtype for b in self.blocks]})")


jax.tree_util.register_pytree_node_class(DenseSectors)


def build_dense_sectors(coo, sectors, dtype=np.float32) -> DenseSectorsHost:
    """Split a square COO over per-type sectors into dense blocks, keeping
    only blocks that contain edges."""
    sizes = tuple(int(s) for s in sectors)
    offs = np.concatenate([[0], np.cumsum(sizes)])
    assert offs[-1] == coo.shape[0] == coo.shape[1], (offs[-1], coo.shape)
    ri_of = np.searchsorted(offs, coo.row, side="right") - 1
    ci_of = np.searchsorted(offs, coo.col, side="right") - 1
    blocks = []
    for ri in range(len(sizes)):
        for ci in range(len(sizes)):
            sel = (ri_of == ri) & (ci_of == ci)
            if not sel.any():
                continue
            b = np.zeros((sizes[ri], sizes[ci]), dtype=np.float32)
            np.add.at(b, (coo.row[sel] - offs[ri], coo.col[sel] - offs[ci]),
                      coo.val[sel])
            if dtype is not np.float32:
                import jax.numpy as jnp
                b = np.asarray(jnp.asarray(b, dtype=jnp.bfloat16))
            blocks.append((ri, ci, b))
    return DenseSectorsHost(blocks=tuple(blocks), sizes=sizes)


def dense_sectors_to_device(h: DenseSectorsHost) -> DenseSectors:
    import jax.numpy as jnp

    return DenseSectors(blocks=[jnp.asarray(b) for _, _, b in h.blocks],
                        coords=[(ri, ci) for ri, ci, _ in h.blocks],
                        sizes=h.sizes)


class AdjPairHost(NamedTuple):
    fwd: HybridHost
    bwd: HybridHost  # transpose; shared with fwd when symmetric


class AdjPair(NamedTuple):
    """Forward + transpose hybrid adjacency.

    Backs the custom-VJP SpMM (ops.propagate.pair_spmm): d/dx of A@x is A^T@g,
    so the backward pass is another dense-matmul + gather+reduce over the
    transpose structure instead of XLA's scatter-add for grad-of-gather — the
    scatter-free property is what makes ELL propagation fast on TPU in both
    directions.
    """

    fwd: Hybrid
    bwd: Hybrid


DENSE_ADJ_BUDGET_BYTES = 2 << 30  # auto-dense when the full matrix fits this


def build_adj_pair(coo, symmetric: bool = False, boundaries=None,
                   pad_multiple: int = 8, hub_min_degree: int = 96,
                   max_hub_cols=None, mode: str = "auto",
                   dense_budget: int = DENSE_ADJ_BUDGET_BYTES,
                   dense_dtype=np.float32, sectors=None) -> AdjPairHost:
    """Build fwd + transpose adjacency from a COO.

    mode:
      * "auto"   — dense when N*M*4B <= dense_budget, else hybrid (measured on
                   v5e: dense streams the whole adjacency through the MXU at
                   HBM bandwidth and beats the gather path ~3-4x at
                   hetrec scale)
      * "dense"  — force the full dense block
      * "hybrid" — dense hub columns + ELL tail
      * "ell"    — pure bucketed ELL (hub block disabled)

    ``sectors``: optional per-node-type sizes of a SQUARE joint adjacency
    whose diagonal blocks are structurally zero ([[0,UI,UT],[IU,0,IT],
    [TU,TI,0]], model/help/adj.py:19-35).  In dense mode this stores only the
    nonzero sector blocks (DenseSectorsHost) — ~half the HBM stream of the
    full [N, N] block at hetrec shape.  Ignored off the dense path.

    ``symmetric=True`` (valid for bi_norm/plain joint adjacencies, whose value
    matrices are symmetric) shares the forward structure for the backward pass.
    """
    if mode == "auto":
        mode = ("dense" if coo.shape[0] * coo.shape[1] * 4 <= dense_budget
                else "hybrid")
    if mode == "ell":
        hub_min_degree, max_hub_cols = 1 << 30, 0

    def build_one(c):
        if mode == "dense" and sectors is not None:
            return build_dense_sectors(c, sectors, dtype=dense_dtype)
        if mode == "dense":
            return build_dense(c, dtype=dense_dtype)
        return build_hybrid(c, hub_min_degree=hub_min_degree,
                            max_hub_cols=max_hub_cols, boundaries=boundaries,
                            pad_multiple=pad_multiple)

    fwd = build_one(coo)
    if symmetric:
        return AdjPairHost(fwd=fwd, bwd=fwd)
    return AdjPairHost(fwd=fwd, bwd=build_one(coo.transpose()))


def adj_pair_to_device(h: AdjPairHost) -> AdjPair:
    def side(x):
        if isinstance(x, DenseSectorsHost):
            return dense_sectors_to_device(x)
        return hybrid_to_device(x)

    fwd = side(h.fwd)
    bwd = fwd if h.bwd is h.fwd else side(h.bwd)
    return AdjPair(fwd=fwd, bwd=bwd)
