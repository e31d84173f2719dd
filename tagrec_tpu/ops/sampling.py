"""On-device sampling — replaces the reference's CPU worker-pool rejection loops.

The reference samples negatives by host-side rejection in a multiprocessing
pool (train_data/utils.py:19-40, train_data/bpr_training_data.py:29-45).  Here
the positive sets live on device as a padded table and negatives are drawn
uniformly with a fixed number of masked re-draw rounds — after R rounds the
residual collision probability is (density)^R, negligible for CF densities,
and the shapes stay static for jit.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class PosTable(NamedTuple):
    """Padded per-head positive-id table.

    table: [H, P] int32, padded with ``n_ids`` (an out-of-range sentinel that
           can never collide with a candidate draw)
    deg:   [H] int32 — number of valid entries per head
    n_ids: [] int32 — size of the candidate id space
    """

    table: jnp.ndarray
    deg: jnp.ndarray
    n_ids: jnp.ndarray


def build_pos_table(pos_dict: Dict[int, List[int]], n_heads: int, n_ids: int,
                    pad_multiple: int = 8) -> PosTable:
    """Host build of the padded positive table from a {head: ids} dict."""
    deg = np.zeros(n_heads, dtype=np.int32)
    for h, ids in pos_dict.items():
        deg[h] = len(ids)
    p = int(deg.max()) if n_heads and deg.max() > 0 else 1
    p = ((p + pad_multiple - 1) // pad_multiple) * pad_multiple
    table = np.full((n_heads, p), n_ids, dtype=np.int32)
    for h, ids in pos_dict.items():
        table[h, : len(ids)] = ids
    return PosTable(table=jnp.asarray(table), deg=jnp.asarray(deg),
                    n_ids=jnp.asarray(n_ids, dtype=jnp.int32))


def contains(pt: PosTable, heads: jnp.ndarray, cand: jnp.ndarray) -> jnp.ndarray:
    """[B] bool — is cand[b] among head[b]'s positives."""
    rows = jnp.take(pt.table, heads, axis=0)          # [B, P]
    return jnp.any(rows == cand[:, None], axis=1)


def sample_negatives(key, pt: PosTable, heads: jnp.ndarray,
                     rounds: int = 16) -> jnp.ndarray:
    """Uniform negatives outside each head's positive set.

    One-shot vectorized form of the reference's rejection loop
    (train_data/utils.py:19-28): draw ``rounds`` candidates per head at once
    and pick the first non-colliding one.  Residual collision probability is
    density^rounds (~1e-28 at CF densities with the default 16) — the final
    candidate is kept in that measure-zero case, keeping shapes static.
    """
    b = heads.shape[0]
    rows = jnp.take(pt.table, heads, axis=0)               # [B, P]
    cands = jax.random.randint(key, (rounds, b), 0, pt.n_ids,
                               dtype=jnp.int32)            # [R, B]
    bad = jnp.any(cands[:, :, None] == rows[None, :, :], axis=-1)  # [R, B]
    first_good = jnp.argmax(~bad, axis=0)                  # first False->True
    sel = jnp.where(jnp.any(~bad, axis=0), first_good, rounds - 1)
    return jnp.take_along_axis(cands, sel[None, :], axis=0)[0]


def sample_positive(key, pt: PosTable, heads: jnp.ndarray) -> jnp.ndarray:
    """One uniformly-chosen positive id per head (train_data/utils.py:66-67)."""
    b = heads.shape[0]
    deg = jnp.maximum(jnp.take(pt.deg, heads), 1)
    j = jax.random.randint(key, (b,), 0, jnp.iinfo(jnp.int32).max) % deg
    rows = jnp.take(pt.table, heads, axis=0)
    return jnp.take_along_axis(rows, j[:, None].astype(jnp.int32), axis=1)[:, 0]


class TripleTable(NamedTuple):
    """(head, relation)-keyed positive-tail table for TransE-style sampling.

    Keys are flattened ``head * n_rel + rel``; used by the KGAT TransE and TGCN
    TransTag phases (train_data/transe_training_data.py) where corrupted tails
    must avoid the observed (h, r, *) set.
    """

    table: jnp.ndarray  # [n_keys_padded?, P] — dense over keys actually present
    key_of: jnp.ndarray  # map flat key -> row in table (or -1)
    deg: jnp.ndarray
    n_ids: jnp.ndarray


def build_triple_table(triples: np.ndarray, n_rel: int, n_ids: int,
                       pad_multiple: int = 8):
    """Host build from [T, 3] (h, r, t) triples -> PosTable keyed by h*n_rel+r.

    Returns (PosTable, flat_key array for the triples) so callers can sample
    corrupted tails per observed triple.
    """
    h, r, t = triples[:, 0], triples[:, 1], triples[:, 2]
    flat = h.astype(np.int64) * n_rel + r.astype(np.int64)
    # vectorized sort + RLE build (the per-triple python dict loop cost
    # minutes at 10x scale, ~1M triples)
    order = np.argsort(flat, kind="stable")
    fs, ts = flat[order], t[order]
    uniq, starts, counts = np.unique(fs, return_index=True,
                                     return_counts=True)
    triple_keys = np.searchsorted(uniq, flat).astype(np.int32)
    deg = counts.astype(np.int32)
    p = int(counts.max()) if len(counts) else 1
    p = ((p + pad_multiple - 1) // pad_multiple) * pad_multiple
    table = np.full((len(uniq), p), n_ids, dtype=np.int32)
    grp = np.repeat(np.arange(len(uniq)), counts)
    pos_in_grp = np.arange(len(fs)) - np.repeat(starts, counts)
    table[grp, pos_in_grp] = ts
    pt = PosTable(table=jnp.asarray(table), deg=jnp.asarray(deg),
                  n_ids=jnp.asarray(n_ids, dtype=jnp.int32))
    return pt, triple_keys


class TripleSet(NamedTuple):
    """Lexicographically sorted (key, tail) membership set for (h, r)-keyed
    corrupted-tail sampling.

    Every observed triple is one (key = h*n_rel + r, tail) int32 pair in a
    SORTED flat pair-of-arrays; membership is a vectorized binary search.
    O(T) memory with no padding — the padded-row TripleTable
    ([n_keys, max_tails]) blows up on zipf graphs where one hub head has
    ~1e5 tails (40+ GB at 10x scale); this set is 72 MB for 9M triples.
    Two int32 arrays (not one int64 code): jax's default x64-disabled mode
    silently truncates int64 device arrays, and key*n_ids+t overflows int32
    beyond ~2k-user scale.  Used by triple_phase (KGAT TransE / TGCN
    TransTag); semantics identical to the reference's h_r_dict rejection
    test (train_data/utils.py:31-40).
    """

    skey: jnp.ndarray    # [T] int32, sorted (primary)
    stail: jnp.ndarray   # [T] int32, sorted within equal keys
    n_ids: jnp.ndarray   # int32 scalar (tail id space)


def build_triple_set(triples: np.ndarray, n_rel: int, n_ids: int):
    """Host build -> (TripleSet, per-triple int32 flat keys h*n_rel + r)."""
    h, r, t = triples[:, 0], triples[:, 1], triples[:, 2]
    # _pair_member's binary search takes from skey/stail; zero-length arrays
    # would fail far from the cause (ADVICE r4) — an empty KG is a data bug
    assert len(triples) > 0, "build_triple_set: empty triple array"
    keys = (h.astype(np.int64) * n_rel + r.astype(np.int64))
    assert keys.max(initial=0) < 2**31 and n_ids < 2**31
    order = np.lexsort((t, keys))
    return (TripleSet(skey=jnp.asarray(keys[order], dtype=jnp.int32),
                      stail=jnp.asarray(t[order].astype(np.int64),
                                        dtype=jnp.int32),
                      n_ids=jnp.asarray(n_ids, dtype=jnp.int32)),
            keys.astype(np.int32))


def _pair_member(ts: TripleSet, k: jnp.ndarray, t: jnp.ndarray):
    """Vectorized lexicographic binary search: is (k, t) in the set?"""
    n = ts.skey.shape[0]
    steps = max(int(np.ceil(np.log2(max(n, 2)))) + 1, 1)
    lo = jnp.zeros(k.shape, jnp.int32)
    hi = jnp.full(k.shape, n, jnp.int32)

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) // 2
        km = jnp.take(ts.skey, mid)
        tm = jnp.take(ts.stail, mid)
        less = (km < k) | ((km == k) & (tm < t))   # pair[mid] < query
        return jnp.where(less, mid + 1, lo), jnp.where(less, hi, mid)

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    idx = jnp.minimum(lo, n - 1)
    return ((jnp.take(ts.skey, idx) == k) & (jnp.take(ts.stail, idx) == t)
            & (lo < n))


def sample_negatives_from_set(key, ts: TripleSet, keys: jnp.ndarray,
                              rounds: int = 16) -> jnp.ndarray:
    """Uniform corrupted tails outside each key's observed tail set —
    same masked re-draw scheme as sample_negatives, membership by binary
    search over the sorted pairs instead of a padded-row gather."""
    b = keys.shape[0]
    cands = jax.random.randint(key, (rounds, b), 0, ts.n_ids,
                               dtype=jnp.int32)                     # [R, B]
    bad = _pair_member(ts, jnp.broadcast_to(keys[None, :], cands.shape),
                       cands)
    first_good = jnp.argmax(~bad, axis=0)
    sel = jnp.where(jnp.any(~bad, axis=0), first_good, rounds - 1)
    return jnp.take_along_axis(cands, sel[None, :], axis=0)[0]
