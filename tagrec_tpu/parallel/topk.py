"""Distributed full-catalog top-k — sharded scoring + per-shard topk + merge.

The reference evaluates by a dense [B, n_item] matmul + torch.topk on one
device (training/basic_test.py:40-48).  Here the item/entity embedding table is
row-sharded over the ``model`` mesh axis: each shard scores its item slice,
takes a local top-k, and the k-candidate lists are all-gathered and merged —
O(B * I / n_shards) compute and O(B * k * n_shards) communication instead of
gathering the full score matrix.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _shard_map(f, mesh, in_specs, out_specs):
    sm = getattr(jax, "shard_map", None)
    if sm is None:  # older jax
        from jax.experimental.shard_map import shard_map as sm_  # type: ignore
        sm = lambda *a, **k: sm_(*a, **{x: y for x, y in k.items()
                                        if x != "check_vma"})
    try:
        # outputs are replicated over `model` by construction (all_gather +
        # identical top_k on every shard); the static vma check can't infer
        # that through the axis_index arithmetic, so disable it
        return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_vma=False)
    except TypeError:  # older kwarg name
        return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_rep=False)


def distributed_masked_topk(user_emb: jnp.ndarray, item_emb: jnp.ndarray,
                            train_pad: jnp.ndarray, k: int, mesh: Mesh,
                            axis: str = "model", n_valid: int | None = None):
    """Top-k item ids + scores per user over a row-sharded item table.

    user_emb:  [B, D] (replicated over ``axis``)
    item_emb:  [I, D] — sharded on rows over ``axis`` (I divisible by axis
               size; zero-padded rows allowed, masked via ``n_valid``)
    train_pad: [B, P] — global item ids to mask to -1024 (pad >= I dropped)
    Returns (values [B, k], ids [B, k]) with GLOBAL item ids, replicated.
    """
    n_shards = mesh.shape[axis]
    i_total = item_emb.shape[0]
    assert i_total % n_shards == 0, (i_total, n_shards)
    i_local = i_total // n_shards
    if n_valid is None:
        n_valid = i_total

    def local_fn(u, i_shard, tp):
        shard_id = jax.lax.axis_index(axis)
        offset = shard_id * i_local
        scores = jax.nn.sigmoid(u @ i_shard.T)           # [B, I/s]
        # mask table-padding columns (ids beyond the real catalog)
        col_ids = offset + jnp.arange(i_local)
        scores = jnp.where(col_ids[None, :] < n_valid, scores, -1024.0)
        # mask train positives that fall in this shard
        local_cols = tp - offset
        b = u.shape[0]
        rows = jnp.broadcast_to(jnp.arange(b)[:, None], tp.shape)
        in_shard = (local_cols >= 0) & (local_cols < i_local)
        cols = jnp.where(in_shard, local_cols, i_local)  # OOB -> dropped
        scores = scores.at[rows, cols].set(-1024.0, mode="drop")
        v, idx = jax.lax.top_k(scores, min(k, i_local))
        idx = idx + offset
        # gather all shards' candidates and merge
        v_all = jax.lax.all_gather(v, axis, axis=1)      # [B, s, k]
        i_all = jax.lax.all_gather(idx, axis, axis=1)
        v_all = v_all.reshape(b, -1)
        i_all = i_all.reshape(b, -1)
        mv, mi = jax.lax.top_k(v_all, k)
        ids = jnp.take_along_axis(i_all, mi, axis=1)
        return mv, ids

    specs_in = (P(), P(axis), P())
    specs_out = (P(), P())
    fn = _shard_map(local_fn, mesh, specs_in, specs_out)
    return fn(user_emb, item_emb, train_pad)


def sharded_eval_metrics(user_emb: jnp.ndarray, item_emb: jnp.ndarray,
                         train_pad: jnp.ndarray, test_pad: jnp.ndarray,
                         test_deg: jnp.ndarray, train_deg: jnp.ndarray,
                         valid: jnp.ndarray, topks, mesh: Mesh,
                         axis: str = "model", n_valid: int | None = None):
    """Full distributed evaluation batch: sharded scoring + distributed top-k
    + replicated metric sums + count-based AUC (communication: the k-candidate
    all-gather plus two [B, T]-sized psums — never the full score matrix).

    Same contract as ops.metrics.batch_metric_sums/batch_auc_sum, computed
    over a row-sharded item table.  AUC uses rank-by-counting: each shard
    counts its scores below each test positive's score; psum gives the global
    rank (tie handling: strictly-below counting, matching the single-device
    argsort version up to fp ties).
    """
    from tagrec_tpu.ops import metrics as M

    n_shards = mesh.shape[axis]
    i_total = item_emb.shape[0]
    assert i_total % n_shards == 0
    i_local = i_total // n_shards
    if n_valid is None:
        n_valid = i_total
    max_k = max(topks)

    def local_fn(u, i_shard, tp, te, td, trd, vl):
        shard_id = jax.lax.axis_index(axis)
        offset = shard_id * i_local
        b = u.shape[0]
        scores = jax.nn.sigmoid(u @ i_shard.T)                   # [B, I/s]
        col_ids = offset + jnp.arange(i_local)
        scores = jnp.where(col_ids[None, :] < n_valid, scores, -1024.0)
        local_cols = tp - offset
        rows = jnp.broadcast_to(jnp.arange(b)[:, None], tp.shape)
        in_shard = (local_cols >= 0) & (local_cols < i_local)
        cols = jnp.where(in_shard, local_cols, i_local)
        scores = scores.at[rows, cols].set(-1024.0, mode="drop")

        # ---- distributed top-k
        v, idx = jax.lax.top_k(scores, min(max_k, i_local))
        idx = idx + offset
        v_all = jax.lax.all_gather(v, axis, axis=1).reshape(b, -1)
        i_all = jax.lax.all_gather(idx, axis, axis=1).reshape(b, -1)
        mv, mi = jax.lax.top_k(v_all, max_k)
        topk_ids = jnp.take_along_axis(i_all, mi, axis=1)        # replicated

        # ---- ranking metrics (replicated compute, tiny)
        label = M.hit_labels(topk_ids, te)
        sums = M.batch_metric_sums(label, td, tuple(topks), vl)

        # ---- AUC by counting: positive scores via in-shard select + psum
        te_local = te - offset
        te_rows = jnp.broadcast_to(jnp.arange(b)[:, None], te.shape)
        te_in = (te >= 0) & (te_local >= 0) & (te_local < i_local)
        safe = jnp.where(te_in, te_local, 0)
        pos_local = scores[te_rows, safe] * te_in                # [B, T]
        pos_scores = jax.lax.psum(pos_local, axis)               # replicated
        # count of scores strictly below each positive, over valid cols only
        below = jnp.sum((scores[:, None, :] < pos_scores[:, :, None])
                        .astype(jnp.float32), axis=-1)
        below = jax.lax.psum(below, axis)                        # [B, T]
        pad_mask = (te >= 0).astype(jnp.float32)
        n_masked = trd.astype(jnp.float32)
        # masked cols (-1024) are strictly below positives; subtract them
        # (train positives + table padding)
        n_below_masked = n_masked + (i_total - n_valid)
        ranks = below - n_below_masked[:, None] + 1.0            # 1-based
        sum_pos = jnp.sum(ranks * pad_mask, axis=1)
        npos = td.astype(jnp.float32)
        nval = n_valid - n_masked
        nneg = jnp.maximum(nval - npos, 1.0)
        auc = (sum_pos - npos * (npos + 1.0) / 2.0) / (npos * nneg)
        sums["auc"] = jnp.sum(auc * vl.astype(jnp.float32))
        return sums

    specs_in = (P(), P(axis), P(), P(), P(), P(), P())
    out_spec = {"recall": P(), "precision": P(), "hr": P(), "ndcg": P(),
                "auc": P()}
    fn = _shard_map(local_fn, mesh, specs_in, out_spec)
    return fn(user_emb, item_emb, train_pad, test_pad, test_deg, train_deg,
              valid)


def shard_items(item_emb: jnp.ndarray, mesh: Mesh, axis: str = "model"):
    """Zero-pad the item table to a multiple of the axis size and device_put
    it row-sharded.  Returns (padded table, original length); pass the latter
    as ``n_valid`` so padding columns are masked out of the top-k."""
    n = mesh.shape[axis]
    i = item_emb.shape[0]
    pad = (-i) % n
    if pad:
        item_emb = jnp.concatenate(
            [item_emb, jnp.zeros((pad, item_emb.shape[1]),
                                 dtype=item_emb.dtype)], axis=0)
    return jax.device_put(item_emb, NamedSharding(mesh, P(axis))), i
