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
