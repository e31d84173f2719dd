"""Serving: freeze a trained model into embedding tables + low-latency top-k.

The reference stops at ``predict_rating`` inside its evaluator
(training/basic_test.py:36-40) — scores are recomputed from the full model
graph on every eval.  A production deployment wants the opposite split:

* **export** (offline, once): run ONE forward pass, freeze the propagated
  user/item tables into a versioned artifact that is independent of the
  training graph, adjacency structures, and model code;
* **retrieve** (online, hot): one MXU matmul + train-positive masking +
  ``lax.top_k`` per request batch, jitted once with static shapes (request
  batches are padded to a fixed block so no query shape ever recompiles).

TPU-first: the single-chip query is one fused sigmoid(U_sel @ I^T) -> mask
-> top_k program; under a mesh the item table is row-sharded over ``model``
and the query routes through ``parallel.topk.distributed_masked_topk``
(local top-k per shard + all-gather merge — candidates ride ICI, never the
full score matrix).

Every model family exports uniformly because all seven share the
``forward -> (u_all, i_all/e_all, ...)`` + ``sigmoid(U @ I^T)`` predict
surface (model/lightgcn.py:84-89); KGAT's entity-wide table is handled by
the items-are-a-prefix convention (data/kgat_load.py, models/kgat.py:59-62).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

EXPORT_VERSION = 1
MASK_SCORE = -1024.0  # same train-positive sentinel as training/evaluate.py


# ----------------------------------------------------------------- export

def export_tables(model, params, gdev, *, n_item: Optional[int] = None):
    """One forward pass -> frozen (user, item) float32 tables.

    ``n_item`` trims entity-wide score tables (KGAT scores items+tags; items
    occupy the first ``n_item`` rows by the loader convention).
    """
    embs = model.forward(params, gdev, training=False)
    u_all = np.asarray(embs[0], dtype=np.float32)
    i_all = np.asarray(embs[1], dtype=np.float32)
    if n_item is not None:
        assert i_all.shape[0] >= n_item, (i_all.shape, n_item)
        i_all = i_all[:n_item]
    return u_all, i_all


def _norm_artifact_path(path: str) -> str:
    # np.savez appends '.npz' when the path lacks it; normalize here so the
    # meta sidecar and load_export always key off the same on-disk name.
    return path if path.endswith(".npz") else path + ".npz"


def save_export(path: str, user_table: np.ndarray, item_table: np.ndarray,
                *, model_name: str = "", train_pos=None, extra: dict = None):
    """Write the versioned serving artifact (.npz + sidecar meta json).

    ``train_pos``: optional {user: [item, ...]} dict frozen into the padded
    mask table so the retriever needs no graph object at load time.
    """
    path = _norm_artifact_path(path)
    arrays = {"user_table": user_table, "item_table": item_table}
    if train_pos is not None:
        pad, deg = _pad_positives(train_pos, user_table.shape[0])
        arrays["train_pad"] = pad
        arrays["train_deg"] = deg
    meta = {"version": EXPORT_VERSION, "model": model_name,
            "n_user": int(user_table.shape[0]),
            "n_item": int(item_table.shape[0]),
            "dim": int(user_table.shape[1])}
    meta.update(extra or {})
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **arrays)
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f, indent=2)
    return meta


def load_export(path: str):
    path = _norm_artifact_path(path)
    data = np.load(path)
    for key in ("user_table", "item_table"):
        if key not in data:
            raise ValueError(f"serving artifact {path!r} missing {key!r}")
    meta = {}
    if os.path.exists(path + ".meta.json"):
        meta = json.load(open(path + ".meta.json"))
        v = meta.get("version", -1)
        if v > EXPORT_VERSION:
            raise ValueError(
                f"artifact version {v} is newer than supported {EXPORT_VERSION}")
    return data, meta


def _pad_positives(pos: dict, n_user: int):
    deg = np.zeros(n_user, dtype=np.int32)
    for u, it in pos.items():
        deg[u] = len(it)
    p = max(int(deg.max()), 1)
    pad = np.full((n_user, p), 1 << 30, dtype=np.int32)  # OOB -> dropped
    for u, it in pos.items():
        pad[u, : len(it)] = it
    return pad, deg


# --------------------------------------------------------------- retriever

class Retriever:
    """Online top-k over frozen tables.

    ``topk(users, k)`` pads the request to ``block`` users (one compiled
    program per (block, k) pair, never per request size), scores, masks the
    users' train positives to MASK_SCORE (identical protocol to
    training/evaluate.py so served lists match eval lists exactly), and
    returns global item ids + sigmoid scores.

    With ``mesh=``, the item table is row-sharded over the ``model`` axis
    and queries run through ``distributed_masked_topk``.
    """

    def __init__(self, user_table, item_table, *, train_pad=None,
                 block: int = 256, mesh=None):
        self.n_user, self.dim = user_table.shape
        self.n_item = item_table.shape[0]
        self.block = block
        self.mesh = mesh
        self._U = jnp.asarray(user_table)
        if train_pad is None:
            train_pad = np.full((self.n_user, 1), 1 << 30, dtype=np.int32)
        self._train_pad = jnp.asarray(np.asarray(train_pad, dtype=np.int32))
        if mesh is not None:
            from tagrec_tpu.parallel import topk as ptopk

            self._I, self._n_valid = ptopk.shard_items(
                jnp.asarray(item_table), mesh)
        else:
            self._I = jnp.asarray(item_table)
        self._jitted = {}

    @classmethod
    def from_export(cls, path: str, **kw):
        data, _ = load_export(path)
        return cls(data["user_table"], data["item_table"],
                   train_pad=data.get("train_pad"), **kw)

    def _single_fn(self, k: int):
        def fn(U, I, users, tp):
            u = jnp.take(U, users, axis=0)               # [B, D]
            scores = jax.nn.sigmoid(u @ I.T)             # [B, I]
            b = users.shape[0]
            rows = jnp.broadcast_to(jnp.arange(b)[:, None], tp.shape)
            scores = scores.at[rows, tp].set(MASK_SCORE, mode="drop")
            return jax.lax.top_k(scores, k)
        return jax.jit(fn)

    def _mesh_fn(self, k: int):
        from tagrec_tpu.parallel import topk as ptopk

        mesh, n_valid = self.mesh, self._n_valid

        def fn(U, I, users, tp):
            u = jnp.take(U, users, axis=0)
            return ptopk.distributed_masked_topk(
                u, I, tp, k, mesh, n_valid=n_valid)
        return jax.jit(fn)

    def topk(self, users, k: int = 20):
        """-> (item ids [n, k] int32, scores [n, k] f32) for ``users``."""
        users = np.asarray(users, dtype=np.int32)
        n = users.shape[0]
        b = max(self.block, 1)
        padded = int(np.ceil(n / b)) * b
        uq = np.zeros(padded, dtype=np.int32)
        uq[:n] = users
        tp = jnp.take(self._train_pad, jnp.asarray(uq), axis=0)
        key = ("mesh" if self.mesh is not None else "single", k)
        if key not in self._jitted:
            self._jitted[key] = (self._mesh_fn(k) if self.mesh is not None
                                 else self._single_fn(k))
        v, ids = self._jitted[key](self._U, self._I, jnp.asarray(uq), tp)
        return (np.asarray(ids[:n], dtype=np.int32),
                np.asarray(v[:n], dtype=np.float32))


# --------------------------------------------------------------- CLI query

def main():
    import argparse

    ap = argparse.ArgumentParser(
        description="query a serving export: top-k items per user")
    ap.add_argument("--artifact", required=True, help="path to export .npz")
    ap.add_argument("--users", type=int, nargs="+", required=True)
    ap.add_argument("--k", type=int, default=20)
    args = ap.parse_args()
    r = Retriever.from_export(args.artifact)
    ids, scores = r.topk(args.users, args.k)
    for u, row_i, row_s in zip(args.users, ids, scores):
        print(json.dumps({"user": int(u), "items": row_i.tolist(),
                          "scores": [round(float(s), 5) for s in row_s]}))


if __name__ == "__main__":
    main()
