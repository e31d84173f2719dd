"""Full-catalog top-k evaluation — the reference protocol, fully on device.

Reproduces Basic_test/epoch_test (training/basic_test.py:30-111): batch the
test users, score the full catalog, mask train positives to -1024, top-k,
recall/precision/HR/NDCG@topks + mean AUC, with optional cold-start user-group
breakdown (training/utils.py:58-109).  The reference's per-user sklearn AUC
loop and CPU metric pool are replaced by one jit'd kernel per user batch.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from tagrec_tpu.config import TrainConfig
from tagrec_tpu.data.graph import HeteroGraph
from tagrec_tpu.ops import metrics as M


class Evaluator:
    """``mesh``: optional (data, model) Mesh — when given, scoring runs
    distributed: the item/entity embedding table is row-sharded over the
    ``model`` axis and each user batch goes through
    parallel.topk.sharded_eval_metrics (per-shard scoring + top-k merge +
    count-based AUC) instead of the dense single-device kernel."""

    def __init__(self, graph: HeteroGraph, cfg: TrainConfig, mesh=None):
        self.cfg = cfg
        self.mesh = mesh
        self.n_item = graph.n_item
        self.pos_ui = graph.user_items["train"]
        self.true_ui: Dict[str, Dict[int, List[int]]] = {}
        if cfg.has_val:
            self.true_ui["val"] = graph.user_items["val"]
        self.true_ui["test"] = graph.user_items["test"]

        n_user = graph.n_user
        # Padded train-positive table (pad = 2^30, out of range for ANY score
        # width -> dropped by the masking scatter even when a model scores
        # the full entity table, e.g. KGAT's items+tags) and padded test
        # table (pad = -1 -> never matches a top-k id).
        tr_deg = np.zeros(n_user, dtype=np.int32)
        for u, it in self.pos_ui.items():
            tr_deg[u] = len(it)
        p = max(int(tr_deg.max()), 1)
        train_pad = np.full((n_user, p), 1 << 30, dtype=np.int32)
        for u, it in self.pos_ui.items():
            train_pad[u, : len(it)] = it
        self._train_pad = jnp.asarray(train_pad)
        self._train_deg = jnp.asarray(tr_deg)

        self._test_pad: Dict[str, jnp.ndarray] = {}
        self._test_deg: Dict[str, jnp.ndarray] = {}
        for split, tui in self.true_ui.items():
            te_deg = np.zeros(n_user, dtype=np.int32)
            for u, it in tui.items():
                te_deg[u] = len(it)
            t = max(int(te_deg.max()), 1)
            pad = np.full((n_user, t), -1, dtype=np.int32)
            for u, it in tui.items():
                pad[u, : len(it)] = it
            self._test_pad[split] = jnp.asarray(pad)
            self._test_deg[split] = jnp.asarray(te_deg)

        # Keyed by weak model reference: id(model) would alias a NEW model to
        # a dead model's jitted closure after GC reuses the id (the closure
        # captures model.forward).  WeakKeyDictionary entries die with the
        # model instead.
        import weakref
        self._batch_eval_cache = weakref.WeakKeyDictionary()
        self._forward_cache = weakref.WeakKeyDictionary()
        self._sharded_eval_cache: Dict[int, object] = {}  # n_valid -> fn

    # ------------------------------------------------------------------ core
    def _forward_fn(self, model):
        """jit'd whole-graph forward — run ONCE per eval pass.

        The reference recomputes the full propagation inside every 512-user
        predict_rating call (training/basic_test.py:36-40, model/lightgcn.py:84-89);
        embeddings are batch-independent, so hoisting the forward out of the
        user-batch loop changes nothing numerically and cuts eval cost by
        ~n_batches x on the propagation-heavy models (DGCF/TGCN)."""
        if model not in self._forward_cache:
            @jax.jit
            def fwd(params, gdev):
                embs = model.forward(params, gdev, training=False)
                return embs[0], embs[1]

            self._forward_cache[model] = fwd
        return self._forward_cache[model]

    def _batch_eval_fn(self, model):
        """Build the jit'd per-user-batch eval kernel over precomputed
        embeddings (sigmoid(U_sel @ I^T) scoring, the shared predict surface).

        The padded positive tables flow as ARGUMENTS (not closures): jit
        constants get pathological layouts on TPU (~100x slower, measured on
        the adjacency tables)."""
        if model in self._batch_eval_cache:
            return self._batch_eval_cache[model]

        topks = tuple(self.cfg.topks)
        max_k = max(topks)

        @jax.jit
        def batch_eval(u_all, i_all, users, valid, tables):
            scores = jax.nn.sigmoid(jnp.take(u_all, users, axis=0) @ i_all.T)
            tp = jnp.take(tables["train_pad"], users, axis=0)
            masked = M.mask_train_positives(scores, tp)
            _, topk_ids = jax.lax.top_k(masked, max_k)
            te = jnp.take(tables["test_pad"], users, axis=0)
            td = jnp.take(tables["test_deg"], users, axis=0)
            label = M.hit_labels(topk_ids, te)
            sums = M.batch_metric_sums(label, td, topks, valid)
            sums["auc"] = M.batch_auc_sum(
                masked, te, td, jnp.take(tables["train_deg"], users, axis=0),
                valid)
            return sums

        self._batch_eval_cache[model] = batch_eval
        return batch_eval

    def _sharded_batch_eval_fn(self, n_valid: int):
        """Distributed per-user-batch eval kernel (mesh mode): sharded scoring
        + distributed top-k + count-based AUC via parallel.topk."""
        if n_valid in self._sharded_eval_cache:
            return self._sharded_eval_cache[n_valid]

        from tagrec_tpu.parallel import topk as ptopk

        topks = tuple(self.cfg.topks)
        mesh = self.mesh

        @jax.jit
        def batch_eval(u_all, i_shard, users, valid, tables):
            u_sel = jnp.take(u_all, users, axis=0)
            tp = jnp.take(tables["train_pad"], users, axis=0)
            te = jnp.take(tables["test_pad"], users, axis=0)
            td = jnp.take(tables["test_deg"], users, axis=0)
            trd = jnp.take(tables["train_deg"], users, axis=0)
            return ptopk.sharded_eval_metrics(
                u_sel, i_shard, tp, te, td, trd, valid, topks, mesh,
                n_valid=n_valid)

        self._sharded_eval_cache[n_valid] = batch_eval
        return batch_eval

    def run(self, model, params, gdev, istest: bool = False,
            group_k: int = 0) -> Dict:
        """Evaluate; returns {metric: [per-k values]} (+ 'auc': [mean]).

        With group_k > 1, returns the per-group breakdown keyed like the
        reference: ``inter<{bound}-{n_users}`` (training/basic_test.py:102-107).
        """
        split = "val" if (not istest and self.cfg.has_val) else "test"
        true_ui = self.true_ui[split]
        # ONE whole-graph forward per eval pass (shared across user batches
        # and group buckets); scoring is per batch.
        u_all, i_all = self._forward_fn(model)(params, gdev)
        n_valid = None
        if self.mesh is not None:
            from tagrec_tpu.parallel import topk as ptopk
            i_all, n_valid = ptopk.shard_items(i_all, self.mesh)

        if group_k > 1:
            groups = user_group_split(true_ui, self.pos_ui, group_k)
            out = {}
            for bound, users in groups.items():
                out[f"inter<{bound}-{len(users)}"] = self._eval_users(
                    model, u_all, i_all, split, users, n_valid)
            return out
        return self._eval_users(model, u_all, i_all, split,
                                sorted(true_ui.keys()), n_valid)

    def _eval_users(self, model, u_all, i_all, split: str,
                    users: List[int], n_valid: Optional[int] = None) -> Dict:
        if self.mesh is not None:
            fn = self._sharded_batch_eval_fn(n_valid)
        else:
            fn = self._batch_eval_fn(model)
        tables = {"train_pad": self._train_pad, "train_deg": self._train_deg,
                  "test_pad": self._test_pad[split],
                  "test_deg": self._test_deg[split]}
        bsz = self.cfg.test_batch
        n = len(users)
        n_pad = ((n + bsz - 1) // bsz) * bsz
        users_arr = np.zeros(n_pad, dtype=np.int32)
        users_arr[:n] = np.asarray(users, dtype=np.int32)
        valid = np.zeros(n_pad, dtype=np.int32)
        valid[:n] = 1

        acc = None
        for i in range(0, n_pad, bsz):
            sums = fn(u_all, i_all, jnp.asarray(users_arr[i:i + bsz]),
                      jnp.asarray(valid[i:i + bsz]), tables)
            sums = jax.tree_util.tree_map(np.asarray, sums)
            acc = sums if acc is None else jax.tree_util.tree_map(
                np.add, acc, sums)

        result = {k: list(np.asarray(v, dtype=np.float64) / n)
                  for k, v in acc.items() if k != "auc"}
        result["auc"] = [float(acc["auc"] / n)]
        return result


def user_group_split(test_ui: Dict[int, List[int]], train_ui: Dict[int, List[int]],
                     k: int, method: str = "interaction") -> Dict[int, List[int]]:
    """Cold-start user-group bucketing (training/utils.py:58-109).

    Groups test users by total (train+test) interaction count into k buckets,
    with the reference's four strategies: by total interactions (default,
    NGCF-style), by user count, by degree interval, by distinct-degree count.
    """
    all_user = list(test_ui.keys())
    num_inter: Dict[int, List[int]] = defaultdict(list)
    tot_inter = 0
    for u in all_user:
        n = len(test_ui[u]) + (len(train_ui[u]) if u in train_ui else 0)
        num_inter[n].append(u)
        tot_inter += n

    def by_interaction(tot: int, f: int) -> Dict[int, List[int]]:
        split_users: Dict[int, List[int]] = {}
        step = tot // k
        end = list(range(step, tot + 1, step))
        end[-1] = tot
        count, i, temp = 0, 0, []
        for n in sorted(num_inter):
            temp += num_inter[n]
            if f == 0:
                count += n * len(num_inter[n])
            elif f == 1:
                count += len(num_inter[n])
            elif f == 2:
                count = n
            else:
                count += 1
            if i < len(end) and count >= end[i]:
                split_users[n] = temp
                temp = []
                i += 1
        return split_users

    if method == "interaction":
        return by_interaction(tot_inter, 0)
    if method == "user":
        return by_interaction(len(all_user), 1)
    if method == "interval":
        return by_interaction(max(num_inter.keys()), 2)
    return by_interaction(len(num_inter.keys()), 3)
