"""Full-catalog top-k evaluation — the reference protocol, fully on device.

Reproduces Basic_test/epoch_test (training/basic_test.py:30-111): batch the
test users, score the full catalog, mask train positives to -1024, top-k,
recall/precision/HR/NDCG@topks + mean AUC, with optional cold-start user-group
breakdown (training/utils.py:58-109).  The reference's per-user sklearn AUC
loop and CPU metric pool are replaced by one jit'd kernel per user batch.
"""

from __future__ import annotations

import time
from collections import defaultdict
from functools import partial
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from tagrec_tpu.config import TrainConfig
from tagrec_tpu.data.graph import HeteroGraph
from tagrec_tpu.ops import metrics as M


class Evaluator:
    def __init__(self, graph: HeteroGraph, cfg: TrainConfig):
        self.cfg = cfg
        self.n_item = graph.n_item
        self.pos_ui = graph.user_items["train"]
        self.true_ui: Dict[str, Dict[int, List[int]]] = {}
        if cfg.has_val:
            self.true_ui["val"] = graph.user_items["val"]
        self.true_ui["test"] = graph.user_items["test"]

        n_user = graph.n_user
        # Padded train-positive table (pad = n_item -> dropped by the masking
        # scatter) and padded test table (pad = -1 -> never matches a top-k id).
        tr_deg = np.zeros(n_user, dtype=np.int32)
        for u, it in self.pos_ui.items():
            tr_deg[u] = len(it)
        p = max(int(tr_deg.max()), 1)
        train_pad = np.full((n_user, p), self.n_item, dtype=np.int32)
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

        self._batch_eval_cache = {}

    # ------------------------------------------------------------------ core
    def _batch_eval_fn(self, model):
        """Build the jit'd per-user-batch eval kernel.

        The padded positive tables flow as ARGUMENTS (not closures): jit
        constants get pathological layouts on TPU (~100x slower, measured on
        the adjacency tables)."""
        key = id(model)
        if key in self._batch_eval_cache:
            return self._batch_eval_cache[key]

        topks = tuple(self.cfg.topks)
        max_k = max(topks)

        @jax.jit
        def batch_eval(params, gdev, users, valid, tables):
            scores = model.predict(params, gdev, users)
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

        self._batch_eval_cache[key] = batch_eval
        return batch_eval

    def run(self, model, params, gdev, istest: bool = False,
            group_k: int = 0) -> Dict:
        """Evaluate; returns {metric: [per-k values]} (+ 'auc': [mean]).

        With group_k > 1, returns the per-group breakdown keyed like the
        reference: ``inter<{bound}-{n_users}`` (training/basic_test.py:102-107).
        """
        split = "val" if (not istest and self.cfg.has_val) else "test"
        true_ui = self.true_ui[split]

        if group_k > 1:
            groups = user_group_split(true_ui, self.pos_ui, group_k)
            out = {}
            for bound, users in groups.items():
                out[f"inter<{bound}-{len(users)}"] = self._eval_users(
                    model, params, gdev, split, users)
            return out
        return self._eval_users(model, params, gdev, split,
                                sorted(true_ui.keys()))

    def _eval_users(self, model, params, gdev, split: str,
                    users: List[int]) -> Dict:
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
            sums = fn(params, gdev, jnp.asarray(users_arr[i:i + bsz]),
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
