"""Ranking metrics — on-device (jnp) kernels + numpy oracles.

Device functions reproduce the reference evaluation protocol
(training/basic_test.py:30-80, training/utils.py:7-45) entirely on device:
mask train positives to -1024, top-k, hit labels, recall/precision/HR/NDCG@k
sums, and exact rank-based AUC (equivalent to sklearn.roc_auc_score without
tie-averaging; sigmoid scores make exact fp32 ties measure-zero).

The numpy `ref_*` oracles re-derive the reference's metric algebra for golden
tests.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

MASK_VALUE = -1024.0  # -(1 << 10), training/basic_test.py:47


def mask_train_positives(scores: jnp.ndarray, train_pad: jnp.ndarray) -> jnp.ndarray:
    """Set scores of train positives to -1024.

    train_pad: [B, P] padded with an out-of-range column id (>= n_item), which
    `.at[].set(mode='drop')` discards.
    """
    b = scores.shape[0]
    rows = jnp.broadcast_to(jnp.arange(b)[:, None], train_pad.shape)
    return scores.at[rows, train_pad].set(MASK_VALUE, mode="drop")


def hit_labels(topk_ids: jnp.ndarray, test_pad: jnp.ndarray) -> jnp.ndarray:
    """[B, K] float — 1 where the ranked item is a test positive
    (training/utils.py:7-12 ``get_label``).  test_pad padded with -1."""
    eq = topk_ids[:, :, None] == test_pad[:, None, :]
    return jnp.any(eq, axis=-1).astype(jnp.float32)


def batch_metric_sums(label: jnp.ndarray, test_deg: jnp.ndarray,
                      topks: Sequence[int], valid: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Per-batch metric *sums* over users for each k (divide by n_users later).

    Mirrors training/utils.py:15-35: recall = right/|test|, precision =
    right/k, hr = 1[right>0], binary-relevance NDCG.  ``valid`` masks padded
    users in the final (short) eval batch.
    """
    out: Dict[str, jnp.ndarray] = {}
    vf = valid.astype(jnp.float32)
    denom = jnp.maximum(test_deg.astype(jnp.float32), 1.0)
    max_k = label.shape[1]
    discounts = 1.0 / jnp.log2(jnp.arange(2, max_k + 2, dtype=jnp.float32))
    rec, pre, hr, ndcg = [], [], [], []
    for k in topks:
        right = jnp.sum(label[:, :k], axis=1)
        rec.append(jnp.sum(right / denom * vf))
        pre.append(jnp.sum(right * vf) / k)
        hr.append(jnp.sum((right > 0).astype(jnp.float32) * vf))
        # ideal gain: first min(k, |test|) slots are 1
        length = jnp.minimum(test_deg, k)[:, None]
        g_true = (jnp.arange(k)[None, :] < length).astype(jnp.float32)
        idcg = jnp.sum(g_true * discounts[None, :k], axis=1)
        dcg = jnp.sum(label[:, :k] * discounts[None, :k], axis=1)
        idcg = jnp.where(idcg == 0.0, 1.0, idcg)
        ndcg.append(jnp.sum(dcg / idcg * vf))
    out["recall"] = jnp.stack(rec)
    out["precision"] = jnp.stack(pre)
    out["hr"] = jnp.stack(hr)
    out["ndcg"] = jnp.stack(ndcg)
    return out


def batch_auc_sum(masked_scores: jnp.ndarray, test_pad: jnp.ndarray,
                  test_deg: jnp.ndarray, train_deg: jnp.ndarray,
                  valid: jnp.ndarray) -> jnp.ndarray:
    """Sum over users of exact rank-based ROC AUC over un-masked items.

    Equivalent to the reference's per-user sklearn AUC (training/utils.py:37-45):
    positives = test items, candidate pool = all items minus masked train
    positives.  Masked scores (-1024) sort strictly below all sigmoid scores,
    so the rank of a valid item among valid items = global_rank - n_masked.
    """
    n_items = masked_scores.shape[1]
    order = jnp.argsort(masked_scores, axis=1)            # ascending
    ranks = jnp.argsort(order, axis=1).astype(jnp.float32) + 1.0  # 1-based
    # gather ranks of test positives (pad -1 -> clip to 0, masked out below)
    safe_pad = jnp.clip(test_pad, 0, n_items - 1)
    pos_ranks = jnp.take_along_axis(ranks, safe_pad, axis=1)
    pad_mask = (test_pad >= 0).astype(jnp.float32)
    n_masked = train_deg.astype(jnp.float32)
    sum_pos = jnp.sum((pos_ranks - n_masked[:, None]) * pad_mask, axis=1)
    npos = test_deg.astype(jnp.float32)
    nvalid = n_items - n_masked
    nneg = jnp.maximum(nvalid - npos, 1.0)
    auc = (sum_pos - npos * (npos + 1.0) / 2.0) / (npos * nneg)
    return jnp.sum(auc * valid.astype(jnp.float32))


# ---------------------------------------------------------------------------
# numpy oracles — direct re-derivation of the reference metric algebra, used
# as golden references in tests (never in the hot path).
# ---------------------------------------------------------------------------

def ref_get_label(true_ui: List[List[int]], rating: np.ndarray) -> np.ndarray:
    label_list = []
    for i in range(len(rating)):
        label_list.append([x in true_ui[i] for x in rating[i]])
    return np.array(label_list, dtype=np.float32)


def ref_pre_rec_k(label: np.ndarray, true_ui: List[List[int]], k: int):
    right = label[:, :k].sum(1)
    pre = np.sum(right) / k
    true_r = np.array([len(t) for t in true_ui])
    rec = np.sum(right / true_r)
    hit = np.sum(right > 0)
    return {"recall": rec, "precision": pre, "hr": hit}


def ref_ndcg_k(label: np.ndarray, true_ui: List[List[int]], k: int) -> float:
    right = label[:, :k]
    g_true = np.zeros((len(true_ui), k))
    for i, t in enumerate(true_ui):
        g_true[i, : min(k, len(t))] = 1
    disc = np.log2(np.arange(2, k + 2))
    idcg = np.sum(g_true / disc, axis=1)
    dcg = np.sum(right / disc, axis=1)
    idcg[idcg == 0.0] = 1.0
    ndcg = dcg / idcg
    return float(np.sum(np.nan_to_num(ndcg)))


def ref_auc(all_item_scores: np.ndarray, num_item: int,
            test_data: List[int]) -> float:
    from sklearn.metrics import roc_auc_score

    r_all = np.zeros((num_item,))
    r_all[test_data] = 1
    r = r_all[all_item_scores >= 0]
    s = all_item_scores[all_item_scores >= 0]
    return float(roc_auc_score(r, s))
