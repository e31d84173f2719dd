"""Synthetic user-item-tag graph generator.

The hetrec2011 datasets are not bundled; this produces graphs with the same
statistical shape (power-law item popularity, per-user 80/20 train/test split,
tag assignments over train pairs — mirroring data/preprocess/preprocess.py
semantics) for tests and benchmarks.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from tagrec_tpu.data.graph import COO, HeteroGraph


def synthetic_graph_large(n_user: int, n_item: int, n_tag: int,
                          n_edges: int, tag_per_inter: float = 0.5,
                          seed: int = 0, test_frac: float = 0.2) -> HeteroGraph:
    """Fast vectorized generator for benchmark-scale graphs (hetrec-like:
    ~2k users x ~10k items x ~1e5-1e6 interactions with zipf popularity)."""
    rng = np.random.default_rng(seed)
    pop = 1.0 / (np.arange(1, n_item + 1) ** 0.8)
    cdf = np.cumsum(pop / pop.sum())
    # oversample then dedup (u, i) pairs
    m = int(n_edges * 1.3) + n_user
    u = rng.integers(0, n_user, m)
    i = np.searchsorted(cdf, rng.random(m)).clip(0, n_item - 1)
    pairs = np.unique(np.stack([u, i], axis=1), axis=0)
    if len(pairs) > n_edges:
        pairs = pairs[rng.choice(len(pairs), n_edges, replace=False)]
    # guarantee every user has >= 2 pairs
    cnt = np.bincount(pairs[:, 0], minlength=n_user)
    need = np.where(cnt < 2)[0]
    if len(need):
        extra = np.stack([np.repeat(need, 2),
                          rng.integers(0, n_item, 2 * len(need))], axis=1)
        pairs = np.unique(np.concatenate([pairs, extra]), axis=0)

    # per-user 80/20 split: mark a random test_frac of each user's pairs
    order = np.lexsort((pairs[:, 1], pairs[:, 0]))
    pairs = pairs[order]
    starts = np.searchsorted(pairs[:, 0], np.arange(n_user))
    r = rng.random(len(pairs))
    is_test = r < test_frac
    # force at least one train item per user: first pair of each user -> train
    is_test[starts[np.bincount(pairs[:, 0], minlength=n_user) > 0]] = False

    def to_dict(p):
        d = {}
        for u_, i_ in p:
            d.setdefault(int(u_), []).append(int(i_))
        return d

    user_items = {"train": to_dict(pairs[~is_test]),
                  "test": to_dict(pairs[is_test])}
    train_pairs = pairs[~is_test]
    num = {"user": n_user, "item": n_item, "tag": n_tag}
    ui_adj = COO.from_edges(train_pairs[:, 0], train_pairs[:, 1],
                            (n_user, n_item))
    # tag assignments over train pairs
    n_assign = int(len(train_pairs) * tag_per_inter) + n_tag
    sel = rng.integers(0, len(train_pairs), n_assign)
    tpop = 1.0 / (np.arange(1, n_tag + 1) ** 0.9)
    tcdf = np.cumsum(tpop / tpop.sum())
    tags = np.searchsorted(tcdf, rng.random(n_assign)).clip(0, n_tag - 1)
    tags[:n_tag] = np.arange(n_tag)  # dense tag id space
    uit = np.unique(np.stack([train_pairs[sel, 0], train_pairs[sel, 1], tags],
                             axis=1), axis=0)
    ut_adj = COO.from_edges(uit[:, 0], uit[:, 2], (n_user, n_tag))
    it_adj = COO.from_edges(uit[:, 1], uit[:, 2], (n_item, n_tag))
    num["weight"] = int(max(ui_adj.max(), ut_adj.max(), it_adj.max()))
    return HeteroGraph(num=num, user_items=user_items, ui_adj=ui_adj,
                       ut_adj=ut_adj, it_adj=it_adj, uit_data=uit)


def synthetic_graph(n_user: int = 300, n_item: int = 800, n_tag: int = 120,
                    avg_deg: int = 20, tag_per_inter: float = 1.5,
                    seed: int = 0, test_frac: float = 0.2) -> HeteroGraph:
    """Generate a HeteroGraph with zipf-ish item popularity.

    Every user gets >= 2 interactions so both splits are non-empty; the split is
    per-user random 80/20 (single-item users go to test), matching the
    preprocessing split rule (data/preprocess/help.py:99-112).
    """
    rng = np.random.default_rng(seed)
    # Power-law item popularity.
    pop = 1.0 / (np.arange(1, n_item + 1) ** 0.8)
    pop /= pop.sum()

    user_items: Dict[str, Dict[int, List[int]]] = {"train": {}, "test": {}}
    all_pairs = []
    for u in range(n_user):
        deg = max(2, int(rng.poisson(avg_deg)))
        items = rng.choice(n_item, size=min(deg, n_item), replace=False, p=pop)
        items = np.sort(items)
        k_test = max(1, int(round(len(items) * test_frac)))
        test_sel = rng.choice(len(items), size=k_test, replace=False)
        mask = np.zeros(len(items), dtype=bool)
        mask[test_sel] = True
        tr, te = items[~mask], items[mask]
        if len(tr) == 0:  # single-item users -> test only
            user_items["test"][u] = te.tolist()
            continue
        user_items["train"][u] = tr.tolist()
        user_items["test"][u] = te.tolist()
        for i in tr:
            all_pairs.append((u, i))

    num = {"user": n_user, "item": n_item, "tag": n_tag}
    pairs = np.asarray(all_pairs, dtype=np.int64)
    ui_adj = COO.from_edges(pairs[:, 0], pairs[:, 1], (n_user, n_item))

    # Tag assignments over train pairs (user_item_tag.txt semantics), with a
    # power-law tag distribution and occasional duplicates that accumulate into
    # interaction weights like the reference's to_sparse_adj (data/utils.py:50-53).
    tpop = 1.0 / (np.arange(1, n_tag + 1) ** 0.9)
    tpop /= tpop.sum()
    n_assign = int(len(pairs) * tag_per_inter)
    sel = rng.integers(0, len(pairs), size=n_assign)
    tags = rng.choice(n_tag, size=n_assign, p=tpop)
    uit = np.stack([pairs[sel, 0], pairs[sel, 1], tags], axis=1)
    uit = np.unique(uit, axis=0)
    # Ensure every tag id appears at least once (dense id space).
    missing = np.setdiff1d(np.arange(n_tag), np.unique(uit[:, 2]))
    if len(missing):
        sel = rng.integers(0, len(pairs), size=len(missing))
        fill = np.stack([pairs[sel, 0], pairs[sel, 1], missing], axis=1)
        uit = np.unique(np.concatenate([uit, fill]), axis=0)

    ut_adj = COO.from_edges(uit[:, 0], uit[:, 2], (n_user, n_tag))
    it_adj = COO.from_edges(uit[:, 1], uit[:, 2], (n_item, n_tag))
    num["weight"] = int(max(ui_adj.max(), ut_adj.max(), it_adj.max()))

    return HeteroGraph(num=num, user_items=user_items, ui_adj=ui_adj,
                       ut_adj=ut_adj, it_adj=it_adj, uit_data=uit)
