"""File readers for the reference dataset formats.

Formats (reference data/utils.py:9-46):

* interaction files (``train.txt``/``test.txt``/``val.txt``): one line per user,
  ``u i1 i2 ...``; duplicate items within a line and duplicate user lines are
  merged (set semantics).
* triple files (``user_item_tag.txt``, ``kg_final.txt``): whitespace-separated
  integer triples, duplicate rows removed.

A fast C++ reader (tagrec_tpu/runtime) is used automatically when the native
extension is built; these pure-Python readers are the always-available fallback
and the oracle for the native ones.
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np


def read_interaction_file(path: str) -> Dict[int, List[int]]:
    """Parse ``u i1 i2 ...`` lines into {user: sorted unique item list}.

    Mirrors reference semantics (data/utils.py:23-46): duplicate items within a
    user are dropped, repeated user lines are merged.  Unlike the reference we
    sort each item list so downstream structures are deterministic.
    """
    u_items: Dict[int, set] = {}
    with open(path, "r") as f:
        for line in f:
            parts = line.strip().split()
            if not parts:
                continue
            u = int(parts[0])
            items = {int(x) for x in parts[1:]}
            if not items:
                continue
            if u in u_items:
                u_items[u] |= items
            else:
                u_items[u] = items
    return {u: sorted(s) for u, s in u_items.items()}


def read_triple_file(path: str) -> np.ndarray:
    """Read whitespace-separated integer triples, dedup rows (data/utils.py:9-20)."""
    data = np.loadtxt(path, dtype=np.int64)
    if data.ndim == 1:
        data = data[None, :]
    return np.unique(data, axis=0)


def interactions_to_edges(u_items: Dict[int, List[int]]) -> np.ndarray:
    """Flatten a {user: items} dict into an [E, 2] edge array (data/utils.py:121-129)."""
    users, items = [], []
    for u in sorted(u_items):
        its = u_items[u]
        users.extend([u] * len(its))
        items.extend(its)
    if not users:
        return np.zeros((0, 2), dtype=np.int64)
    return np.stack([np.asarray(users, dtype=np.int64),
                     np.asarray(items, dtype=np.int64)], axis=1)


def dataset_dir(data_root: str, dataset: str) -> str:
    return os.path.join(data_root, dataset)
