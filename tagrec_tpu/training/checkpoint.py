"""Parameter checkpointing.

The reference saves best-metric state_dicts only (training/early_stop.py:33,
no optimizer state, no resume).  Here checkpoints capture an arbitrary pytree
(params, optionally opt_state + step) as a flat .npz, which is
host-architecture portable and dependency-free; ``save_train_state``/
``restore_train_state`` add full resume capability the reference lacks
(SURVEY.md §5 checkpoint/resume).
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np
import jax


def _flatten(tree: Any):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def save(path: str, tree: Any) -> None:
    """Save a pytree of arrays to ``path`` (.npz) + a structure sidecar."""
    leaves, treedef = _flatten(tree)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    np.savez(path, **arrays)
    with open(path + ".tree", "w") as f:
        json.dump({"treedef": str(treedef), "n_leaves": len(leaves)}, f)


def load(path: str, like: Any) -> Any:
    """Load arrays saved by :func:`save` into the structure of ``like``.

    Validates the tree structure (via the .tree sidecar) and every leaf shape
    against ``like`` so mismatches fail with a clear message instead of a
    cryptic unflatten/broadcast error downstream."""
    npz_path = path if path.endswith(".npz") else path + ".npz"
    data = np.load(npz_path)
    leaves, treedef = _flatten(like)
    # save() writes the sidecar at the pre-savez path + ".tree"
    sidecar = next((p for p in (path + ".tree", npz_path + ".tree")
                    if os.path.exists(p)), None)
    if sidecar is not None:
        with open(sidecar) as f:
            meta = json.load(f)
        if meta.get("treedef") != str(treedef):
            raise ValueError(
                f"checkpoint structure mismatch for {path}:\n"
                f"  saved:    {meta.get('treedef')}\n"
                f"  expected: {treedef}")
    if len(leaves) != len(data.files):
        raise ValueError(
            f"checkpoint has {len(data.files)} leaves, expected {len(leaves)}")
    new_leaves = []
    for i, like_leaf in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        want = tuple(np.shape(like_leaf))
        if tuple(arr.shape) != want:
            raise ValueError(
                f"checkpoint leaf {i} shape {arr.shape} != expected {want}")
        new_leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_train_state(path: str, params: Any, opt_state: Any, step: int) -> None:
    save(path, {"params": params, "opt_state": opt_state,
                "step": np.asarray(step)})


def restore_train_state(path: str, like_params: Any, like_opt_state: Any):
    state = load(path, {"params": like_params, "opt_state": like_opt_state,
                        "step": np.asarray(0)})
    return state["params"], state["opt_state"], int(state["step"])
