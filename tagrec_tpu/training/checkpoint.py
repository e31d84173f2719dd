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
import jax.numpy as jnp


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


# ---------------------------------------------------------------------------
# Sharded checkpoints (SURVEY §5: orbax-style per-shard save/restore).
#
# On a mesh, each PROCESS writes only its addressable shards (no host ever
# gathers a full row-sharded table), keyed by the shard's global index so
# restore re-assembles the global jax.Array via make_array_from_callback under
# the same (or a reshaped) mesh.  Single-host keeps working unchanged — it
# just writes every shard.  ``rotate`` keeps the newest k checkpoints.
# ---------------------------------------------------------------------------


def _index_key(idx) -> str:
    parts = []
    for sl in idx:
        start = sl.start if sl.start is not None else ""
        stop = sl.stop if sl.stop is not None else ""
        parts.append(f"{start}:{stop}")
    return ",".join(parts)


def save_sharded(ckpt_dir: str, tree: Any, step: int = 0,
                 rotate: int = 0) -> str:
    """Write this process's shards of a (possibly sharded) pytree.

    Layout: ``{ckpt_dir}/step_{step:08d}/proc_{p}.npz`` + ``meta.json``
    (treedef, global shapes, dtypes).  Returns the step directory.
    """
    leaves, treedef = _flatten(tree)
    step_dir = os.path.join(ckpt_dir, f"step_{step:08d}")
    tmp_dir = step_dir + f".tmp{jax.process_index()}"
    os.makedirs(tmp_dir, exist_ok=True)

    arrays = {}
    shapes, dtypes = [], []
    for i, leaf in enumerate(leaves):
        x = leaf if isinstance(leaf, jax.Array) else jnp.asarray(leaf)
        shapes.append(list(np.shape(x)))
        dtypes.append(str(x.dtype))
        seen = set()
        for shard in x.addressable_shards:
            key = _index_key(shard.index)
            if key in seen:  # replicated over some axis: write once
                continue
            seen.add(key)
            arrays[f"leaf_{i}|{key}"] = np.asarray(shard.data)
    np.savez(os.path.join(tmp_dir, f"proc_{jax.process_index()}"), **arrays)
    if jax.process_index() == 0:
        with open(os.path.join(tmp_dir, "meta.json"), "w") as f:
            json.dump({"treedef": str(treedef), "n_leaves": len(leaves),
                       "shapes": shapes, "dtypes": dtypes, "step": step}, f)
    if jax.process_count() > 1:
        # all procs must finish writing before any rename/rotation
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("tagrec_ckpt_save")
        # merge per-proc tmp dirs (shared filesystem assumed)
        if jax.process_index() == 0:
            os.makedirs(step_dir, exist_ok=True)
            base = step_dir + ".tmp"
            for p in range(jax.process_count()):
                src = base + str(p)
                if os.path.isdir(src):
                    for fn in os.listdir(src):
                        os.replace(os.path.join(src, fn),
                                   os.path.join(step_dir, fn))
                    os.rmdir(src)
    else:
        if os.path.exists(step_dir):
            # re-save of the same step (e.g. crash mid-rotation): replace the
            # stale dir rather than silently keeping it + leaking the tmp dir
            import shutil
            shutil.rmtree(step_dir)
        os.replace(tmp_dir, step_dir)
    if rotate > 0 and jax.process_index() == 0:
        # ".tmp" in d (not endswith): crashed-run leftovers are step_*.tmp{p}
        steps = sorted(d for d in os.listdir(ckpt_dir)
                       if d.startswith("step_") and ".tmp" not in d)
        for old in steps[:-rotate]:
            import shutil
            shutil.rmtree(os.path.join(ckpt_dir, old), ignore_errors=True)
    return step_dir


def latest_step_dir(ckpt_dir: str) -> str | None:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = sorted(d for d in os.listdir(ckpt_dir) if d.startswith("step_")
                   and ".tmp" not in d)
    return os.path.join(ckpt_dir, steps[-1]) if steps else None


def load_sharded(step_dir: str, like: Any, shardings: Any = None) -> Any:
    """Re-assemble a sharded checkpoint written by :func:`save_sharded`.

    ``shardings``: optional pytree of Shardings matching ``like`` — when given
    each leaf is built as a global jax.Array placed per its sharding, reading
    ONLY the blocks this process addresses; otherwise leaves are returned as
    full numpy arrays (single-host convenience).
    """
    with open(os.path.join(step_dir, "meta.json")) as f:
        meta = json.load(f)
    leaves, treedef = _flatten(like)
    if meta["treedef"] != str(treedef):
        raise ValueError(
            f"sharded checkpoint structure mismatch:\n  saved:    "
            f"{meta['treedef']}\n  expected: {treedef}")
    if meta["n_leaves"] != len(leaves):
        raise ValueError(f"{meta['n_leaves']} leaves saved, "
                         f"{len(leaves)} expected")

    # blocks from every proc file present (single-host: proc_0 only)
    blocks: dict = {}
    for fn in os.listdir(step_dir):
        if fn.startswith("proc_") and fn.endswith(".npz"):
            data = np.load(os.path.join(step_dir, fn))
            for k in data.files:
                blocks[k] = data[k]

    def _parse(key_suffix, shape):
        out = []
        for dim, p in zip(shape, key_suffix.split(",")):
            s, e = p.split(":")
            out.append((int(s) if s else 0, int(e) if e else dim))
        return out

    def get_block(i: int, index, shape):
        key = f"leaf_{i}|{_index_key(index)}"
        if key in blocks:
            return blocks[key]
        # General resharding: assemble the requested range from whatever
        # blocks were saved (the save-time layout need not match).
        want = _parse(_index_key(index), shape) if shape else []
        if not want:
            raise KeyError(f"missing shard {key} in {step_dir}")
        out = np.zeros([e - s for s, e in want],
                       dtype=np.dtype(meta["dtypes"][i]))
        covered = np.zeros(out.shape[0], dtype=bool)
        pref = f"leaf_{i}|"
        for k, b in blocks.items():
            if not k.startswith(pref):
                continue
            have = _parse(k[len(pref):], shape)
            # intersect ranges per dim
            inter = [(max(ws, hs), min(we, he))
                     for (ws, we), (hs, he) in zip(want, have)]
            if any(s >= e for s, e in inter):
                continue
            dst = tuple(slice(s - ws, e - ws)
                        for (s, e), (ws, _) in zip(inter, want))
            src = tuple(slice(s - hs, e - hs)
                        for (s, e), (hs, _) in zip(inter, have))
            out[dst] = b[src]
            covered[dst[0]] = True
        if not covered.all():
            raise KeyError(f"missing shard {key} in {step_dir} "
                           f"(requested range not covered by saved blocks)")
        return out

    out_leaves = []
    # None entries in the shardings tree mean "assemble on host" for that
    # leaf; treat them as leaves so alignment with `like` is preserved
    shard_leaves = (jax.tree_util.tree_leaves(
        shardings, is_leaf=lambda x: x is None)
        if shardings is not None else [None] * len(leaves))
    if len(shard_leaves) != len(leaves):
        raise ValueError(f"shardings tree has {len(shard_leaves)} leaves, "
                         f"like has {len(leaves)}")
    for i, (leaf, sh) in enumerate(zip(leaves, shard_leaves)):
        shape = tuple(meta["shapes"][i])
        want = tuple(np.shape(leaf))
        if shape != want:
            raise ValueError(f"leaf {i} shape {shape} != expected {want}")
        dtype = np.dtype(meta["dtypes"][i])
        if sh is None:
            # assemble full array on host
            full = np.zeros(shape, dtype=dtype)
            if shape == ():
                full = get_block(i, (), shape).reshape(())
            else:
                pref = f"leaf_{i}|"
                for k, b in blocks.items():
                    if not k.startswith(pref):
                        continue
                    idx = tuple(
                        slice(int(s) if s else None, int(e) if e else None)
                        for s, e in (p.split(":")
                                     for p in k[len(pref):].split(",")))
                    full[idx] = b
            out_leaves.append(full)
        else:
            arr = jax.make_array_from_callback(
                shape, sh, lambda index, i=i, shape=shape:
                get_block(i, index, shape))
            out_leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, out_leaves)
