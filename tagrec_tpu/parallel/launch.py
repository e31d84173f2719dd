"""Multi-host entry: jax.distributed init, process-spanning meshes, per-host
shard materialization, and the examples/s scaling harness hooks.

The reference is strictly single-process (SURVEY.md §2.8: no torch.distributed,
no NCCL/MPI).  On a TPU slice the runtime is SPMD multi-process: every host
runs this same program, `jax.distributed.initialize` wires the processes, and
one global (data, model) Mesh spans all chips.  Everything below is written so
the SAME code runs single-process (CI, the virtual CPU mesh) and multi-host:

* ``initialize()``        — idempotent jax.distributed bring-up (no-op when
                            single-process or already initialized)
* ``global_mesh(dp, mp)`` — Mesh over ALL devices across processes
* ``shard_bounds()``      — which global rows of a row-sharded table a given
                            process must materialize (per-host shard loading:
                            no host ever holds the full embedding table)
* ``materialize_row_sharded()`` — build a global jax.Array from per-host
                            blocks via make_array_from_callback

Tested by simulating the per-process shard math on the 8-device CPU mesh
(tests/test_launch.py) — the moral equivalent of a 2-host slice.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tagrec_tpu.parallel.mesh import make_mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bring up jax.distributed across hosts; safe to call unconditionally.

    Arguments default to the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) or TPU-pod auto-detection.  On a single
    process (no coordinator configured) this is a no-op.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return  # single-process run
    if jax.distributed.is_initialized():
        return  # idempotent: a second initialize() call is a no-op
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(data_parallel: Optional[int] = None,
                model_parallel: int = 1) -> Mesh:
    """(data, model) mesh over ALL devices (across processes).

    Device order follows jax.devices(), which JAX guarantees is consistent
    across processes; the factorization puts `model` innermost so model-axis
    collectives (embedding all-gathers) ride intra-host/ICI links and the
    data-axis gradient psum crosses DCN only once per step.
    """
    n = jax.device_count()
    if data_parallel is None:
        assert n % model_parallel == 0, (n, model_parallel)
        data_parallel = n // model_parallel
    assert data_parallel * model_parallel == n, (data_parallel,
                                                 model_parallel, n)
    return make_mesh(n, data_parallel=data_parallel)


def shard_bounds(n_rows: int, mesh: Mesh, axis: str = "model",
                 process_index: Optional[int] = None,
                 process_of: Optional[Callable] = None
                 ) -> List[Tuple[int, int]]:
    """Global [start, stop) row ranges of a row-sharded [n_rows, ...] table
    that ``process_index`` must materialize (its addressable shards).

    Rows must divide the axis size (pad upstream, parallel.topk.shard_items
    style).  Returns a sorted, de-duplicated range list — the per-host shard
    loader reads ONLY these rows from disk.

    ``process_of(device) -> int`` overrides the device→process mapping; used
    by the tests to simulate an N-host slice on the single-process CPU mesh.
    """
    if process_index is None:
        process_index = jax.process_index()
    if process_of is None:
        process_of = lambda d: d.process_index  # noqa: E731
    size = mesh.shape[axis]
    assert n_rows % size == 0, (n_rows, size)
    block = n_rows // size
    sharding = NamedSharding(mesh, P(axis))
    bounds = set()
    for d, idx in sharding.devices_indices_map((n_rows,)).items():
        if process_of(d) != process_index:
            continue
        sl = idx[0]
        start = sl.start or 0
        stop = sl.stop if sl.stop is not None else n_rows
        bounds.add((start, stop))
    out = sorted(bounds)
    for start, stop in out:
        assert (stop - start) % block == 0, (start, stop, block)
    return out


def materialize_row_sharded(global_shape: Tuple[int, ...], mesh: Mesh,
                            fill: Callable[[int, int], np.ndarray],
                            axis: str = "model",
                            dtype=np.float32) -> jax.Array:
    """Build a row-sharded global array from per-host blocks.

    ``fill(start, stop)`` returns rows [start, stop) — called ONLY for rows
    addressable by this process, so no host materializes the full table
    (SURVEY §2.8: row-sharded embedding tables over hosts).
    """
    sharding = NamedSharding(mesh, P(axis))

    def cb(index):
        sl = index[0]
        start = sl.start or 0
        stop = sl.stop if sl.stop is not None else global_shape[0]
        block = np.asarray(fill(start, stop), dtype=dtype)
        want = (stop - start,) + tuple(global_shape[1:])
        assert block.shape == want, (block.shape, want)
        return block

    return jax.make_array_from_callback(tuple(global_shape), sharding, cb)


def batch_bounds(global_batch: int, mesh: Mesh,
                 process_index: Optional[int] = None,
                 process_of: Optional[Callable] = None
                 ) -> List[Tuple[int, int]]:
    """Which rows of a data-sharded [global_batch, ...] batch this process
    feeds — the per-host slice of the global batch (each host samples/loads
    only its share)."""
    return shard_bounds(global_batch, mesh, axis="data",
                        process_index=process_index, process_of=process_of)


def _host_sync(result) -> float:
    """Force a real device→host transfer on ``result`` (sum of every float
    leaf).  block_until_ready alone can return before execution through the
    TPU tunnel, and identical-input repeat calls pipeline into fantasy
    numbers (CLAUDE.md / DESIGN.md timing trap) — a host transfer of the
    result is the only sync this repo trusts."""
    import jax.numpy as jnp

    tot = 0.0
    for leaf in jax.tree_util.tree_leaves(result):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            tot += float(jnp.sum(leaf))
    assert np.isfinite(tot), "non-finite step result in scaling_report"
    return tot


def scaling_report(step_fn, args_fn, mesh_sizes: List[int], batch,
                   reps: int = 3, weak: bool = False) -> Dict[int, float]:
    """Examples/s over increasing mesh sizes (the BASELINE.json ≥85% 1→N
    scaling harness).

    ``args_fn(mesh, rep)`` builds placed step inputs for repetition ``rep``
    (vary them per rep — identical-input repeats pipeline on TPU; a 1-arg
    ``args_fn(mesh)`` is still accepted and reused across reps);
    ``step_fn(*args)`` runs one jit'd step and returns a pytree whose float
    leaves are summed to the host after EVERY rep — the per-rep host
    transfer is what makes the timing real (see ``_host_sync``).

    ``batch``: global examples per step — an int (strong scaling: fixed
    global batch) or a callable ``batch(n) -> int`` (weak scaling: caller
    grows the batch with the mesh, e.g. ``lambda n: 512 * n``).  ``weak``
    is a convenience for ``batch(n) = batch * n`` with an int batch.

    On the virtual CPU mesh this validates the harness and sharding math
    (devices share physical cores, so the efficiency NUMBER is meaningless
    there); on a real slice it produces the scaling deliverable."""
    import inspect
    import time

    batch_of = batch if callable(batch) else (
        (lambda n: batch * n) if weak else (lambda n: batch))
    takes_rep = len(inspect.signature(args_fn).parameters) >= 2

    out = {}
    for n in mesh_sizes:
        mesh = make_mesh(n)
        per_rep_args = [args_fn(mesh, r) if takes_rep else None
                        for r in range(reps)]
        shared = None if takes_rep else args_fn(mesh)
        # warmup/compile with rep-0 inputs, fully synced
        _host_sync(step_fn(*(per_rep_args[0] if takes_rep else shared)))
        t0 = time.perf_counter()
        for r in range(reps):
            res = step_fn(*(per_rep_args[r] if takes_rep else shared))
            _host_sync(res)  # per-rep host transfer: no pipelining
        dt = (time.perf_counter() - t0) / reps
        out[n] = batch_of(n) / dt
    return out
