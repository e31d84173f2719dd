"""Sharding specs for pipelines: row-sharded tables, batch-sharded steps.

Maps each pytree in the training step to a ``NamedSharding`` over the
(data, model) mesh:

* embedding tables ([N, D]) -> rows over ``model`` (the TPU-native successor of
  the reference's monolithic nn.Parameter tables, model/lightgcn.py:39-42)
* ELL adjacency ([N, K] idx/val, [N] deg) -> rows over ``model``
* batches ([B, ...]) -> over ``data``
* dense weight matrices -> replicated

XLA turns the cross-shard embedding gathers into all-gathers over ICI and the
data-parallel gradient reduction into psums; nothing here calls a collective
explicitly (scaling-book recipe: pick mesh, annotate, let XLA insert).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharded(mesh: Mesh) -> NamedSharding:
    """Shard dim 0 over the model axis (tables, adjacency rows)."""
    return NamedSharding(mesh, P("model"))


def batch_sharded(mesh: Mesh) -> NamedSharding:
    """Shard dim 0 over the data axis (training batches, eval user blocks)."""
    return NamedSharding(mesh, P("data"))


def _shardable(x, mesh: Mesh) -> bool:
    """Row-shard only leaves big enough to matter whose leading dim divides
    the model axis (jax.device_put requires even sharding; uneven tables are
    replicated — pad tables to the axis size upstream to shard them)."""
    return (hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] >= 64
            and x.shape[0] % mesh.shape["model"] == 0)


def params_sharding(params: Any, mesh: Mesh) -> Any:
    """Row-shard embedding-sized leaves over `model`; replicate small ones."""
    def spec(x):
        return row_sharded(mesh) if _shardable(x, mesh) else replicated(mesh)
    return jax.tree_util.tree_map(spec, params)


def gdev_sharding(gdev: Any, mesh: Mesh) -> Any:
    """Shard device graph data (ELL tables etc.) by row over `model`."""
    def spec(x):
        return row_sharded(mesh) if _shardable(x, mesh) else replicated(mesh)
    return jax.tree_util.tree_map(spec, gdev)


def place(tree: Any, shardings: Any) -> Any:
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)


def constrain_params(params: Any, mesh: Mesh) -> Any:
    """with_sharding_constraint matching :func:`params_sharding` — used inside
    jit'd train steps to pin updated params to their row shardings (prevents
    GSPMD from drifting the layout across scan iterations)."""
    def c(x):
        spec = row_sharded(mesh) if _shardable(x, mesh) else replicated(mesh)
        return jax.lax.with_sharding_constraint(x, spec)
    return jax.tree_util.tree_map(c, params)


def constrain_batch(batch: Any, mesh: Mesh) -> Any:
    """Constrain batch-like leaves (leading dim divisible by the data axis) to
    the ``data`` axis; leave small/indivisible leaves replicated."""
    d = mesh.shape["data"]

    def c(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % d == 0 \
                and x.shape[0] > 0:
            return jax.lax.with_sharding_constraint(x, batch_sharded(mesh))
        return jax.lax.with_sharding_constraint(x, replicated(mesh))
    return jax.tree_util.tree_map(c, batch)
