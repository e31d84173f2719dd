"""Multi-host scaffolding: per-process shard math simulated on the CPU mesh
(2 virtual hosts x 4 devices), per-host materialization, scaling harness.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tagrec_tpu.parallel import launch
from tagrec_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return make_mesh(8, data_parallel=4)  # (data=4, model=2)


def _two_hosts(d):
    """Simulate 2 hosts x 4 devices over the 8 CPU devices."""
    return d.id // 4


def test_shard_bounds_partition_rows(mesh8):
    """Across the simulated 2 processes, model-axis shard bounds must cover
    every row exactly once per data-replica group."""
    n_rows = 64
    all_ranges = []
    for p in (0, 1):
        rs = launch.shard_bounds(n_rows, mesh8, axis="model",
                                 process_index=p, process_of=_two_hosts)
        for s, e in rs:
            assert 0 <= s < e <= n_rows
        all_ranges.append(rs)
    # union over processes covers all rows
    covered = np.zeros(n_rows, bool)
    for rs in all_ranges:
        for s, e in rs:
            covered[s:e] = True
    assert covered.all()
    # block size = n_rows / model-axis size
    block = n_rows // mesh8.shape["model"]
    for rs in all_ranges:
        for s, e in rs:
            assert (e - s) % block == 0


def test_batch_bounds_disjoint_across_hosts(mesh8):
    """Data-axis bounds across simulated hosts partition the global batch."""
    b = 32
    r0 = launch.batch_bounds(b, mesh8, process_index=0, process_of=_two_hosts)
    r1 = launch.batch_bounds(b, mesh8, process_index=1, process_of=_two_hosts)
    rows0 = set()
    rows1 = set()
    for s, e in r0:
        rows0.update(range(s, e))
    for s, e in r1:
        rows1.update(range(s, e))
    assert rows0.isdisjoint(rows1)
    assert rows0 | rows1 == set(range(b))


def test_materialize_row_sharded_matches_reference(mesh8):
    """make_array_from_callback assembly == the full table, correctly sharded;
    fill() is called only with block-aligned ranges."""
    n, d = 48, 8
    ref = np.arange(n * d, dtype=np.float32).reshape(n, d)
    calls = []

    def fill(s, e):
        calls.append((s, e))
        return ref[s:e]

    arr = launch.materialize_row_sharded((n, d), mesh8, fill, axis="model")
    np.testing.assert_array_equal(np.asarray(arr), ref)
    block = n // mesh8.shape["model"]
    for s, e in calls:
        assert s % block == 0 and (e - s) == block
    # sharded over the model axis
    assert arr.sharding.spec == jax.sharding.PartitionSpec("model")


def test_initialize_single_process_noop(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    launch.initialize()  # must not raise or try to contact a coordinator


def test_scaling_report_runs():
    """Harness sanity on the virtual mesh: returns examples/s per mesh size
    (the real ≥85% 1→N number requires hardware; this validates the math).

    Shard-math invariant: the SAME (rep-seeded) inputs sharded over dp=1/2/4
    must produce the identical step result — data parallelism may not change
    the computed value."""
    from tagrec_tpu.parallel import sharding as shd

    batch = 64
    results = {}

    def make_args_fn(n):
        def args_fn(mesh, rep):
            # inputs vary per rep (anti-pipelining) but NOT per mesh size,
            # so cross-mesh results are comparable
            x = jax.random.normal(jax.random.PRNGKey(rep), (batch, 32))
            w = jnp.ones((32, 32), jnp.float32)
            x = jax.device_put(x, shd.batch_sharded(mesh))
            w = jax.device_put(w, shd.replicated(mesh))
            results.setdefault(rep, {})[n] = float(
                jnp.sum(jax.nn.relu(x @ w)))
            return x, w
        return args_fn

    @jax.jit
    def step(x, w):
        return jnp.sum(jax.nn.relu(x @ w))

    out = {}
    for n in (1, 2, 4):
        out.update(launch.scaling_report(step, make_args_fn(n), [n], batch,
                                         reps=2))
    assert set(out) == {1, 2, 4}
    assert all(v > 0 for v in out.values())
    for rep, per_mesh in results.items():
        vals = list(per_mesh.values())
        np.testing.assert_allclose(vals, vals[0], rtol=1e-5)

    # weak-scaling mode: examples/s is computed against batch * n
    def args_fn1(mesh, rep):
        x = jnp.full((batch, 32), 1.0 + rep, jnp.float32)
        return (jax.device_put(x, shd.batch_sharded(mesh)),
                jax.device_put(jnp.ones((32, 32)), shd.replicated(mesh)))

    w1 = launch.scaling_report(step, args_fn1, [2], batch, reps=2, weak=True)
    s1 = launch.scaling_report(step, args_fn1, [2], batch, reps=2)
    assert w1[2] > 0 and s1[2] > 0  # weak mode credits batch * n examples
