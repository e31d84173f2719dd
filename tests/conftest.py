"""Test configuration: force CPU with 8 virtual devices (multi-chip simulation).

The image's sitecustomize pre-imports jax and registers the axon (TPU) PJRT
backend in every interpreter, and JAX_PLATFORMS=axon is latched into
jax.config at that import — so env vars alone are too late here.  We override
through jax.config before any backend is initialized.  (SURVEY.md §4: CPU
multi-device simulation is the fake-backend equivalent for testing sharding
logic without a TPU pod.)
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_enable_concurrency_optimized_scheduler" not in os.environ["XLA_FLAGS"]:
    # The CPU thunk executor's concurrency-optimized scheduler starts
    # INDEPENDENT collectives in different orders on different virtual
    # devices — a sharded program with both subgroup (mp-pair all-gather)
    # and global (collective-permute) collectives then deadlocks
    # nondeterministically (observed: disengcn --dp 4 --mp 2, device 5 in
    # the [4,5] all-gather while the rest sat in the 8-way permute until
    # the 40s rendezvous F-check aborted the process; 3/3 repros).  The
    # default scheduler keeps a consistent order (0 repros in 4 runs).
    # TPU runtimes order collectives on a dedicated stream, so this is a
    # CPU-simulation-only hazard.  (xla_cpu_use_thunk_runtime=false is
    # ignored in jaxlib 0.9 — the legacy runtime is gone.)
    os.environ["XLA_FLAGS"] += (
        " --xla_cpu_enable_concurrency_optimized_scheduler=false")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (full pipelines, parity runs)")


@pytest.fixture(scope="session")
def tiny_graph():
    """Small deterministic synthetic graph shared across tests."""
    from tagrec_tpu.data.synthetic import synthetic_graph

    return synthetic_graph(n_user=40, n_item=90, n_tag=25, avg_deg=8, seed=7)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
