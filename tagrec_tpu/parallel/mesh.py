"""Device mesh construction — the one source of placement truth.

The reference places everything on a single ``CFG['device']``
(utility/utils.py:57).  Here placement is a ``jax.sharding.Mesh`` with two
named axes:

* ``data``  — batch-parallel axis: BPR/TransE batches are split here; gradient
  psums ride ICI (inserted by XLA from the sharding constraints).
* ``model`` — node-parallel axis: embedding-table rows and adjacency row-blocks
  are sharded here (the true-parallel successor of the reference's sequential
  ``split_adj_k`` row folds, model/help/adj.py:114-140).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None,
              data_parallel: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh over the first ``n_devices`` devices.

    Default factorization puts as much as possible on ``data`` (throughput
    scaling) while keeping ``model`` = 1 unless requested; pass
    ``data_parallel`` to control the split explicitly.
    """
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if data_parallel is None:
        data_parallel = n
    assert n % data_parallel == 0, (n, data_parallel)
    model_parallel = n // data_parallel
    arr = np.asarray(devs).reshape(data_parallel, model_parallel)
    return Mesh(arr, axis_names=("data", "model"))
