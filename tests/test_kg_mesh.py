"""True-KG KGAT under a (data, model) mesh must match single-device.

The tag-graph KGAT mesh path is covered end-to-end by test_cli_mesh; this
covers the LIVE knowledge-graph mode (--use_kg, data/kg.py — the resurrected
KGAT_load surface, /root/reference/data/kgat_load.py) whose device data is a
different structure entirely (entity-extended tables, relation planes /
edgemap triples, TransE phase over KG triples).  Both phases (BPR + TransE)
run under dp=4 x mp=2 on the 8-virtual-device CPU mesh and must reproduce the
single-device loss trajectory: batches shard over `data`, entity-extended
embedding rows over `model`, one shared Adam state across phases
(com.py:68-73 semantics).
"""

import numpy as np
import jax
import pytest

from tagrec_tpu.config import TrainConfig, model_preset


def _run(graph, kg, mesh, steps=2):
    from tagrec_tpu.compose import build_pipeline
    from tagrec_tpu.training.train import Trainer

    mcfg = model_preset("kgat", agg_type="bi_inter", reg=1e-4)
    tcfg = TrainConfig(train_batch=64)
    pipe = build_pipeline(graph, mcfg, tcfg, kg=kg)
    assert len(pipe.phases) == 2, "true-KG kgat must compose BPR + TransE"
    params = pipe.model.init(jax.random.PRNGKey(0))
    for ph in pipe.phases:
        ph.steps_per_epoch = min(ph.steps_per_epoch, steps)
    trainer = Trainer(pipe.phases, tcfg, mesh=mesh)
    opt_state = trainer.init_opt_state(params)
    gdev = pipe.gdev
    if mesh is not None:
        from tagrec_tpu.parallel import sharding as shd

        params = shd.place(params, shd.params_sharding(params, mesh))
        opt_state = shd.place(opt_state, shd.params_sharding(opt_state, mesh))
        gdev = shd.place(gdev, shd.gdev_sharding(gdev, mesh))
    key = jax.random.PRNGKey(7)
    parts_out = []
    for ph in pipe.phases:
        fn = trainer._epoch_fn(ph)
        params, opt_state, key, parts = fn(params, opt_state, key, gdev,
                                           ph.data)
        parts_out.append(np.asarray(parts))
    return parts_out


@pytest.mark.slow
def test_kg_kgat_mesh_matches_single_device(tiny_graph):
    from tagrec_tpu.data.kg import KnowledgeGraph
    from tagrec_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) >= 8
    kg = KnowledgeGraph.synthetic(tiny_graph, n_entity=220, n_triples=900,
                                  n_rela=4, seed=0)
    single = _run(tiny_graph, kg, None)
    meshed = _run(tiny_graph, kg, make_mesh(8, data_parallel=4))
    for a, b in zip(single, meshed):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6)
