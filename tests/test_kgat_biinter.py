"""KGAT bi_inter propagation vs a dense numpy oracle of the *intended*
semantics (the reference's attention path has a latent shape bug and is
config-skipped — model/kgat.py:71-72,100; SURVEY quirks #3)."""

import numpy as np
import jax
import jax.numpy as jnp

from tagrec_tpu.config import model_preset
from tagrec_tpu.models.kgat import KGAT


def numpy_kgat_forward(graph, params, dims=(64, 64, 32, 16)):
    nu = graph.n_user
    all_embed = np.concatenate([np.asarray(params["user"]),
                                np.asarray(params["entity"])], axis=0)
    n = all_embed.shape[0]
    transE = np.asarray(params["transE"])
    rel_emb = np.asarray(params["relation"])

    # attention scores per relation edge: (W_r e_t) . tanh(W_r e_h + e_r)
    A = np.full((n, n), -np.inf, dtype=np.float64)
    rel = graph.relation_edges()
    for r in range(6):
        h, t = rel[r][0], rel[r][1]
        ph = all_embed[h] @ transE[r] + rel_emb[r]
        pt = all_embed[t] @ transE[r]
        pai = np.sum(pt * np.tanh(ph), axis=1)
        A[h, t] = pai
    # row softmax over existing edges
    S = np.zeros((n, n))
    for i in range(n):
        row = A[i]
        mask = np.isfinite(row)
        if not mask.any():
            continue
        e = np.exp(row[mask] - row[mask].max())
        S[i, mask] = e / e.sum()

    def leaky(x):
        return np.where(x > 0, x, 0.2 * x)

    x = all_embed.astype(np.float64)
    outs = [x]
    mats = params["mat"]
    for k in range(3):
        nei = S @ x
        s = leaky((nei + x) @ (np.asarray(mats[f"W1_{k}"], dtype=np.float64)
                               + np.asarray(mats[f"b1_{k}"], dtype=np.float64)))
        b = leaky((nei * x) @ (np.asarray(mats[f"W2_{k}"], dtype=np.float64)
                               + np.asarray(mats[f"b2_{k}"], dtype=np.float64)))
        x = s + b
        norm = np.linalg.norm(x, axis=1, keepdims=True)
        outs.append(x / np.maximum(norm, 1e-12))
    return np.concatenate(outs, axis=1)


def test_bi_inter_matches_dense_oracle(tiny_graph):
    cfg = model_preset("kgat", agg_type="bi_inter")
    model = KGAT(tiny_graph, cfg)
    params = model.init(jax.random.PRNGKey(0))
    gdev = model.device_data()
    u, e = model.forward(params, gdev, training=False)
    got = np.concatenate([np.asarray(u), np.asarray(e)], axis=0)
    expect = numpy_kgat_forward(tiny_graph, params)
    np.testing.assert_allclose(got, expect, rtol=5e-4, atol=1e-5)


def test_default_config_skips_propagation(tiny_graph):
    """Quirk #3 parity: shipped agg_type='bi_agg' -> ego embeddings."""
    cfg = model_preset("kgat")  # bi_agg
    model = KGAT(tiny_graph, cfg)
    params = model.init(jax.random.PRNGKey(0))
    gdev = model.device_data()
    u, e = model.forward(params, gdev, training=False)
    np.testing.assert_array_equal(np.asarray(u), np.asarray(params["user"]))
    np.testing.assert_array_equal(np.asarray(e), np.asarray(params["entity"]))


def test_kgat_knowledge_graph_mode(tmp_path, tiny_graph):
    """KGAT over a true KG (kg_final.txt): entities/relations from the KG,
    TransE phase over the full triplet set."""
    import numpy as np
    from tagrec_tpu.config import TrainConfig
    from tagrec_tpu.compose import build_pipeline
    from tagrec_tpu.data.kg import KnowledgeGraph
    from tagrec_tpu.training.train import Trainer

    d = tmp_path / "kgds"
    d.mkdir()
    rng = np.random.default_rng(0)
    # entities 0..119 (>= n_item so items are a prefix), 3 base relations
    kg = np.unique(np.stack([rng.integers(0, 120, 400),
                             rng.integers(0, 3, 400),
                             rng.integers(0, 120, 400)], axis=1), axis=0)
    np.savetxt(d / "kg_final.txt", kg, fmt="%d")
    kgo = KnowledgeGraph(tiny_graph, str(tmp_path), "kgds")

    mcfg = model_preset("kgat", agg_type="bi_inter", reg=1e-4, cor_reg=1e-4)
    tcfg = TrainConfig(train_batch=32, test_batch=64, epochs=1)
    pipe = build_pipeline(tiny_graph, mcfg, tcfg, kg=kgo)
    assert pipe.model.num_entity == kgo.num_entity
    assert pipe.model.num_relation == kgo.num_relation
    params = pipe.model.init(jax.random.PRNGKey(0))
    trainer = Trainer(pipe.phases, tcfg)
    opt_state = trainer.init_opt_state(params)
    key = jax.random.PRNGKey(1)
    for phase in pipe.phases:
        phase.steps_per_epoch = min(phase.steps_per_epoch, 2)
        fn = trainer._epoch_fn(phase)
        params, opt_state, key, parts = fn(params, opt_state, key,
                                           pipe.gdev, phase.data)
        assert np.all(np.isfinite(np.asarray(parts)))
    res = pipe.evaluator.run(pipe.model, params, pipe.gdev)
    assert np.isfinite(res["ndcg"][0])


def _parallel_free_kg(graph, n_entity=120, n_pairs=150, n_rela=3, seed=0):
    """KG whose triplet set (incl. reverses) has no parallel (h, t) edges:
    unique upper-triangle pairs, one relation each — the precondition for
    the dense rel-id tier.  n_entity >= n_item (items are a prefix of the
    entity space, data/kgat_load.py convention)."""
    assert n_entity >= graph.n_item
    import numpy as np
    from tagrec_tpu.data.kg import KnowledgeGraph

    rng = np.random.default_rng(seed)
    iu = np.triu_indices(n_entity, k=1)
    sel = rng.choice(len(iu[0]), size=n_pairs, replace=False)
    kg = KnowledgeGraph.__new__(KnowledgeGraph)
    kg.graph = graph
    kg.kg_data = np.stack([iu[0][sel], rng.integers(0, n_rela, n_pairs),
                           iu[1][sel]], axis=1).astype(np.int64)
    kg._finish_init()
    return kg


def test_kgat_kg_dense_matches_edgemap(tiny_graph):
    """True-KG dense tier (per-cell relation ids + select-accumulated MXU
    score planes) must equal the edgemap tier — forward and gradients
    (model/kgat.py:69-125 semantics; round-3 perf tier)."""
    import numpy as np
    from tagrec_tpu.models.kgat import KGAT

    kg = _parallel_free_kg(tiny_graph)
    m_d = KGAT(tiny_graph, model_preset("kgat", agg_type="bi_inter",
                                        reg=1e-4, adj_mode="dense_xla"),
               kg=kg)
    m_e = KGAT(tiny_graph, model_preset("kgat", agg_type="bi_inter",
                                        reg=1e-4, adj_mode="ell"), kg=kg)
    assert m_d.kg_rel_dense and not m_e.kg_rel_dense
    params = m_d.init(jax.random.PRNGKey(0))
    gd, ge = m_d.device_data(), m_e.device_data()

    fd = m_d.forward(params, gd, training=False)
    fe = m_e.forward(params, ge, training=False)
    np.testing.assert_allclose(np.asarray(fd[0]), np.asarray(fe[0]),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fd[1]), np.asarray(fe[1]),
                               rtol=2e-5, atol=1e-6)

    batch = jnp.asarray([[0, 1, 2], [1, 3, 4], [2, 0, 5]], dtype=jnp.int32)

    def tot(model, gdev):
        return lambda p: sum(model.bpr_loss(p, gdev, batch,
                                            key=jax.random.PRNGKey(1)))

    ld, grd = jax.value_and_grad(tot(m_d, gd))(params)
    le, gre = jax.value_and_grad(tot(m_e, ge))(params)
    np.testing.assert_allclose(float(ld), float(le), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(grd),
                    jax.tree_util.tree_leaves(gre)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)


def test_kgat_kg_dense_bf16_scores_close(tiny_graph):
    """adj_dtype=bf16 runs the relation score planes in bf16 (measured
    165 -> 107 ms at KG-bench scale); forward must stay close to f32."""
    import numpy as np
    from tagrec_tpu.models.kgat import KGAT

    kg = _parallel_free_kg(tiny_graph)
    m32 = KGAT(tiny_graph, model_preset("kgat", agg_type="bi_inter",
                                        reg=1e-4, adj_mode="dense_xla"),
               kg=kg)
    m16 = KGAT(tiny_graph, model_preset("kgat", agg_type="bi_inter",
                                        reg=1e-4, adj_mode="dense_xla",
                                        adj_dtype="bf16"), kg=kg)
    assert m32.kg_rel_dense and m16.kg_rel_dense
    params = m32.init(jax.random.PRNGKey(0))
    f32 = m32.forward(params, m32.device_data(), training=False)
    f16 = m16.forward(params, m16.device_data(), training=False)
    for a, b in zip(f32, f16):
        err = np.max(np.abs(np.asarray(a) - np.asarray(b)))
        scale = np.max(np.abs(np.asarray(a)))
        assert err / scale < 2e-2, (err, scale)


def test_kgat_kg_dense_parallel_edge_fallback(tiny_graph):
    """Parallel (h, t) edges are not dense-representable: the model must
    fall back to the edgemap tier, not silently drop an edge."""
    import numpy as np
    from tagrec_tpu.models.kgat import KGAT

    kg = _parallel_free_kg(tiny_graph)
    # duplicate the first pair under a different relation
    h, r, t = kg.kg_data[0]
    kg.kg_data = np.concatenate(
        [kg.kg_data, [[h, (r + 1) % 3, t]]]).astype(np.int64)
    kg._finish_init()
    m = KGAT(tiny_graph, model_preset("kgat", agg_type="bi_inter",
                                      reg=1e-4, adj_mode="dense_xla"), kg=kg)
    assert not m.kg_rel_dense
    assert "em" in m.device_data()


def test_kg_synthetic_matches_file_loader(tmp_path, tiny_graph):
    """KnowledgeGraph.synthetic (the in-memory bench/test constructor) builds
    the same triplet structure as the kg_final.txt loader for the same kg
    data (data/kgat_load.py:8-50 semantics)."""
    import numpy as np
    from tagrec_tpu.data.kg import KnowledgeGraph

    kgo = KnowledgeGraph.synthetic(tiny_graph, n_entity=120, n_triples=400,
                                   n_rela=3, seed=0)
    d = tmp_path / "kgds"
    d.mkdir()
    np.savetxt(d / "kg_final.txt", kgo.kg_data, fmt="%d")
    from_file = KnowledgeGraph(tiny_graph, str(tmp_path), "kgds")
    assert kgo.num_entity == from_file.num_entity
    assert kgo.num_relation == from_file.num_relation
    np.testing.assert_array_equal(kgo.all_triplet, from_file.all_triplet)


def test_kgat_quirk3_skips_adjacency_build(tiny_graph):
    """Shipped-config KGAT (agg_type='bi_agg', quirk #3) never propagates, so
    no adjacency/attention structure may be built or shipped: at 10x scale
    the unused edge-map tables cost ~10 min of host build and OOM'd the chip
    (r4 probe).  Forward must still work (ego embeddings) with gdev={}."""
    m = KGAT(tiny_graph, model_preset("kgat", reg=1e-4))
    assert m.skip_adj
    assert m.device_data() == {}
    assert not hasattr(m, "_em_host")
    params = m.init(jax.random.PRNGKey(0))
    u, e = m.forward(params, {}, training=False)
    np.testing.assert_allclose(np.asarray(u), np.asarray(params["user"]),
                               rtol=1e-6)
    batch = jnp.asarray([[0, 1, 2], [1, 3, 4]], dtype=jnp.int32)
    loss = sum(m.bpr_loss(params, {}, batch, key=jax.random.PRNGKey(1)))
    assert np.isfinite(float(loss))
    # the intended-propagation switch still builds the full machinery
    mi = KGAT(tiny_graph, model_preset("kgat", agg_type="bi_inter",
                                       reg=1e-4))
    assert not mi.skip_adj and mi.device_data() != {}
