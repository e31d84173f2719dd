"""Serving path: export -> Retriever top-k == the eval protocol's ranking.

The retriever must reproduce exactly the lists the evaluator ranks
(training/evaluate.py masking protocol), so a deployment serves what the
offline metrics measured.
"""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tagrec_tpu import serving
from tagrec_tpu.config import model_preset
from tagrec_tpu.models import MODEL_REGISTRY


def _oracle_topk(model, params, gdev, users, train_pos, k, n_item):
    scores = np.asarray(model.predict(params, gdev, jnp.asarray(users)))
    scores = scores[:, :n_item].astype(np.float64)
    for b, u in enumerate(users):
        for it in train_pos.get(u, []):
            scores[b, it] = serving.MASK_SCORE
    ids = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return ids, np.take_along_axis(scores, ids, axis=1)


@pytest.mark.parametrize("name", ["lightgcn", "kgat"])
def test_retriever_matches_eval_protocol(tiny_graph, name):
    model = MODEL_REGISTRY[name](tiny_graph, model_preset(name, reg=1e-4))
    params = model.init(jax.random.PRNGKey(0))
    gdev = model.device_data()

    u_t, i_t = serving.export_tables(model, params, gdev,
                                     n_item=tiny_graph.n_item)
    assert i_t.shape[0] == tiny_graph.n_item  # KGAT entity table trimmed
    pad, _ = serving._pad_positives(tiny_graph.user_items["train"],
                                    tiny_graph.n_user)
    r = serving.Retriever(u_t, i_t, train_pad=pad, block=8)

    users = [0, 3, 7, 11, 2]  # non-multiple of block -> exercises padding
    k = 10
    ids, scores = r.topk(users, k)
    oid, osc = _oracle_topk(model, params, gdev, users,
                            tiny_graph.user_items["train"], k,
                            tiny_graph.n_item)
    # ties can reorder equal scores; compare score vectors + id sets per rank
    np.testing.assert_allclose(scores, osc, rtol=1e-5, atol=1e-6)
    same = (ids == oid).mean()
    assert same > 0.9, f"top-k ids diverge beyond tie noise: {same}"
    # no train positive is ever served
    for b, u in enumerate(users):
        assert not set(ids[b].tolist()) & set(
            tiny_graph.user_items["train"].get(u, []))


def test_export_roundtrip(tmp_path, tiny_graph):
    model = MODEL_REGISTRY["lightgcn"](tiny_graph,
                                       model_preset("lightgcn", reg=1e-4))
    params = model.init(jax.random.PRNGKey(1))
    gdev = model.device_data()
    u_t, i_t = serving.export_tables(model, params, gdev,
                                     n_item=tiny_graph.n_item)
    path = os.path.join(tmp_path, "art.npz")
    meta = serving.save_export(path, u_t, i_t, model_name="lightgcn",
                               train_pos=tiny_graph.user_items["train"])
    assert meta["version"] == serving.EXPORT_VERSION
    assert json.load(open(path + ".meta.json"))["n_item"] == tiny_graph.n_item

    r = serving.Retriever.from_export(path, block=4)
    ids, scores = r.topk([1, 2], 5)
    assert ids.shape == (2, 5) and scores.shape == (2, 5)
    # identical to a retriever built from the in-memory tables
    pad, _ = serving._pad_positives(tiny_graph.user_items["train"],
                                    tiny_graph.n_user)
    r2 = serving.Retriever(u_t, i_t, train_pad=pad, block=4)
    ids2, scores2 = r2.topk([1, 2], 5)
    np.testing.assert_array_equal(ids, ids2)
    np.testing.assert_allclose(scores, scores2, rtol=1e-6)


def test_retriever_sharded_matches_single(tiny_graph):
    """8-device CPU mesh: row-sharded item table + distributed merge must
    serve the same lists as the single-device retriever."""
    from tagrec_tpu.parallel.mesh import make_mesh

    model = MODEL_REGISTRY["lightgcn"](tiny_graph,
                                       model_preset("lightgcn", reg=1e-4))
    params = model.init(jax.random.PRNGKey(2))
    gdev = model.device_data()
    u_t, i_t = serving.export_tables(model, params, gdev,
                                     n_item=tiny_graph.n_item)
    pad, _ = serving._pad_positives(tiny_graph.user_items["train"],
                                    tiny_graph.n_user)
    mesh = make_mesh(8, data_parallel=2)  # model axis = 4
    r1 = serving.Retriever(u_t, i_t, train_pad=pad, block=8)
    r8 = serving.Retriever(u_t, i_t, train_pad=pad, block=8, mesh=mesh)
    users = list(range(min(12, tiny_graph.n_user)))
    i1, s1 = r1.topk(users, 7)
    i8, s8 = r8.topk(users, 7)
    np.testing.assert_allclose(s1, s8, rtol=1e-5, atol=1e-6)
    assert (i1 == i8).mean() > 0.9  # ties only
