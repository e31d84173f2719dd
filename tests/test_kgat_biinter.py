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
