"""LightGCN: forward parity vs an independent numpy oracle + end-to-end training."""

import numpy as np
import jax
import jax.numpy as jnp

from tagrec_tpu.config import TrainConfig, model_preset
from tagrec_tpu.models.lightgcn import LightGCN
from tagrec_tpu.ops import sampling
from tagrec_tpu.training.early_stop import EarlyStop
from tagrec_tpu.training.evaluate import Evaluator
from tagrec_tpu.training.train import Trainer, bpr_phase


def numpy_lightgcn_forward(adj_dense, embeds, num_layer):
    """Independent oracle for model/lightgcn.py:49-63 semantics."""
    x = np.concatenate(embeds, axis=0)
    outs = [x]
    for _ in range(num_layer):
        x = adj_dense @ x
        n = np.linalg.norm(x, axis=1, keepdims=True)
        outs.append(x / np.maximum(n, 1e-12))
    return np.mean(np.stack(outs, axis=1), axis=1)


def test_forward_matches_numpy_oracle(tiny_graph):
    cfg = model_preset("lightgcn")
    model = LightGCN(tiny_graph, cfg)
    params = model.init(jax.random.PRNGKey(0))
    gdev = model.device_data()
    embs = model.forward(params, gdev, training=False)

    adj_dense = tiny_graph.joint_norm_adj("bi_norm", True).to_dense()
    expect = numpy_lightgcn_forward(adj_dense,
                                    [np.asarray(e) for e in params["embed"]],
                                    cfg.num_layer)
    got = np.concatenate([np.asarray(e) for e in embs], axis=0)
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=1e-5)


def test_bpr_loss_grad_finite(tiny_graph):
    cfg = model_preset("lightgcn", reg=1e-4)
    model = LightGCN(tiny_graph, cfg)
    params = model.init(jax.random.PRNGKey(0))
    gdev = model.device_data()
    batch = jnp.asarray([[0, 1, 2], [1, 3, 4], [2, 0, 5]], dtype=jnp.int32)

    def total(p):
        parts = model.bpr_loss(p, gdev, batch, key=jax.random.PRNGKey(1))
        return sum(parts)

    val, grads = jax.value_and_grad(total)(params)
    assert np.isfinite(float(val))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    assert any(np.any(np.asarray(g) != 0) for g in flat)


def test_end_to_end_training_loop(tiny_graph):
    """Full Trainer/Evaluator/EarlyStop loop runs; BPR loss decreases.

    Note: on a 40-user toy graph, BPR training *reduces* held-out metrics for
    the reference implementation too (verified against an independent torch
    mirror of the reference semantics — over-parameterized memorization), so
    metric improvement is NOT asserted here; trajectory parity with torch is
    covered by test_parity_torch.py.
    """
    cfg = model_preset("lightgcn")
    tcfg = TrainConfig(train_batch=64, test_batch=64, epochs=11, lr=0.01,
                       test_interval=5, patient_epoch=100)
    model = LightGCN(tiny_graph, cfg)
    params = model.init(jax.random.PRNGKey(0))
    gdev = model.device_data()

    evaluator = Evaluator(tiny_graph, tcfg)
    initial = evaluator.run(model, params, gdev)
    assert 0.0 < initial["auc"][0] <= 1.0

    pt = sampling.build_pos_table(tiny_graph.user_items["train"],
                                  tiny_graph.n_user, tiny_graph.n_item)
    edges = tiny_graph.edge_index["train"]

    def loss_fn(p, g, batch, key):
        return model.bpr_loss(p, g, batch, key=key)

    phase = bpr_phase("bpr", edges, pt, tcfg.train_batch, loss_fn)
    trainer = Trainer([phase], tcfg)
    opt_state = trainer.init_opt_state(params)
    fn = trainer._epoch_fn(phase)
    key = jax.random.PRNGKey(2)
    first_loss = None
    p, o = params, opt_state
    for _ in range(10):
        p, o, key, parts = fn(p, o, key, gdev, phase.data)
        ep_loss = float(np.asarray(parts).sum(axis=1).mean())
        if first_loss is None:
            first_loss = ep_loss
    assert ep_loss < first_loss, (first_loss, ep_loss)

    # driver loop end-to-end (eval + early stop bookkeeping)
    stop = EarlyStop(tcfg.patient_epoch, tcfg.early_stop_key)
    out = trainer.run(params, jax.random.PRNGKey(2), evaluator, model, gdev,
                      stop, log=lambda *a: None)
    final = evaluator.run(model, out["params"], gdev)
    for k in ("recall", "precision", "ndcg", "hr"):
        assert len(final[k]) == 2 and all(np.isfinite(final[k]))
    assert 0.0 < final["auc"][0] <= 1.0
    assert stop.best_result is not None and stop.best_value is not None


def test_group_breakdown(tiny_graph):
    cfg = model_preset("lightgcn")
    tcfg = TrainConfig(test_batch=64)
    model = LightGCN(tiny_graph, cfg)
    params = model.init(jax.random.PRNGKey(0))
    gdev = model.device_data()
    evaluator = Evaluator(tiny_graph, tcfg)
    groups = evaluator.run(model, params, gdev, istest=True, group_k=3)
    assert len(groups) >= 2
    n_users = sum(int(k.split("-")[-1]) for k in groups)
    assert n_users == len(tiny_graph.user_items["test"])


def test_dense_sectors_matches_full_dense(tiny_graph):
    """Sector-blocked dense adjacency (diagonal blocks skipped) must be
    numerically identical to the full dense block — forward, loss, grads."""
    import jax
    import jax.numpy as jnp
    from tagrec_tpu.config import model_preset
    from tagrec_tpu.models.lightgcn import LightGCN
    from tagrec_tpu.ops import ell as ell_lib
    from tagrec_tpu.ops.propagate import dense_sectors_mm

    cfg = model_preset("lightgcn", reg=1e-4, adj_mode="dense")
    model = LightGCN(tiny_graph, cfg)
    gdev = model.device_data()
    adj = gdev["adj"]
    assert isinstance(adj.fwd, ell_lib.DenseSectors)
    # no diagonal blocks
    assert all(ri != ci for ri, ci in adj.fwd.coords)

    coo = tiny_graph.joint_norm_adj("bi_norm", True)
    dense = jnp.asarray(coo.to_dense())
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((dense.shape[1], 16))
                    .astype(np.float32))
    np.testing.assert_allclose(np.asarray(dense_sectors_mm(adj.fwd, x)),
                               np.asarray(dense @ x), rtol=1e-5, atol=1e-5)

    # full model forward + grad vs the full-dense build (no sectors)
    host_full = ell_lib.build_adj_pair(coo, symmetric=True, mode="dense")
    gdev_full = {"adj": ell_lib.adj_pair_to_device(host_full)}
    params = model.init(jax.random.PRNGKey(0))
    f1 = model.forward(params, gdev, training=False)
    f2 = model.forward(params, gdev_full, training=False)
    for a, b in zip(f1, f2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    batch = jnp.asarray([[0, 1, 2], [3, 4, 5]], dtype=jnp.int32)

    def grad_of(g):
        def f(p):
            return sum(model.bpr_loss(p, g, batch, key=jax.random.PRNGKey(1)))
        return jax.grad(f)(params)

    for a, b in zip(jax.tree_util.tree_leaves(grad_of(gdev)),
                    jax.tree_util.tree_leaves(grad_of(gdev_full))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)

    # edge dropout preserves zero blocks and rescales survivors
    from tagrec_tpu.ops.propagate import edge_dropout
    dropped = edge_dropout(adj, 0.5, jax.random.PRNGKey(2), True)
    assert isinstance(dropped, ell_lib.DenseSectors)
    y = dense_sectors_mm(dropped, x)
    assert np.all(np.isfinite(np.asarray(y)))


def test_dense_sectors_bf16_close_to_f32(tiny_graph):
    """bf16 sector blocks: same math at reduced adjacency precision
    (quality-neutral at scale, PARITY.md bf16 rows)."""
    import jax
    from tagrec_tpu.config import model_preset
    from tagrec_tpu.models.lightgcn import LightGCN

    m32 = LightGCN(tiny_graph, model_preset("lightgcn", adj_mode="dense"))
    m16 = LightGCN(tiny_graph, model_preset("lightgcn", adj_mode="dense",
                                            adj_dtype="bf16"))
    import jax.numpy as jnp
    assert m16.device_data()["adj"].fwd.blocks[0].dtype == jnp.bfloat16
    params = m32.init(jax.random.PRNGKey(0))
    f32 = m32.forward(params, m32.device_data(), training=False)
    f16 = m16.forward(params, m16.device_data(), training=False)
    for a, b in zip(f32, f16):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=2e-3)
