"""Checkpoint/resume, validation-split flow, metrics writer, profiling timer."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from tagrec_tpu.config import TrainConfig, model_preset
from tagrec_tpu.models.lightgcn import LightGCN
from tagrec_tpu.training import checkpoint
from tagrec_tpu.training.evaluate import Evaluator
from tagrec_tpu.utils import MetricsWriter, StepTimer


def test_checkpoint_roundtrip(tmp_path, tiny_graph):
    model = LightGCN(tiny_graph, model_preset("lightgcn"))
    params = model.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "ck.npz")
    checkpoint.save(path, params)
    restored = checkpoint.load(path, params)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_state_resume(tmp_path, tiny_graph):
    """Full resume: params + opt state + step — capability the reference lacks
    (SURVEY.md §5 checkpoint/resume)."""
    model = LightGCN(tiny_graph, model_preset("lightgcn"))
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(0.01)
    opt_state = opt.init(params)
    # take one step so opt state is non-trivial
    gdev = model.device_data()
    batch = jnp.asarray([[0, 1, 2]], dtype=jnp.int32)
    grads = jax.grad(lambda p: sum(model.bpr_loss(p, gdev, batch,
                                                  key=jax.random.PRNGKey(1))))(params)
    updates, opt_state = opt.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)

    path = str(tmp_path / "state.npz")
    checkpoint.save_train_state(path, params, opt_state, step=17)
    p2, o2, step = checkpoint.restore_train_state(path, params, opt_state)
    assert step == 17
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(opt_state),
                    jax.tree_util.tree_leaves(o2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_validation_split_flow(tiny_graph):
    """has_val: eval uses the val split until istest=True (basic_test.py:96-100)."""
    import copy

    g = copy.copy(tiny_graph)
    # synthesize a val split from half the test items
    val, test = {}, {}
    for u, items in tiny_graph.user_items["test"].items():
        if len(items) >= 2:
            val[u] = items[: len(items) // 2]
            test[u] = items[len(items) // 2:]
        else:
            test[u] = items
    g.user_items = dict(tiny_graph.user_items)
    g.user_items["val"] = val
    g.edge_index = dict(tiny_graph.edge_index)
    from tagrec_tpu.data import io as data_io

    g.edge_index["val"] = data_io.interactions_to_edges(val)

    cfg = model_preset("lightgcn")
    tcfg = TrainConfig(test_batch=64, has_val=True)
    model = LightGCN(g, cfg)
    params = model.init(jax.random.PRNGKey(0))
    gdev = model.device_data()
    ev = Evaluator(g, tcfg)
    r_val = ev.run(model, params, gdev, istest=False)
    r_test = ev.run(model, params, gdev, istest=True)
    assert r_val["ndcg"] != r_test["ndcg"]  # different splits -> different values


def test_metrics_writer(tmp_path):
    w = MetricsWriter(str(tmp_path))
    w.scalars(0, {"train/loss": 1.5})
    w.results(5, {"recall": [0.1, 0.2], "auc": [0.7]}, topks=(10, 20))
    w.text("config", "{}")
    w.close()
    lines = [json.loads(l) for l in open(os.path.join(tmp_path, "metrics.jsonl"))]
    assert lines[0]["train/loss"] == 1.5
    assert lines[1]["test/recall@10"] == pytest.approx(0.1)
    assert lines[1]["test/auc"] == pytest.approx(0.7)
    assert "text" in lines[2]


def test_step_timer():
    t = StepTimer()
    with t.step(n_examples=100):
        pass
    with t.step(n_examples=100):
        pass
    s = t.summary()
    assert s["steps"] == 2 and s["examples_per_sec"] > 0


def test_trainer_resume(tmp_path, tiny_graph):
    """Trainer saves full state at evals and resumes from it."""
    from tagrec_tpu.compose import build_pipeline
    from tagrec_tpu.training.early_stop import EarlyStop
    from tagrec_tpu.training.train import Trainer

    mcfg = model_preset("lightgcn")
    tcfg = TrainConfig(train_batch=64, test_batch=64, epochs=3,
                       test_interval=1, patient_epoch=100)
    pipe = build_pipeline(tiny_graph, mcfg, tcfg)
    params = pipe.model.init(jax.random.PRNGKey(0))
    sp = str(tmp_path / "state.npz")
    tr = Trainer(pipe.phases, tcfg)
    stop = EarlyStop(100, "ndcg")
    tr.run(params, jax.random.PRNGKey(1), pipe.evaluator, pipe.model,
           pipe.gdev, stop, log=lambda *a: None, state_path=sp)
    assert os.path.exists(sp)

    # resume: should start from saved epoch (logged) and run to completion
    logs = []
    tcfg2 = tcfg.replace(epochs=5)
    tr2 = Trainer(pipe.phases, tcfg2)
    stop2 = EarlyStop(100, "ndcg")
    tr2.run(params, jax.random.PRNGKey(1), pipe.evaluator, pipe.model,
            pipe.gdev, stop2, log=logs.append, state_path=sp)
    assert any("resumed" in str(l) for l in logs)


def test_trainer_nan_guard(tiny_graph):
    """A diverged (non-finite) epoch must stop training with a clear error
    (failure detection, SURVEY §5) instead of training on NaNs."""
    import pytest
    from tagrec_tpu.compose import build_pipeline
    from tagrec_tpu.config import TrainConfig, model_preset
    from tagrec_tpu.training.train import Trainer

    mcfg = model_preset("lightgcn", reg=1e-4)
    tcfg = TrainConfig(train_batch=32, test_batch=32, epochs=2,
                       test_interval=5, lr=1.0)
    pipe = build_pipeline(tiny_graph, mcfg, tcfg)
    params = pipe.model.init(jax.random.PRNGKey(0))
    # poison the embeddings so the first epoch produces NaN losses
    params["embed"][0] = params["embed"][0].at[0, 0].set(jnp.nan)

    class _Stop:
        best_epoch, best_result = 0, {}

        def __call__(self, *a):
            return False

    trainer = Trainer(pipe.phases, tcfg)
    with pytest.raises(FloatingPointError, match="non-finite loss"):
        trainer.run(params, jax.random.PRNGKey(1), pipe.evaluator,
                    pipe.model, pipe.gdev, _Stop(), log=lambda *a: None)


def test_triple_phase_reference_windows():
    """Quirk #5 (train_data/transe_training_data.py:31-37): window mode must
    (a) never shuffle — creation order every epoch, (b) slice overlapping
    [i:i+batch] windows stepping by ONE, (c) run N//batch steps."""
    from tagrec_tpu.training.train import triple_phase

    rng = np.random.default_rng(3)
    n, batch, n_ids = 57, 8, 40
    trips = np.stack([rng.integers(0, n_ids, n),
                      rng.integers(0, 6, n),
                      rng.integers(0, n_ids, n)], axis=1).astype(np.int64)
    phase = triple_phase("transe", trips, 6, n_ids, batch,
                         loss_fn=None, window=True)
    assert phase.steps_per_epoch == n // batch
    state = phase.epoch_reset(jax.random.PRNGKey(0), phase.data)
    np.testing.assert_array_equal(np.asarray(state[0]), trips)  # no shuffle
    for i in (0, 3, phase.steps_per_epoch - 1):
        b = phase.make_batch(jax.random.PRNGKey(i), jnp.asarray(i),
                             state, phase.data)
        np.testing.assert_array_equal(np.asarray(b[:, :3]),
                                      trips[i:i + batch])
        # corrupted tails never collide with an observed (h, r) tail
        seen = {(h, r): set() for h, r in trips[:, :2]}
        for h, r, t in trips:
            seen[(h, r)].add(t)
        for h, r, t, neg in np.asarray(b):
            assert neg not in seen[(h, r)]

    # default mode still shuffles (sanity, not a permutation-of check)
    full = triple_phase("transe", trips, 6, n_ids, batch, loss_fn=None)
    st = full.epoch_reset(jax.random.PRNGKey(0), full.data)
    assert not np.array_equal(np.asarray(st[0]), trips)
    assert sorted(map(tuple, np.asarray(st[0]))) == sorted(map(tuple, trips))


def test_adam_impl_switch(tiny_graph):
    """TrainConfig.adam_impl: 'torch' (default) and 'global' both train; the
    torch transform is bit-identical to optax.adam when every leaf gets a
    gradient every step (single-phase models)."""
    from tagrec_tpu.compose import build_pipeline
    from tagrec_tpu.training import optim
    from tagrec_tpu.training.train import Trainer

    finals = {}
    for impl in ("torch", "global"):
        mcfg = model_preset("lightgcn", reg=1e-4)
        tcfg = TrainConfig(train_batch=32, epochs=1, test_interval=1,
                           adam_impl=impl)
        pipe = build_pipeline(tiny_graph, mcfg, tcfg)
        phase = pipe.phases[0]
        phase.steps_per_epoch = min(phase.steps_per_epoch, 4)
        trainer = Trainer([phase], tcfg)
        params = pipe.model.init(jax.random.PRNGKey(0))
        opt_state = trainer.init_opt_state(params)
        fn = trainer._epoch_fn(phase)
        p, _, _, parts = fn(params, opt_state, jax.random.PRNGKey(1),
                            pipe.gdev, phase.data)
        finals[impl] = np.asarray(jax.tree_util.tree_leaves(p)[0])
        assert np.isfinite(np.asarray(parts)).all()
    # single-phase: identical trajectories across implementations
    np.testing.assert_allclose(finals["torch"], finals["global"],
                               rtol=1e-5, atol=1e-6)
    with pytest.raises(ValueError, match="unknown adam_impl"):
        optim.make_optimizer(TrainConfig(adam_impl="bogus"))
