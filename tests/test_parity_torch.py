"""Golden trajectory parity: identical init + identical batches =>
tagrec_tpu (jax) and the torch mirrors of the reference semantics must produce
matching loss trajectories under Adam.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
import torch

from tagrec_tpu.config import model_preset
from tagrec_tpu.models.dgcf import DGCF
from tagrec_tpu.models.disengcn import DisenGCN
from tagrec_tpu.models.lightgcn import LightGCN
from tagrec_tpu.models.ngcf import NGCF

import torch_mirrors as TM


def fixed_batches(graph, n_batches=4, batch=48, seed=123):
    rng = np.random.default_rng(seed)
    train = graph.user_items["train"]
    users = sorted(train.keys())
    out = []
    for _ in range(n_batches):
        u = rng.choice(users, batch)
        p = np.array([rng.choice(train[x]) for x in u])
        n = []
        for x in u:
            while True:
                j = rng.integers(0, graph.n_item)
                if j not in train[x]:
                    n.append(j)
                    break
        out.append(np.stack([u, p, np.array(n)], axis=1).astype(np.int64))
    return out


def run_jax(model, params, gdev, batches, lr=0.01, loss_extract=None):
    opt = optax.adam(lr)
    state = opt.init(params)
    losses = []

    @jax.jit
    def step(params, state, batch):
        def total(p):
            parts = model.bpr_loss(p, gdev, batch, key=jax.random.PRNGKey(0),
                                   training=True)
            return sum(parts)

        loss, grads = jax.value_and_grad(total)(params)
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state, loss

    for b in batches:
        params, state, loss = step(params, state, jnp.asarray(b, jnp.int32))
        losses.append(float(loss))
    return losses


def run_torch(mirror, batches, lr=0.01):
    opt = torch.optim.Adam(mirror.parameters(), lr=lr)
    losses = []
    for b in batches:
        loss = mirror.loss(b)
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    return losses


def assert_trajectories_close(ours, ref, rtol=2e-3):
    ours, ref = np.asarray(ours), np.asarray(ref)
    np.testing.assert_allclose(ours[0], ref[0], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ours, ref, rtol=rtol, atol=1e-4)


def test_lightgcn_parity(tiny_graph):
    cfg = model_preset("lightgcn", reg=1e-4)
    model = LightGCN(tiny_graph, cfg)
    params = model.init(jax.random.PRNGKey(0))
    gdev = model.device_data()
    batches = fixed_batches(tiny_graph)
    mirror = TM.TorchLightGCN(tiny_graph,
                              [np.asarray(e) for e in params["embed"]],
                              reg=1e-4)
    assert_trajectories_close(run_jax(model, params, gdev, batches),
                              run_torch(mirror, batches))


def test_ngcf_parity(tiny_graph):
    cfg = model_preset("ngcf", reg=1e-4)
    model = NGCF(tiny_graph, cfg)
    params = model.init(jax.random.PRNGKey(1))
    gdev = model.device_data()
    batches = fixed_batches(tiny_graph, seed=7)
    mirror = TM.TorchNGCF(tiny_graph,
                          [np.asarray(e) for e in params["embed"]],
                          {k: np.asarray(v) for k, v in params["mat"].items()},
                          reg=1e-4)
    assert_trajectories_close(run_jax(model, params, gdev, batches),
                              run_torch(mirror, batches))


def test_dgcf_parity(tiny_graph):
    cfg = model_preset("dgcf", reg=1e-4)
    model = DGCF(tiny_graph, cfg)
    params = model.init(jax.random.PRNGKey(2))
    gdev = model.device_data()
    batches = fixed_batches(tiny_graph, n_batches=3, seed=9)
    mirror = TM.TorchDGCF(tiny_graph, [np.asarray(e) for e in params["embed"]],
                          reg=1e-4)

    # full reference loss: BPR + reg * L2(ego) (model/dgcf.py:125-145)
    def jax_losses():
        opt = optax.adam(0.01)
        state = opt.init(params)
        p = params
        out = []

        @jax.jit
        def step(p, state, batch):
            def total(q):
                parts = model.bpr_loss(q, gdev, batch,
                                       key=jax.random.PRNGKey(0))
                return sum(parts)

            loss, grads = jax.value_and_grad(total)(p)
            updates, state = opt.update(grads, state, p)
            return optax.apply_updates(p, updates), state, loss

        for b in batches:
            p, state, loss = step(p, state, jnp.asarray(b, jnp.int32))
            out.append(float(loss))
        return out

    assert_trajectories_close(jax_losses(), run_torch(mirror, batches),
                              rtol=5e-3)


def test_disengcn_parity(tiny_graph):
    cfg = model_preset("disengcn", reg=1e-4)
    model = DisenGCN(tiny_graph, cfg)
    params = model.init(jax.random.PRNGKey(3))
    gdev = model.device_data()
    batches = fixed_batches(tiny_graph, n_batches=3, seed=11)
    mirror = TM.TorchDisenGCN(
        tiny_graph, [np.asarray(e) for e in params["embed"]],
        [{k: np.asarray(v) for k, v in lp.items()}
         for lp in params["layers"]], reg=1e-4)

    # full reference loss: BPR + reg * L2(final) (model/disengcn.py:100-130)
    def jax_losses():
        opt = optax.adam(0.01)
        state = opt.init(params)
        p = params
        out = []

        @jax.jit
        def step(p, state, batch):
            def total(q):
                parts = model.bpr_loss(q, gdev, batch,
                                       key=jax.random.PRNGKey(0))
                return sum(parts)

            loss, grads = jax.value_and_grad(total)(p)
            updates, state = opt.update(grads, state, p)
            return optax.apply_updates(p, updates), state, loss

        for b in batches:
            p, state, loss = step(p, state, jnp.asarray(b, jnp.int32))
            out.append(float(loss))
        return out

    assert_trajectories_close(jax_losses(), run_torch(mirror, batches),
                              rtol=5e-3)


def test_disenhan_parity(tiny_graph):
    from tagrec_tpu.models.disenhan import DisenHAN

    cfg = model_preset("disenhan", reg=1e-4)
    model = DisenHAN(tiny_graph, cfg)
    params = model.init(jax.random.PRNGKey(4))
    gdev = model.device_data()
    batches = fixed_batches(tiny_graph, n_batches=3, seed=13)
    mirror = TM.TorchDisenHAN(
        tiny_graph, [np.asarray(e) for e in params["embed"]],
        [{k: np.asarray(v) for k, v in lp.items()}
         for lp in params["layers"]], reg=1e-4)

    # full reference loss: BPR + reg * L2(final) (model/disenhan.py:185-214)
    def jax_losses():
        opt = optax.adam(0.01)
        state = opt.init(params)
        p = params
        out = []

        @jax.jit
        def step(p, state, batch):
            def total(q):
                return sum(model.bpr_loss(q, gdev, batch,
                                          key=jax.random.PRNGKey(0)))

            loss, grads = jax.value_and_grad(total)(p)
            updates, state = opt.update(grads, state, p)
            return optax.apply_updates(p, updates), state, loss

        for b in batches:
            p, state, loss = step(p, state, jnp.asarray(b, jnp.int32))
            out.append(float(loss))
        return out

    assert_trajectories_close(jax_losses(), run_torch(mirror, batches),
                              rtol=5e-3)


def test_kgat_transe_parity(tiny_graph):
    from tagrec_tpu.models.kgat import KGAT

    cfg = model_preset("kgat", cor_reg=1e-4)
    model = KGAT(tiny_graph, cfg)
    params = model.init(jax.random.PRNGKey(5))
    gdev = model.device_data()
    # fixed TransE batches over the 6 relations
    rng = np.random.default_rng(17)
    rel = tiny_graph.relation_edges()
    trips = np.concatenate([
        np.stack([rel[k][0], np.full(rel[k].shape[1], k), rel[k][1]], axis=1)
        for k in range(6)])
    n_ids = tiny_graph.n_user + tiny_graph.n_item + tiny_graph.n_tag
    batches = []
    for _ in range(3):
        sel = rng.integers(0, len(trips), 64)
        neg = rng.integers(0, n_ids, 64)
        batches.append(np.concatenate([trips[sel], neg[:, None]],
                                      axis=1).astype(np.int64))

    mirror = TM.TorchKGATTransE(np.asarray(params["user"]),
                                np.asarray(params["entity"]),
                                np.asarray(params["relation"]),
                                np.asarray(params["transE"]), cor_reg=1e-4)

    def jax_losses():
        opt = optax.adam(0.01)
        state = opt.init(params)
        p = params
        out = []

        @jax.jit
        def step(p, state, batch):
            def total(q):
                return sum(model.transe_loss(q, gdev, batch))

            loss, grads = jax.value_and_grad(total)(p)
            updates, state = opt.update(grads, state, p)
            return optax.apply_updates(p, updates), state, loss

        for b in batches:
            p, state, loss = step(p, state, jnp.asarray(b, jnp.int32))
            out.append(float(loss))
        return out

    assert_trajectories_close(jax_losses(), run_torch(mirror, batches),
                              rtol=5e-3)


def test_kgat_bi_inter_parity(tiny_graph):
    """Intended-propagation KGAT (agg_type='bi_inter') on the tag graph:
    trajectory parity of the attention + bi-interaction path (VERDICT r1 #6;
    semantics of model/kgat.py:63-125 with the quirk-#3 skip disabled)."""
    from tagrec_tpu.models.kgat import KGAT

    cfg = model_preset("kgat", reg=1e-4, cor_reg=1e-4, agg_type="bi_inter")
    model = KGAT(tiny_graph, cfg)
    params = model.init(jax.random.PRNGKey(8))
    gdev = model.device_data()
    batches = fixed_batches(tiny_graph, n_batches=3, seed=23)

    rel = tiny_graph.relation_edges()
    edges = [(rel[r][0], rel[r][1]) for r in range(6)]
    mirror = TM.TorchKGATBiInter(
        edges, np.asarray(params["user"]), np.asarray(params["entity"]),
        np.asarray(params["relation"]), np.asarray(params["transE"]),
        {k: np.asarray(v) for k, v in params["mat"].items()},
        reg=1e-4, cor_reg=1e-4)

    assert_trajectories_close(run_jax(model, params, gdev, batches),
                              run_torch(mirror, batches), rtol=5e-3)


def _write_synthetic_kg(tmp_path, graph, n_extra_entities=30, n_rela=3,
                        n_triples=220, seed=11):
    """kg_final.txt over entities [0, n_item + n_extra): items are entities
    0..n_item-1 (data/kgat_load.py id convention).  (h, t) pairs are unique
    with h < t so the dense-mirror attention matrix is collision-free."""
    rng = np.random.default_rng(seed)
    n_ent = graph.n_item + n_extra_entities
    seen = set()
    rows = []
    while len(rows) < n_triples:
        h, t = sorted(rng.integers(0, n_ent, 2).tolist())
        if h == t or (h, t) in seen:
            continue
        seen.add((h, t))
        rows.append((h, int(rng.integers(0, n_rela)), t))
    d = tmp_path / "kgdata"
    d.mkdir()
    with open(d / "kg_final.txt", "w") as f:
        for h, r, t in rows:
            f.write(f"{h} {r} {t}\n")
    return str(tmp_path), "kgdata"


def test_kgat_true_kg_parity(tiny_graph, tmp_path):
    """KGAT in knowledge-graph mode (the reference's dead KGAT_load path as
    live capability, data/kgat_load.py:8-50): BPR trajectory parity on the
    edgemap tier over UI-as-relation-0 + KG + reversed relations."""
    from tagrec_tpu.data.kg import KnowledgeGraph
    from tagrec_tpu.models.kgat import KGAT

    root, name = _write_synthetic_kg(tmp_path, tiny_graph)
    kg = KnowledgeGraph(tiny_graph, root, name)
    cfg = model_preset("kgat", reg=1e-4, cor_reg=1e-4, agg_type="bi_inter")
    model = KGAT(tiny_graph, cfg, kg=kg)
    params = model.init(jax.random.PRNGKey(9))
    gdev = model.device_data()
    batches = fixed_batches(tiny_graph, n_batches=3, seed=29)

    rd = kg.relation_dict()
    edges = [(rd[r][:, 0], rd[r][:, 1]) for r in range(kg.num_relation)]
    mirror = TM.TorchKGATBiInter(
        edges, np.asarray(params["user"]), np.asarray(params["entity"]),
        np.asarray(params["relation"]), np.asarray(params["transE"]),
        {k: np.asarray(v) for k, v in params["mat"].items()},
        reg=1e-4, cor_reg=1e-4)

    assert_trajectories_close(run_jax(model, params, gdev, batches),
                              run_torch(mirror, batches), rtol=5e-3)

    # TransE phase over the KG triplet set
    rng = np.random.default_rng(31)
    trips = kg.all_triplet
    n_ids = tiny_graph.n_user + kg.num_entity
    tbatches = []
    for _ in range(3):
        sel = rng.integers(0, len(trips), 64)
        neg = rng.integers(0, n_ids, 64)
        tbatches.append(np.concatenate([trips[sel], neg[:, None]],
                                       axis=1).astype(np.int64))

    opt = optax.adam(0.01)
    state = opt.init(params)
    p = params
    ours = []

    @jax.jit
    def step(p, state, batch):
        def total(q):
            return sum(model.transe_loss(q, gdev, batch))

        loss, grads = jax.value_and_grad(total)(p)
        updates, state = opt.update(grads, state, p)
        return optax.apply_updates(p, updates), state, loss

    for b in tbatches:
        p, state, loss = step(p, state, jnp.asarray(b, jnp.int32))
        ours.append(float(loss))

    mirror2 = TM.TorchKGATBiInter(
        edges, np.asarray(params["user"]), np.asarray(params["entity"]),
        np.asarray(params["relation"]), np.asarray(params["transE"]),
        {k: np.asarray(v) for k, v in params["mat"].items()},
        reg=1e-4, cor_reg=1e-4)
    topt = torch.optim.Adam(mirror2.parameters(), lr=0.01)
    ref = []
    for b in tbatches:
        l = mirror2.loss_transe(b)
        topt.zero_grad()
        l.backward()
        topt.step()
        ref.append(float(l.detach()))
    assert_trajectories_close(ours, ref, rtol=5e-3)


def test_tgcn_parity(tiny_graph):
    from tagrec_tpu.models.tgcn import TGCN

    cfg = model_preset("tgcn", reg=1e-4)
    model = TGCN(tiny_graph, cfg)  # static tables (quirk #6 parity mode)
    params = model.init(jax.random.PRNGKey(6))
    gdev = model.device_data()
    batches = fixed_batches(tiny_graph, n_batches=3, seed=19)
    tables = {k: (np.asarray(v[0]), np.asarray(v[1]))
              for k, v in gdev.items() if k in model.REL_ORDER}
    layer_np = []
    for lp in params["layers"]:
        d = {"atten1": {t: {kk: np.asarray(vv) for kk, vv in ap.items()}
                        for t, ap in lp["atten1"].items()}}
        for k in ("U", "q", "p", "bit", "Wf", "bf"):
            d[k] = np.asarray(lp[k])
        d["vec"] = [np.asarray(v) for v in lp["vec"]]
        layer_np.append(d)
    mirror = TM.TorchTGCN([np.asarray(e) for e in params["embed"]],
                          np.asarray(params["weight"]), layer_np, tables,
                          reg=1e-4)

    assert_trajectories_close(run_jax(model, params, gdev, batches),
                              run_torch(mirror, batches), rtol=5e-3)


def test_kgat_two_phase_shared_adam_parity(tiny_graph):
    """Cross-phase shared-Adam semantics (round 5): alternating BPR and
    TransE phases under ONE optimizer must track torch, whose Adam advances a
    parameter's (count, m, v) only on steps where it has a grad
    (com.py:68-86 trains exactly this way).  optim.torch_adam reproduces
    that; the old one-global-count optax.adam mis-scales a phase's first
    bias corrections (~2.3x) and bleeds momentum into zero-grad steps —
    asserted divergent below so this test stays sharp."""
    from tagrec_tpu.models.kgat import KGAT
    from tagrec_tpu.training import optim

    cfg = model_preset("kgat", reg=1e-4, cor_reg=1e-4)
    model = KGAT(tiny_graph, cfg)
    params0 = model.init(jax.random.PRNGKey(5))
    gdev = model.device_data()

    bpr_batches = fixed_batches(tiny_graph, n_batches=6, seed=31)
    rng = np.random.default_rng(17)
    rel = tiny_graph.relation_edges()
    trips = np.concatenate([
        np.stack([rel[k][0], np.full(rel[k].shape[1], k), rel[k][1]], axis=1)
        for k in range(6)])
    n_ids = tiny_graph.n_user + tiny_graph.n_item + tiny_graph.n_tag
    tr_batches = []
    for _ in range(6):
        sel = rng.integers(0, len(trips), 64)
        neg = rng.integers(0, n_ids, 64)
        tr_batches.append(np.concatenate([trips[sel], neg[:, None]],
                                         axis=1).astype(np.int64))
    # epoch-like alternation: 3 BPR, 3 TransE, 3 BPR, 3 TransE
    schedule = ([("bpr", b) for b in bpr_batches[:3]]
                + [("transe", b) for b in tr_batches[:3]]
                + [("bpr", b) for b in bpr_batches[3:]]
                + [("transe", b) for b in tr_batches[3:]])

    def jax_losses(opt):
        state = opt.init(params0)
        p = params0

        @jax.jit
        def step_bpr(p, state, batch):
            def total(q):
                return sum(model.bpr_loss(q, gdev, batch,
                                          key=jax.random.PRNGKey(0)))
            loss, grads = jax.value_and_grad(total)(p)
            updates, state = opt.update(grads, state, p)
            return optax.apply_updates(p, updates), state, loss

        @jax.jit
        def step_tr(p, state, batch):
            def total(q):
                return sum(model.transe_loss(q, gdev, batch))
            loss, grads = jax.value_and_grad(total)(p)
            updates, state = opt.update(grads, state, p)
            return optax.apply_updates(p, updates), state, loss

        out = []
        for kind, b in schedule:
            fn = step_bpr if kind == "bpr" else step_tr
            p, state, loss = fn(p, state, jnp.asarray(b, jnp.int32))
            out.append(float(loss))
        return out

    mirror = TM.TorchKGATDegenerate(
        np.asarray(params0["user"]), np.asarray(params0["entity"]),
        np.asarray(params0["relation"]), np.asarray(params0["transE"]),
        reg=1e-4, cor_reg=1e-4)
    opt = torch.optim.Adam(mirror.parameters(), lr=0.01)
    ref = []
    for kind, b in schedule:
        loss = mirror.loss(b) if kind == "bpr" else mirror.loss_transe(b)
        opt.zero_grad()
        loss.backward()
        opt.step()
        ref.append(float(loss.detach()))

    ours = jax_losses(optim.torch_adam(0.01))
    assert_trajectories_close(ours, ref, rtol=5e-3)
    # sharpness: the global-count optimizer must NOT satisfy the same bound
    stale = np.asarray(jax_losses(optax.adam(0.01)))
    assert np.max(np.abs(stale - np.asarray(ref))
                  / np.maximum(np.abs(ref), 1e-8)) > 5e-3
