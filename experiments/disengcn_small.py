"""DisenGCN small-scale gap investigation (VERDICT r2 #3 / r3).

Round-2 parity showed small-scale disengcn recall ratios of 0.81/0.99/0.77
(3 seeds, all <= 1.0) while mid scale is fine (mean ~1.08).  Two candidate
causes: (a) a semantics bug that washes out at scale, (b) sampling/seed
variance on a 300-user graph.  Round 3 found and fixed a third: the torch
MIRRORS for the resampling family (dgcf/disengcn/disenhan) omitted the
reference's `reg * l2reg_loss` term (model/disengcn.py:110-130) that ours
applies — the anchors compared different objectives.

This script removes sampling from the equation: identical init, IDENTICAL
batches (mirror protocol, generated once in numpy), train both sides for
--epochs full epochs, evaluate both through the SAME numpy metric protocol
after every epoch.  If losses track and per-epoch metrics agree, whatever
ratio noise remains in parity_results.json is sampling variance, not
semantics.

Usage: python -u experiments/disengcn_small.py --epochs 5 [--model disengcn]
(CPU-forced; does not touch the TPU.)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--seed", type=int, default=2020)
    ap.add_argument("--model", default="disengcn",
                    choices=["disengcn", "dgcf", "disenhan"])
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax
    import torch
    import torch_mirrors as TM

    from experiments.parity import build_scale_graph, eval_scores, _neg
    from tagrec_tpu.config import model_preset
    from tagrec_tpu.models import MODEL_REGISTRY

    graph = build_scale_graph("small")
    seed = args.seed
    torch.manual_seed(seed)
    rng = np.random.default_rng(seed)

    mcfg = model_preset(args.model, reg=1e-4)
    model = MODEL_REGISTRY[args.model](graph, mcfg)
    params = model.init(jax.random.PRNGKey(seed))
    gdev = model.device_data()

    if args.model == "disengcn":
        mirror = TM.TorchDisenGCN(
            graph, [np.asarray(e) for e in params["embed"]],
            [{k: np.asarray(v) for k, v in lp.items()}
             for lp in params["layers"]], reg=1e-4)
    elif args.model == "disenhan":
        mirror = TM.TorchDisenHAN(
            graph, [np.asarray(e) for e in params["embed"]],
            [{k: np.asarray(v) for k, v in lp.items()}
             for lp in params["layers"]], reg=1e-4)
    else:
        mirror = TM.TorchDGCF(graph,
                              [np.asarray(e) for e in params["embed"]],
                              reg=1e-4)

    train_ui = graph.user_items["train"]
    test_ui = graph.user_items["test"]
    users = sorted(test_ui.keys())
    train_users = sorted(train_ui.keys())
    edges = graph.edge_index["train"]
    steps = len(edges) // 512 + 1

    # identical batches, mirror protocol (per-step user resampling)
    all_batches = []
    for _ in range(args.epochs):
        ep = []
        for _ in range(steps):
            u = rng.choice(train_users, 512)
            p = np.array([rng.choice(train_ui[x]) for x in u])
            n = [_neg(rng, train_ui[x], graph.n_item) for x in u]
            ep.append(np.stack([u, p, np.array(n)], 1).astype(np.int64))
        all_batches.append(ep)

    # ---- ours
    opt = optax.adam(0.01)
    state = opt.init(params)

    @jax.jit
    def step(p, s, batch):
        def total(q):
            return sum(model.bpr_loss(q, gdev, batch,
                                      key=jax.random.PRNGKey(0)))
        loss, grads = jax.value_and_grad(total)(p)
        upd, s = opt.update(grads, s, p)
        return optax.apply_updates(p, upd), s, loss

    def eval_ours(p):
        embs = model.forward(p, gdev, training=False)
        scores = np.asarray(jax.nn.sigmoid(
            jnp.take(embs[0], jnp.asarray(users), axis=0) @ embs[1].T))
        return eval_scores(scores, users, train_ui, test_ui)

    # ---- mirror
    topt = torch.optim.Adam(mirror.parameters(), lr=0.01)

    def eval_mirror():
        with torch.no_grad():
            if args.model == "disenhan":
                U, I, _ = mirror.forward()
            else:
                fin = mirror.forward()
                U = fin[: graph.n_user]
                I = fin[graph.n_user: graph.n_user + graph.n_item]
            scores = torch.sigmoid(U[torch.tensor(users)] @ I.T).numpy()
        return eval_scores(scores, users, train_ui, test_ui)

    print(f"model={args.model} seed={seed} steps/epoch={steps}", flush=True)
    t0 = time.time()
    for ep, batches in enumerate(all_batches):
        diffs = []
        for b in batches:
            params, state, jl = step(params, state, jnp.asarray(b, jnp.int32))
            tl = mirror.loss(b)
            topt.zero_grad()
            tl.backward()
            topt.step()
            diffs.append(abs(float(jl) - float(tl)) / max(abs(float(tl)),
                                                          1e-9))
        ro = eval_ours(params)
        rm = eval_mirror()
        print(f"[ep {ep}] max_rel_loss_diff={max(diffs):.2e}  "
              f"ours r@20={ro['recall@20']:.4f} n@20={ro['ndcg@20']:.4f}  "
              f"mirror r@20={rm['recall@20']:.4f} n@20={rm['ndcg@20']:.4f}  "
              f"ratio r={ro['recall@20']/max(rm['recall@20'],1e-9):.3f} "
              f"n={ro['ndcg@20']/max(rm['ndcg@20'],1e-9):.3f}",
              flush=True)
    print(f"done in {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
