"""Per-model production-scale train-step timing on the real chip.

Builds the hetrec-scale synthetic graph, wires the full pipeline for each
requested model (compose.build_pipeline — real samplers, losses, Adam), jits a
whole-epoch lax.scan capped at --steps steps, and reports time/step.

Timing follows DESIGN.md §6: the scan chains steps (step i+1 consumes step i's
params), and the measurement ends with a host transfer of a param leaf, so
pipelined/overlapped dispatch cannot fabricate sub-real times.

Usage:
    python -u experiments/scale_bench.py --models kgat dgcf --steps 30
    python -u experiments/scale_bench.py --cpu --models lightgcn  # smoke test
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="+", default=["lightgcn"])
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n_user", type=int, default=2000)
    ap.add_argument("--n_item", type=int, default=10000)
    ap.add_argument("--n_tag", type=int, default=3000)
    ap.add_argument("--n_edges", type=int, default=400_000)
    ap.add_argument("--hub_budget_mb", type=int, default=None,
                    help="override ops.ell.HUB_BLOCK_BUDGET_BYTES (hybrid "
                         "tier hub-column sweep at 10x scale)")
    ap.add_argument("--eval", action="store_true",
                    help="also run one full-catalog evaluation per model "
                         "(proves the eval path at the probed scale)")
    ap.add_argument("--kg_entities", type=int, default=15_000,
                    help="entity count for the kgat+kg model variant")
    ap.add_argument("--kg_triples", type=int, default=500_000,
                    help="triple count for the kgat+kg model variant")
    ap.add_argument("--edgemap_budget_mb", type=int, default=None,
                    help="override ops.edgemap.EDGEMAP_GATHER_BUDGET_BYTES "
                         "(row-chunk size of the attention-model slot "
                         "gathers at 10x scale)")
    args = ap.parse_args()
    if args.hub_budget_mb is not None:
        from tagrec_tpu.ops import ell
        ell.HUB_BLOCK_BUDGET_BYTES = args.hub_budget_mb << 20
        print(f"hub budget: {args.hub_budget_mb} MB", flush=True)
    if args.edgemap_budget_mb is not None:
        from tagrec_tpu.ops import edgemap
        edgemap.EDGEMAP_GATHER_BUDGET_BYTES = args.edgemap_budget_mb << 20
        print(f"edgemap budget: {args.edgemap_budget_mb} MB", flush=True)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    print(f"backend: {jax.devices()}", flush=True)

    from tagrec_tpu.compose import build_pipeline
    from tagrec_tpu.config import TrainConfig, model_preset
    from tagrec_tpu.data.synthetic import synthetic_graph_large
    from tagrec_tpu.training.train import Trainer

    graph = synthetic_graph_large(n_user=args.n_user, n_item=args.n_item,
                                  n_tag=args.n_tag, n_edges=args.n_edges,
                                  tag_per_inter=0.3, seed=0)
    print(f"graph: {graph.summary()}", flush=True)

    results = {}
    for name in args.models:
        # "kgat+prop" = KGAT with the intended bi-interaction propagation
        # (quirk #3 switched off); bare "kgat" is the shipped-config MF path.
        label, over, kg = name, {}, None
        if name == "kgat+prop":
            name, over = "kgat", {"agg_type": "bi_inter"}
        elif name == "kgat+kg":
            # true-KG mode at the probed scale (bi_inter over a synthetic
            # KG with reversed relations — the bench.py kg_kgat detail's
            # scalable sibling)
            from tagrec_tpu.data.kg import KnowledgeGraph
            name, over = "kgat", {"agg_type": "bi_inter"}
            kg = KnowledgeGraph.synthetic(graph, n_entity=args.kg_entities,
                                          n_triples=args.kg_triples,
                                          n_rela=6, seed=0)
        elif name.endswith("+bf16"):
            name, over = name[:-5], {"adj_dtype": "bf16"}
        mcfg = model_preset(name, reg=1e-4, **over)
        tcfg = TrainConfig(train_batch=args.batch)
        pipe = build_pipeline(graph, mcfg, tcfg, kg=kg)
        phase = pipe.phases[0]
        phase.steps_per_epoch = min(phase.steps_per_epoch, args.steps)
        steps = phase.steps_per_epoch
        trainer = Trainer([phase], tcfg)

        params = pipe.model.init(jax.random.PRNGKey(0))
        opt_state = trainer.init_opt_state(params)
        key = jax.random.PRNGKey(1)
        fn = trainer._epoch_fn(phase)

        t0 = time.time()
        params2, opt_state2, key2, parts = fn(params, opt_state, key,
                                              pipe.gdev, phase.data)
        first_leaf = jax.tree_util.tree_leaves(params2)[0]
        _ = float(np.asarray(first_leaf).ravel()[0])
        compile_s = time.time() - t0
        print(f"[{label}] compile+first-epoch: {compile_s:.1f}s "
              f"({steps} steps)", flush=True)

        t0 = time.time()
        params3, opt_state3, key3, parts = fn(params2, opt_state2, key2,
                                              pipe.gdev, phase.data)
        _ = float(np.asarray(jax.tree_util.tree_leaves(params3)[0]).ravel()[0])
        dt = time.time() - t0
        per_step = dt / steps
        results[label] = per_step
        print(f"[{label}] {per_step*1e3:.2f} ms/step "
              f"({args.batch/per_step:.0f} examples/s) "
              f"loss0={float(np.asarray(parts)[0].sum()):.4f}", flush=True)

        if args.eval:
            t0 = time.time()
            res = pipe.evaluator.run(pipe.model, params3, pipe.gdev)
            dt = time.time() - t0
            assert all(np.isfinite(np.asarray(v)).all()
                       for v in res.values()), res
            print(f"[{label}] eval: {dt:.1f}s "
                  f"ndcg@10={float(np.asarray(res['ndcg'])[0]):.4f}",
                  flush=True)
            results[label + "_eval_ms"] = dt  # RESULT line scales *1e3

    print("RESULT " + json.dumps({k: round(v * 1e3, 2)
                                  for k, v in results.items()}), flush=True)


if __name__ == "__main__":
    main()
