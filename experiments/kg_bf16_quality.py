"""Quality gate for the true-KG KGAT bf16 score planes (DESIGN.md §8).

The dense rel-id tier runs its [chunk, N] relation score planes in bf16 when
``adj_dtype="bf16"`` (165 -> 107ms measured).  bf16 perturbs attention
logits at ~3 significant digits and gradients flow through them, so the
perf default stays opt-in until this run shows the end metrics track f32.

Protocol: hetrec-scale graph + synthetic KG (the BENCH shape: 15k entities,
1.6M directed triples incl. reverses), identical seed/init/batches, short
reference-protocol training (eval every 2 epochs) for f32 vs bf16; compare
best recall@20 / ndcg@20.  Mirrors the lightgcn/ngcf bf16 adjacency gate
(PARITY.md bf16 table).

Usage: python -u experiments/kg_bf16_quality.py [--epochs 6] [--cpu]
Writes: experiments/kg_bf16_quality.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(graph, kg, adj_dtype, epochs, seed=3030):
    import jax
    from tagrec_tpu.compose import build_pipeline
    from tagrec_tpu.config import TrainConfig, model_preset
    from tagrec_tpu.training.early_stop import EarlyStop
    from tagrec_tpu.training.train import Trainer

    mcfg = model_preset("kgat", reg=1e-4, agg_type="bi_inter",
                        adj_dtype=adj_dtype)
    tcfg = TrainConfig(train_batch=512, test_batch=256, epochs=epochs,
                       test_interval=2, patient_epoch=10, lr=0.01, seed=seed)
    pipe = build_pipeline(graph, mcfg, tcfg, kg=kg)
    # cap the per-epoch scan length: the full 625-step BPR scan crashed the
    # TPU worker once (tunnel instability at long dense-KG scans); the
    # f32-vs-bf16 comparison is ratio-based so an identical cap on both
    # sides keeps it valid while cutting runtime ~3x
    for ph in pipe.phases:
        ph.steps_per_epoch = min(ph.steps_per_epoch, 200)
    params = pipe.model.init(jax.random.PRNGKey(seed))
    trainer = Trainer(pipe.phases, tcfg)
    stop = EarlyStop(tcfg.patient_epoch, tcfg.early_stop_key)
    t0 = time.time()
    trainer.run(params, jax.random.PRNGKey(seed + 1), pipe.evaluator,
                pipe.model, pipe.gdev, stop,
                log=lambda *a: print(*a, flush=True))
    best = stop.best_result
    return {"recall@20": best["recall"][1], "ndcg@20": best["ndcg"][1],
            "ndcg@10": best["ndcg"][0], "best_epoch": stop.best_epoch,
            "train_s": round(time.time() - t0, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--seeds", type=int, nargs="+", default=[3030])
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="experiments/kg_bf16_quality.json")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from tagrec_tpu.data.kg import KnowledgeGraph
    from tagrec_tpu.data.synthetic import synthetic_graph_large

    graph = synthetic_graph_large(n_user=2000, n_item=10000, n_tag=3000,
                                  n_edges=400_000, tag_per_inter=0.3, seed=0)
    kg = KnowledgeGraph.synthetic(graph, n_entity=15_000, n_triples=500_000,
                                  n_rela=6, seed=0)
    print(f"kg: {kg.num_entity} entities, {kg.num_relation} relations, "
          f"{len(kg.all_triplet)} triples", flush=True)

    out = {}
    if os.path.exists(args.out):
        out = json.load(open(args.out))
    # legacy single-seed layout {dt: {...}} -> {dt: {"3030": {...}}}
    for dt in list(out):
        if "recall@20" in out[dt]:
            out[dt] = {"3030": out[dt]}
    for seed in args.seeds:
        for dt in ("f32", "bf16"):
            cell = out.setdefault(dt, {})
            if str(seed) in cell:
                print(f"[{dt}/s{seed}] cached: {cell[str(seed)]}", flush=True)
                continue
            print(f"=== true-KG kgat adj_dtype={dt} seed={seed} ===",
                  flush=True)
            cell[str(seed)] = run(graph, kg, dt, args.epochs, seed=seed)
            print(dt, seed, cell[str(seed)], flush=True)
            with open(args.out, "w") as f:
                json.dump(out, f, indent=2, default=float)
    for k in ("recall@20", "ndcg@20"):
        f32 = [v[k] for v in out.get("f32", {}).values()]
        b16 = [v[k] for v in out.get("bf16", {}).values()]
        if f32 and b16:
            import statistics as st
            r = st.mean(b16) / max(st.mean(f32), 1e-9)
            print(f"{k}: f32 mean={st.mean(f32):.5f} "
                  f"[{min(f32):.5f}..{max(f32):.5f}] "
                  f"bf16 mean={st.mean(b16):.5f} "
                  f"[{min(b16):.5f}..{max(b16):.5f}] "
                  f"mean ratio={r:.3f}", flush=True)


if __name__ == "__main__":
    main()
