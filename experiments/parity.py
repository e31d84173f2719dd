"""Quality-parity runs: tagrec_tpu vs torch mirrors of the reference semantics.

Trains both implementations to early stop on the same synthetic tag graph with
the reference protocol (eval every 5 epochs, patience 10 on NDCG@10, batch 512,
Adam lr 0.01 — utility/utils.py defaults) and records best recall@20 / NDCG@20.
The reference publishes no numbers (BASELINE.md), so anchors are produced by
the mirror and parity is measured against them.

Scales (--scale):
  small  — 300u/800i/120t, ~6k inter (round-1 protocol)
  mid    — 800u/3000i/1000t, 60k inter (the largest the torch-CPU mirror can
           train for the routing/attention models on this machine's 2 cores)
  hetrec — 2000u/10000i/3000t, 400k inter (the BENCH graph; reference protocol
           scale, training/basic_test.py:16-48)

Multi-seed: pass --seeds 2020 2021 2022; results are stored per seed and
PARITY.md reports mean and spread.  --adj_dtype bf16 runs ours with the bf16
adjacency for the quality check that decides the prod default.

Usage:  python experiments/parity.py --scale hetrec --models lightgcn --side ours
Writes: PARITY.md + experiments/parity_results.json (nested scale/model/seed)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

import numpy as np


def eval_scores(scores: np.ndarray, users, train_ui, test_ui, topks=(10, 20)):
    """Reference metric protocol on a [B, I] score matrix (numpy oracles)."""
    from tagrec_tpu.ops import metrics as M

    scores = scores.copy()
    for b, u in enumerate(users):
        if u in train_ui:
            scores[b, train_ui[u]] = -1024.0
    topk = np.argsort(-scores, axis=1)[:, : max(topks)]
    tl = [test_ui[u] for u in users]
    label = M.ref_get_label(tl, topk)
    out = {}
    for k in topks:
        d = M.ref_pre_rec_k(label, tl, k)
        out[f"recall@{k}"] = d["recall"] / len(users)
        out[f"ndcg@{k}"] = M.ref_ndcg_k(label, tl, k) / len(users)
    return out


def run_ours(graph, name, epochs, seed=2020, adj_dtype="f32",
             transe_sampler="full_pass"):
    import jax
    from tagrec_tpu.compose import build_pipeline
    from tagrec_tpu.config import TrainConfig, model_preset
    from tagrec_tpu.training.early_stop import EarlyStop
    from tagrec_tpu.training.train import Trainer

    mcfg = model_preset(name, reg=1e-4, adj_dtype=adj_dtype,
                        transe_sampler=transe_sampler)
    tcfg = TrainConfig(train_batch=512, test_batch=256, epochs=epochs,
                       test_interval=5, patient_epoch=10, lr=0.01, seed=seed)
    pipe = build_pipeline(graph, mcfg, tcfg)
    params = pipe.model.init(jax.random.PRNGKey(seed))
    trainer = Trainer(pipe.phases, tcfg)
    stop = EarlyStop(tcfg.patient_epoch, tcfg.early_stop_key)
    t0 = time.time()
    trainer.run(params, jax.random.PRNGKey(seed + 1), pipe.evaluator,
                pipe.model, pipe.gdev, stop, log=lambda *a: None)
    best = stop.best_result
    return {"recall@20": best["recall"][1], "ndcg@20": best["ndcg"][1],
            "ndcg@10": best["ndcg"][0], "best_epoch": stop.best_epoch,
            "train_s": round(time.time() - t0, 1)}


def run_mirror(graph, name, epochs, seed=2020, transe_sampler="full_pass"):
    """Train the torch mirror with the reference training protocol.

    ``transe_sampler="reference_windows"`` makes the kgat mirror reproduce
    quirk #5 exactly (never-shuffled triples, [i:i+batch] windows stepping
    by 1) — the faithful-mirror counterpart of ours' kgat preset default."""
    import torch
    import jax
    import torch_mirrors as TM
    from tagrec_tpu.config import model_preset
    from tagrec_tpu.models import MODEL_REGISTRY

    torch.manual_seed(seed)
    rng = np.random.default_rng(seed)
    # identical init as ours, via the jax model's init
    mcfg = model_preset(name, reg=1e-4)
    jm = MODEL_REGISTRY[name](graph, mcfg)
    jparams = jm.init(jax.random.PRNGKey(seed))

    if name == "lightgcn":
        mirror = TM.TorchLightGCN(graph, [np.asarray(e) for e in jparams["embed"]],
                                  reg=1e-4)
    elif name == "ngcf":
        mirror = TM.TorchNGCF(graph, [np.asarray(e) for e in jparams["embed"]],
                              {k: np.asarray(v) for k, v in jparams["mat"].items()},
                              reg=1e-4)
    elif name == "dgcf":
        mirror = TM.TorchDGCF(graph, [np.asarray(e) for e in jparams["embed"]])
    elif name == "disengcn":
        mirror = TM.TorchDisenGCN(
            graph, [np.asarray(e) for e in jparams["embed"]],
            [{k: np.asarray(v) for k, v in lp.items()}
             for lp in jparams["layers"]])
    elif name == "disenhan":
        mirror = TM.TorchDisenHAN(
            graph, [np.asarray(e) for e in jparams["embed"]],
            [{k: np.asarray(v) for k, v in lp.items()}
             for lp in jparams["layers"]])
    elif name == "kgat":
        mirror = TM.TorchKGATDegenerate(
            np.asarray(jparams["user"]), np.asarray(jparams["entity"]),
            np.asarray(jparams["relation"]), np.asarray(jparams["transE"]),
            reg=1e-4, cor_reg=1e-4)
    elif name == "tgcn":
        tables = {k: (np.asarray(v[0]), np.asarray(v[1]))
                  for k, v in jm.device_data().items()
                  if k in jm.REL_ORDER}
        layer_np = []
        for lp in jparams["layers"]:
            d = {"atten1": {t: {kk: np.asarray(vv) for kk, vv in ap.items()}
                            for t, ap in lp["atten1"].items()}}
            for k in ("U", "q", "p", "bit", "Wf", "bf"):
                d[k] = np.asarray(lp[k])
            d["vec"] = [np.asarray(v) for v in lp["vec"]]
            layer_np.append(d)
        mirror = TM.TorchTGCN([np.asarray(e) for e in jparams["embed"]],
                              np.asarray(jparams["weight"]), layer_np, tables,
                              reg=1e-4)
    else:
        raise ValueError(name)

    opt = torch.optim.Adam(mirror.parameters(), lr=0.01)
    train_ui = graph.user_items["train"]
    test_ui = graph.user_items["test"]
    edges = graph.edge_index["train"]
    users = sorted(test_ui.keys())
    train_users = sorted(train_ui.keys())

    def evaluate():
        with torch.no_grad():
            if name == "kgat":
                scores = mirror.forward_scores(users)
            elif name in ("tgcn", "disenhan"):
                U, I, _ = mirror.forward()
                scores = torch.sigmoid(U[torch.tensor(users)] @ I.T).numpy()
            else:
                fin = mirror.forward()
                nu, ni = graph.n_user, graph.n_item
                U, I = fin[: nu], fin[nu: nu + ni]
                scores = torch.sigmoid(U[torch.tensor(users)] @ I.T).numpy()
        return eval_scores(scores, users, train_ui, test_ui)

    # second-phase triples
    if name == "kgat":
        rel = graph.relation_edges()
        trips = np.concatenate([
            np.stack([rel[k][0], np.full(rel[k].shape[1], k), rel[k][1]], 1)
            for k in range(6)])
        n_tail_ids = graph.n_user + graph.n_item + graph.n_tag
        trip_pos = {}
        for h, r, t in trips:
            trip_pos.setdefault((h, r), set()).add(t)
    elif name == "tgcn":
        trips = graph.uit_data[:, [0, 2, 1]].astype(np.int64)
        n_tail_ids = graph.n_item
        trip_pos = {}
        for h, r, t in trips:
            trip_pos.setdefault((h, r), set()).add(t)

    best, best_val, stale, best_ep = None, -1.0, 0, 0
    t0 = time.time()
    for ep in range(epochs):
        if name in ("lightgcn", "ngcf", "kgat", "tgcn"):  # BPR full pass
            perm = rng.permutation(len(edges))
            batches = [perm[i:i + 512] for i in range(0, len(edges) - 511, 512)]
            batch_arrays = []
            for sel in batches:
                u, i = edges[sel, 0], edges[sel, 1]
                negs = [_neg(rng, train_ui[x], graph.n_item) for x in u]
                batch_arrays.append(np.stack([u, i, np.array(negs)], 1))
        else:  # DGCF-family per-step user resampling
            steps = len(edges) // 512 + 1
            batch_arrays = []
            for _ in range(steps):
                u = rng.choice(train_users, 512)
                p = np.array([rng.choice(train_ui[x]) for x in u])
                negs = [_neg(rng, train_ui[x], graph.n_item) for x in u]
                batch_arrays.append(np.stack([u, p, np.array(negs)], 1))
        for b in batch_arrays:
            loss = mirror.loss(b.astype(np.int64))
            opt.zero_grad()
            loss.backward()
            opt.step()
        if name in ("kgat", "tgcn"):  # phase 2: triple pass
            bsz = 1024 if name == "kgat" else 512
            windows = name == "kgat" and transe_sampler == "reference_windows"
            if windows:  # quirk #5: unshuffled overlapping prefix windows
                starts = range(len(trips) // bsz)
                take = lambda i: trips[i:i + bsz]
            else:  # full shuffled pass
                perm = rng.permutation(len(trips))
                starts = range(0, max(len(trips) - bsz + 1, 1), bsz)
                take = lambda i: trips[perm[i:i + bsz]]
            for i in starts:
                tb = take(i)
                negs = np.array([_neg_triple(rng, trip_pos[(h, r)], n_tail_ids)
                                 for h, r, _ in tb])
                tb4 = np.concatenate([tb, negs[:, None]], 1).astype(np.int64)
                if name == "kgat":
                    l2 = mirror.loss_transe(tb4)
                else:
                    l2 = TM.tgcn_transtag_loss(mirror, tb4)
                opt.zero_grad()
                l2.backward()
                opt.step()
        if ep % 5 == 0:
            res = evaluate()
            if res["ndcg@10"] > best_val:
                best_val, best, best_ep, stale = res["ndcg@10"], res, ep, 0
            else:
                stale += 1
            if stale > 10:
                break
    return {"recall@20": best["recall@20"], "ndcg@20": best["ndcg@20"],
            "ndcg@10": best["ndcg@10"], "best_epoch": best_ep,
            "train_s": round(time.time() - t0, 1)}


def _neg(rng, pos, n):
    while True:
        j = int(rng.integers(0, n))
        if j not in pos:
            return j


def _neg_triple(rng, pos_set, n):
    while True:
        j = int(rng.integers(0, n))
        if j not in pos_set:
            return j


SCALES = {
    "small": dict(kind="small", n_user=300, n_item=800, n_tag=120, avg_deg=20),
    "mid": dict(kind="large", n_user=800, n_item=3000, n_tag=1000,
                n_edges=60_000, tag_per_inter=0.3),
    "hetrec": dict(kind="large", n_user=2000, n_item=10000, n_tag=3000,
                   n_edges=400_000, tag_per_inter=0.3),
}


def _deep_merge(base: dict, add: dict) -> dict:
    """Merge ``add`` into ``base`` (add wins on leaves).  Used to re-read the
    results file before every write so concurrent ours/mirror runs (separate
    processes, disjoint keys) don't wipe each other's results."""
    for k, v in add.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            _deep_merge(base[k], v)
        else:
            base[k] = v
    return base


def _deep_adopt(base: dict, add: dict) -> dict:
    """Merge ``add`` into ``base`` IN PLACE with ``base`` winning on leaves
    and existing sub-dicts never replaced.  main() must use this (not
    _deep_merge, which returns a NEW root): rebinding ``results`` orphans the
    loop's live ``sc``/``r`` references, which silently dropped every
    seed-after-the-first per model from the written file (round-3 bug: all
    hetrec s2022 ours cells lost; recovered from logs)."""
    for k, v in add.items():
        if k not in base:
            base[k] = v
        elif isinstance(v, dict) and isinstance(base[k], dict):
            _deep_adopt(base[k], v)
        # else: keep base's (fresher, in-memory) leaf
    return base


def build_scale_graph(scale: str):
    from tagrec_tpu.data.synthetic import synthetic_graph, synthetic_graph_large

    s = dict(SCALES[scale])
    kind = s.pop("kind")
    if kind == "small":
        return synthetic_graph(seed=0, **s)
    return synthetic_graph_large(seed=0, **s)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="+",
                    default=["lightgcn", "ngcf", "dgcf"])
    ap.add_argument("--epochs", type=int, default=120)
    ap.add_argument("--scale", choices=sorted(SCALES), default="small")
    ap.add_argument("--seeds", type=int, nargs="+", default=[2020])
    ap.add_argument("--adj_dtype", choices=["f32", "bf16"], default="f32",
                    help="ours-side adjacency dtype (bf16 quality check); "
                         "bf16 results are stored under key 'tagrec_tpu_bf16'")
    ap.add_argument("--transe_sampler", choices=["full_pass",
                                                 "reference_windows"],
                    default="full_pass",
                    help="ours-side KGAT TransE sampler (quirk #5 A/B); "
                         "windows results go under 'tagrec_tpu_winsampler'")
    ap.add_argument("--out", default="experiments/parity_results.json")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (leave the TPU chip free)")
    ap.add_argument("--side", choices=["ours", "mirror", "both"],
                    default="both")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    graph = build_scale_graph(args.scale)
    ours_key = "tagrec_tpu" if args.adj_dtype == "f32" else "tagrec_tpu_bf16"
    if args.transe_sampler == "reference_windows":
        ours_key = "tagrec_tpu_winsampler"

    results = {}
    if os.path.exists(args.out):
        results = json.load(open(args.out))
    # round-1 file layout was {model: {...}} at small scale; nest it
    if results and "small" not in results and not any(
            k in SCALES for k in results):
        results = {"small": {m: {"2020": r} for m, r in results.items()}}

    for name in args.models:
        sc = results.setdefault(args.scale, {}).setdefault(name, {})
        for seed in args.seeds:
            r = sc.setdefault(str(seed), {})
            if args.side in ("ours", "both") and ours_key not in r:
                print(f"=== {args.scale}/{name}/s{seed}: ours "
                      f"({args.adj_dtype}) ===", flush=True)
                ours = run_ours(graph, name, args.epochs, seed=seed,
                                adj_dtype=args.adj_dtype,
                                transe_sampler=args.transe_sampler)
                print(name, "ours:", ours, flush=True)
                r[ours_key] = ours
            mirror_key = ("reference_mirror_winsampler"
                          if args.transe_sampler == "reference_windows"
                          else "reference_mirror")
            if args.side in ("mirror", "both") and mirror_key not in r:
                print(f"=== {args.scale}/{name}/s{seed}: torch mirror "
                      f"({args.transe_sampler}) ===", flush=True)
                ref = run_mirror(graph, name, args.epochs, seed=seed,
                                 transe_sampler=args.transe_sampler)
                print(name, "mirror:", ref, flush=True)
                r[mirror_key] = ref
            if "tagrec_tpu" in r and "reference_mirror" in r:
                o, m = r["tagrec_tpu"], r["reference_mirror"]
                r["recall20_ratio"] = round(o["recall@20"] /
                                            max(m["recall@20"], 1e-9), 3)
                r["ndcg20_ratio"] = round(o["ndcg@20"] /
                                          max(m["ndcg@20"], 1e-9), 3)
            on_disk = {}
            if os.path.exists(args.out):
                try:
                    on_disk = json.load(open(args.out))
                except json.JSONDecodeError:
                    pass
            _deep_adopt(results, on_disk)  # in place: sc/r stay live
            with open(args.out, "w") as f:
                json.dump(results, f, indent=2, default=float)

    if os.path.basename(args.out) == "parity_results.json":
        write_parity_md(results)
        print("wrote PARITY.md", flush=True)
    else:
        # side files (e.g. parity_kgat48.json) must not clobber the main
        # PARITY.md tables — regenerate from the canonical results file only
        print(f"side out {args.out}: PARITY.md left untouched", flush=True)


def write_parity_md(results, path="PARITY.md"):
    lines = [
        "# PARITY — tagrec_tpu vs reference-semantics torch mirrors\n",
        "Protocol: same synthetic tag graph per scale, same init, reference "
        "training protocol (batch 512, Adam lr 0.01, eval every 5 epochs, "
        "patience 10 on NDCG@10).  Scales: small = 300u/800i/120t "
        "(120-epoch budget, round 1); mid = 800u/3000i/1000t/60k; "
        "hetrec = 2000u/10000i/3000t/400k (the BENCH graph; 16-epoch budget "
        "both sides — at 100-600 optimizer steps/epoch every model's NDCG@10 "
        "peaks within the first few evals).  Multi-seed rows show mean "
        "[min..max] over seeds.  The `status` column says what each cell "
        "still needs: done = >= 1 mirror anchor AND >= 1 ours run at this "
        "scale; pending-mirror / pending-ours name the missing side.\n",
        "Evidence notes:",
        "* Step-level ground truth is tests/test_parity_torch.py: identical "
        "init + identical batches -> loss-trajectory agreement (rtol <= 5e-3 "
        "over multiple Adam steps) for all seven models (dgcf/disengcn/"
        "disenhan on the FULL loss incl. the reg term as of round 3) plus "
        "KGAT bi_inter and true-KG modes.  The end-metric ratios here "
        "measure the residual effect of the documented sampling deviations "
        "+ run variance.",
        "* ROUND-3 MIRROR FIX: the resampling-family mirrors (dgcf/disengcn/"
        "disenhan) omitted the reference's `reg * l2reg_loss` term "
        "(model/disengcn.py:110-130 keeps it; ours always trained with it). "
        "Mirror anchors re-measured with the fixed mirrors: small "
        "disengcn/dgcf (all seeds); mid s2020 REFRESHED r5 for disenhan "
        "(0.1534 vs pre-fix 0.1585 — within 3%, the ~1e-4 magnitude "
        "argument confirmed) and disengcn (0.0605 vs pre-fix [0.0719.."
        "0.0757] — a larger move, consistent with that model's chaotic "
        "mid-scale spread: ours' own 3-seed range is 1.4x wide).  The dgcf "
        "mid refresh (~6 h of CPU) did not fit the round; its small-scale "
        "reg-fixed anchors (all seeds) + the r5 reference-actual validation "
        "(mirror/actual 1.024) stand in.",
        "* Chaotic-variance ground truth (experiments/disengcn_small.py): "
        "with IDENTICAL init and IDENTICAL batches, ours-vs-mirror losses "
        "agree to 1.6e-4 over epoch 0, then fp drift compounds and the "
        "per-epoch metric ratios swing 0.85..1.35 on the 300-user graph — "
        "single-seed end-metric ratios at small scale are noise; judge the "
        "mean and the [min..max] spread, not cells.",
        "* The torch mirrors run on this machine's 2 CPU cores; at hetrec "
        "scale lightgcn/ngcf/kgat mirrors cost 0.5-6 h each (measured) and "
        "the routing/attention mirrors (dgcf/disengcn/disenhan/tgcn) are "
        "infeasible (1-5 h/epoch), so their ours-vs-mirror ratios are "
        "measured at mid scale (the largest mirror-tractable size); "
        "ours-side results at hetrec scale are reported for all 7 models.",
        "* hetrec kgat/ngcf/lightgcn run the 16-epoch budget and peak at the "
        "FIRST eval (best_epoch 0) — those anchors compare early-training "
        "quality and inherit the chaotic variance above.  kgat is the "
        "noisiest cell: absolute recall ~0.01 (the shipped-config KGAT is "
        "degenerate MF, quirk #3) and the MIRROR's own 3-seed spread "
        "[0.0079..0.0128] is 1.6x wide, overlapping ours [0.0068..0.0088] "
        "— pre-r5 per-seed ratios 0.69/0.67/0.86 (0.82 mean after the r5 "
        "optimizer fix).  kgat parity where training progresses: mid "
        "1.00 (r5), small 0.98.",
        "* ROUND-4 ROOT CAUSE of the kgat hetrec cell: quirk #5 is a large "
        "QUALITY lever, not noise.  The reference's TransE sampler covers "
        "only ~N//B + B overlapping prefix triples per epoch (never "
        "shuffled) — a deliberately weak TransE phase.  Ours and the mirror "
        "both ran a FULL shuffled TransE pass (the 'fix'), whose strong "
        "TransE gradient fights the BPR signal at hetrec scale: recall "
        "0.0076-0.0088 and best_epoch 0 for BOTH, hence the ~0.72 ratio "
        "measured mirror-vs-ours under matching non-reference semantics.  "
        "Reproducing quirk #5 (transe_sampler=reference_windows, now the "
        "kgat preset default) lets training progress (best_epoch 15) and "
        "lifts recall ~3.4x (quirk-#5 A/B table below); the faithful anchor "
        "is ours(windows) vs reference (actual) — hetrec table.  The "
        "covered prefix is IDENTICAL in distribution on both sides "
        "(verified r4: ours' relation-0-first, user-sorted triple order "
        "covers edges of users 0-12 at hetrec — exactly the subset the "
        "reference's create_edge() order covers), so the windows sampler "
        "is not a residual parity variable.  At mid scale — where training "
        "progresses past the chaotic first evals — the quirk-faithful pair "
        "AGREES: ours(windows) 0.1535 vs win-mirror 0.1568, ratio 0.979 "
        "(0.995 re-measured under the r5 optimizer fix) "
        "(vs 0.928 for the full_pass pair).  At hetrec the reference forms "
        "a TIGHT 3-seed cluster (recall 0.0463/0.0467/0.0473, always "
        "best_epoch 0) that sat ~1.6x above the PRE-r5 ours(windows) "
        "[0.0264..0.0296, best_epoch 15] — systematic, not seed noise.  "
        "Mechanisms verified "
        "EQUAL r4: per-step math (loss-trajectory tests), xavier fan "
        "semantics incl. 3-D transE, phase order (BPR then TransE, one "
        "shared Adam), steps/epoch, eval interval, negative spaces, quirk-#5 "
        "coverage.  What remained open was the 16-epoch hetrec early regime "
        "of THIS one model — resolved in round 5 (next note).",
        "* ROUND-5 RESOLUTION of the kgat hetrec cell — the residual was "
        "OPTIMIZER SEMANTICS, found via the r4 discriminator.  The hetrec "
        "win-mirror ran: recall 0.0687 @ best_epoch 0 — same side and same "
        "peak-at-first-eval shape as the reference (0.0463-0.0473 @ 0), "
        "while ours peaked late and low => a jax-side early-dynamics "
        "difference.  Root cause: the reference trains both phases under "
        "ONE torch.optim.Adam whose per-parameter state advances ONLY on "
        "steps where the parameter has a grad (lazy init + grad-None skip); "
        "the shared optax.adam kept one GLOBAL step count, so after the "
        "~780-step BPR phase the TransE tensors' first updates saw t=781 "
        "instead of t=1 — bias-correction mis-scale ~2.3x — and decayed "
        "momentum kept bleeding into zero-grad steps.  Fix: "
        "training/optim.py::torch_adam (per-leaf lazy count/m/v, "
        "participation-gated; bit-identical to optax.adam for single-phase "
        "models), now the default (TrainConfig.adam_impl).  Verified at "
        "step level by a new interleaved-phase trajectory test "
        "(tests/test_parity_torch.py::test_kgat_two_phase_shared_adam_"
        "parity, rtol 5e-3; the global-count optimizer is asserted "
        "divergent).  Measured at hetrec: ours(windows) eval-0 recall "
        "0.0409 -> 0.0589 and the 3-seed cells below are re-measured under "
        "torch_adam — ours [0.0589..0.0680], ALL best_epoch 0, vs "
        "reference-actual [0.0463..0.0473] and the 3-seed win-mirror "
        "[0.0618..0.0687] (also all best_epoch 0): ours now sits INSIDE the "
        "two-torch-implementation band with matching dynamics — per-seed "
        "windows/win-mirror 0.86/0.88/1.10 (mean 0.94), ours/actual "
        "1.27-1.44, mirror/actual spread up to 1.48.  The pre-fix '1.6x deficit' was this optimizer effect "
        "compounded by best-by-ndcg@10 selection across opposite-signed "
        "early trajectories.  Longer budgets only widen ours' lead: 48 "
        "epochs reaches recall [0.0675..0.0722] @ ep45 over 3 seeds under "
        "torch_adam (parity_r5_win48.json) and 120 epochs reaches 0.0981 @ "
        "ep110, ndcg@10 0.3225, still climbing at the budget end "
        "(parity_r5_win120.json) — 1.5x / 2.1x the reference's best recall "
        "and 3.1x its best ndcg@10 on its own quirk-faithful protocol.  "
        "kgat/tgcn cells in all tables are "
        "re-measured under torch_adam (experiments/parity_r5_*.json); "
        "single-phase models are mathematically unaffected.",
        "* bf16 verdict: quality-neutral at hetrec scale (table below) but "
        "only ~5% faster after sector blocking -> stays opt-in "
        "(ModelConfig.adj_dtype).",
        "* ROUND-4 ACTUAL-REFERENCE ANCHORS: experiments/run_reference.py "
        "exports the parity graphs to the reference's file format and runs "
        "/root/reference itself on CPU (quirk #13 collections shim + numpy-2 "
        "np.int alias + builtins stubs for com.py's dangling DTAG* names — "
        "the reference is unrunnable as shipped).  `reference (actual)` "
        "tables below validate the mirrors end-to-end.  Same protocol "
        "(xavier init, Adam lr 0.01, batch 512, reg 1e-4, patience 10 on "
        "ndcg@10) but independent RNG streams, so best_epoch dynamics "
        "differ; end metrics are the comparison.",
        "* Negative-sampling A/B (VERDICT r3): the on-device masked re-draw "
        "sampler (rounds=16) measured 0/200,704 collisions for BPR "
        "negatives AND 0/200,704 for TransE corrupted tails at hetrec scale "
        "-> distributionally identical to the reference's exact rejection "
        "loop; the sampler is not a parity variable.",
        "* Real hetrec2011 data: ENVIRONMENT-BLOCKED.  The delicious/lastfm/"
        "movielens `.dat` dumps are not present anywhere in this zero-egress "
        "image (searched r5), so data/preprocess.py — which implements the "
        "reference's exact semantics (tag min-counts 15/5/5, id maps, 80/20 "
        "per-user split) and is tested on synthetic fixtures "
        "(tests/test_preprocess.py) — has never run on the real dumps.  All "
        "scales here are synthetic graphs with hetrec-matched shape/sparsity."
        "\n",
    ]
    for scale in ("small", "mid", "hetrec"):
        if scale not in results:
            continue
        lines += [f"\n## {scale}\n",
                  "| model | ours/mirror seeds | ours recall@20 | "
                  "mirror recall@20 | ours ndcg@20 | mirror ndcg@20 | "
                  "recall ratio | ndcg ratio | status |",
                  "|---|---|---|---|---|---|---|---|---|"]
        for name, sc in sorted(results[scale].items()):
            o_r, m_r, o_n, m_n = [], [], [], []
            for seed, r in sorted(sc.items()):
                if "tagrec_tpu" in r:
                    o_r.append(r["tagrec_tpu"]["recall@20"])
                    o_n.append(r["tagrec_tpu"]["ndcg@20"])
                if "reference_mirror" in r:
                    m_r.append(r["reference_mirror"]["recall@20"])
                    m_n.append(r["reference_mirror"]["ndcg@20"])

            def fmt(xs):
                if not xs:
                    return "—"
                m = sum(xs) / len(xs)
                if len(xs) == 1:
                    return f"{m:.4f}"
                return f"{m:.4f} [{min(xs):.4f}..{max(xs):.4f}]"

            if m_r and o_r:
                rr = (sum(o_r) / len(o_r)) / max(sum(m_r) / len(m_r), 1e-9)
                nr = (sum(o_n) / len(o_n)) / max(sum(m_n) / len(m_n), 1e-9)
                rr, nr = f"{rr:.3f}", f"{nr:.3f}"
                status = "done"
            else:
                rr = nr = "—"
                if (scale == "hetrec" and o_r and name in
                        ("dgcf", "disengcn", "disenhan", "tgcn")):
                    # 1-5 h/EPOCH for these mirrors at hetrec on 2 CPU
                    # cores: permanently infeasible, anchored at mid instead
                    status = "mirror-infeasible (anchor at mid)"
                else:
                    status = ("**pending-mirror**" if o_r
                              else "**pending-ours**")
            lines.append(
                f"| {name} | {len(o_r)}/{len(m_r)} | {fmt(o_r)} | "
                f"{fmt(m_r)} | {fmt(o_n)} | {fmt(m_n)} | {rr} | {nr} | "
                f"{status} |")
        # bf16 quality rows (ours f32 vs ours bf16, mirror-independent)
        bf_lines = []
        for name, sc in sorted(results[scale].items()):
            f32s, bf16s = [], []
            for seed, r in sorted(sc.items()):
                if "tagrec_tpu" in r and "tagrec_tpu_bf16" in r:
                    f32s.append(r["tagrec_tpu"]["ndcg@20"])
                    bf16s.append(r["tagrec_tpu_bf16"]["ndcg@20"])
            if f32s:
                ratio = (sum(bf16s) / len(bf16s)) / max(
                    sum(f32s) / len(f32s), 1e-9)
                bf_lines.append(f"| {name} | {sum(f32s)/len(f32s):.4f} | "
                                f"{sum(bf16s)/len(bf16s):.4f} | {ratio:.3f} |")
        if bf_lines:
            lines += ["\nbf16 adjacency quality (ours, ndcg@20):\n",
                      "| model | f32 | bf16 | ratio |", "|---|---|---|---|"]
            lines += bf_lines
        # reference (actual) anchor rows — run_reference.py cells
        act_lines = []
        for name, sc in sorted(results[scale].items()):
            for seed, r in sorted(sc.items()):
                if "reference_actual" not in r:
                    continue
                a = r["reference_actual"]
                m = r.get("reference_mirror")
                o = r.get("tagrec_tpu")
                w = r.get("tagrec_tpu_winsampler")
                act_lines.append(
                    f"| {name} | {seed} | {a['recall@20']:.4f} | "
                    f"{a['ndcg@20']:.4f} | "
                    + (f"{m['recall@20']/max(a['recall@20'],1e-9):.3f} | "
                       f"{m['ndcg@20']/max(a['ndcg@20'],1e-9):.3f} | "
                       if m else "— | — | ")
                    + (f"{o['recall@20']/max(a['recall@20'],1e-9):.3f} | "
                       if o else "— | ")
                    # quirk-faithful column: ours(windows) vs the actual
                    # reference (which IS the windows sampler, quirk #5)
                    + (f"{w['recall@20']/max(a['recall@20'],1e-9):.3f} |"
                       if w else "— |"))
        if act_lines:
            lines += ["\nreference (actual) anchors — /root/reference run "
                      "end-to-end on this graph (run_reference.py):\n",
                      "| model | seed | actual recall@20 | actual ndcg@20 | "
                      "mirror/actual recall | mirror/actual ndcg | "
                      "ours/actual recall | ours(windows)/actual recall |",
                      "|---|---|---|---|---|---|---|---|"]
            lines += act_lines
        # quirk-#5 TransE windows-sampler A/B rows (ours-side variant)
        win_lines = []
        for name, sc in sorted(results[scale].items()):
            for seed, r in sorted(sc.items()):
                if "tagrec_tpu_winsampler" not in r:
                    continue
                w = r["tagrec_tpu_winsampler"]
                m = r.get("reference_mirror")
                wm = r.get("reference_mirror_winsampler")
                o = r.get("tagrec_tpu")
                win_lines.append(
                    f"| {name} | {seed} | {w['recall@20']:.4f} | "
                    + (f"{o['recall@20']:.4f} | " if o else "— | ")
                    + (f"{w['recall@20']/max(m['recall@20'],1e-9):.3f} | "
                       f"{o['recall@20']/max(m['recall@20'],1e-9):.3f} | "
                       if m and o else "— | — | ")
                    + (f"{w['recall@20']/max(wm['recall@20'],1e-9):.3f} |"
                       if wm else "— |"))
        if win_lines:
            lines += ["\nquirk #5 TransE sampler A/B (ours, "
                      "transe_sampler=reference_windows vs full_pass; "
                      "windows/win-mirror pairs quirk-faithful sides):\n",
                      "| model | seed | windows recall@20 | full recall@20 | "
                      "windows/mirror | full/mirror | windows/win-mirror |",
                      "|---|---|---|---|---|---|---|"]
            lines += win_lines
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
