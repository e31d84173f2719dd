"""Run the ACTUAL reference (/root/reference) on CPU — mirror-anchor validation.

BASELINE.md's protocol says quality baselines must come from running the
reference itself (training/basic_train.py:50-85, main.py:11-41); until round 4
every anchor came from tests/torch_mirrors.py (independent re-implementations).
This runner closes that loop: it exports the parity synthetic graphs to the
reference's file format (train.txt / test.txt / user_item_tag.txt —
data/cf_load.py:15-21, data/tgcn_load.py:17), imports the reference in-place
(read-only) with environment-compat shims, drives the exact main.py sequence,
and records the early-stop best metrics as `reference_actual` cells in
experiments/parity_results.json (per scale/model/seed, next to the
`reference_mirror` anchors).

Environment shims (NO behavior changes — each fixes a py3.11/numpy-2 import
or a dangling name the reference never exercises):
  * collections.Iterable -> collections.abc.Iterable (quirk #13,
    utility/utils.py:6; removed from `collections` in py3.10)
  * np.int -> int (data/utils.py:73; alias removed in numpy 1.24)
  * builtins.DTAG..DTAG7 = None: com.py:89-98 builds `_dtag_map` at import
    time from model classes that do not exist anywhere in the reference —
    `import com` raises NameError unconditionally, so the reference is
    unrunnable as shipped for ANY model.  Injecting the dangling names into
    builtins lets module import complete; dtag models are never invoked.

Usage:
  python experiments/run_reference.py --scale small --models lightgcn kgat \
      --epochs 120 --seeds 2020
Each (model, seed) runs in a fresh subprocess (the reference parses sys.argv
at import of utility.word — one CFG per process).
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "experiments"))


# ------------------------------------------------------------------ export

def export_reference_format(scale: str) -> str:
    """Write the parity graph for ``scale`` in the reference's file format.

    train.txt / test.txt: `u i1 i2 ...` per line (data/utils.py:23-46);
    user_item_tag.txt: `u i t` triples (data/utils.py:9-20).
    """
    import numpy as np
    from parity import build_scale_graph

    out = os.path.join(REPO, "experiments", "refdata", scale)
    marker = os.path.join(out, ".complete")
    if os.path.exists(marker):
        return os.path.dirname(out)
    os.makedirs(out, exist_ok=True)
    graph = build_scale_graph(scale)

    def write_ui(path, ui):
        with open(path, "w") as f:
            for u in sorted(ui):
                items = ui[u]
                if len(items):
                    f.write(" ".join(map(str, [int(u)] + [int(i) for i in items]))
                            + "\n")

    write_ui(os.path.join(out, "train.txt"), graph.user_items["train"])
    write_ui(os.path.join(out, "test.txt"), graph.user_items["test"])
    with open(os.path.join(out, "user_item_tag.txt"), "w") as f:
        for u, i, t in np.asarray(graph.uit_data, dtype=np.int64):
            f.write(f"{u} {i} {t}\n")
    open(marker, "w").close()
    print(f"exported {scale} graph to {out}")
    return os.path.dirname(out)


# ------------------------------------------------------------------- child

def run_child(model: str, scale: str, seed: int, epochs: int, data_root: str):
    """Execute the reference's main.py sequence in THIS process."""
    import collections
    import collections.abc
    import warnings

    warnings.filterwarnings("ignore")
    collections.Iterable = collections.abc.Iterable  # quirk #13 shim
    import numpy as np
    if not hasattr(np, "int"):
        np.int = int  # numpy>=1.24 alias shim (data/utils.py:73)
    import builtins
    for n in ("DTAG", "DTAG1", "DTAG2", "DTAG3", "DTAG4", "DTAG5", "DTAG6",
              "DTAG7"):
        if not hasattr(builtins, n):
            setattr(builtins, n, None)  # com.py:89-98 dangling names

    workdir = os.path.join(REPO, "experiments", "refrun")
    os.makedirs(workdir, exist_ok=True)
    os.chdir(workdir)  # reference writes run/{model}/{dataset}/{ts} under cwd

    sys.path.insert(0, REF)
    # reg/cor_reg 1e-4 match the parity protocol (parity.py run_ours/run_mirror)
    sys.argv = ["main.py", "--model", model, "--data_root", data_root,
                "--dataset", scale, "--epochs", str(epochs),
                "--seed", str(seed), "--reg", "1e-4", "--cor_reg", "1e-4"]

    t0 = time.time()
    from utility.word import CFG, Global
    from utility.utils import init_seed
    GLO = Global()
    init_seed(CFG["seed"])
    from com import model_dict
    model_obj, train, test = model_dict[CFG["model"]](GLO)
    train.run(model_obj)  # prints per-epoch losses + eval results
    best = train.early_stop.best_result
    out = {"recall@20": float(best["recall"][1]),
           "ndcg@20": float(best["ndcg"][1]),
           "ndcg@10": float(best["ndcg"][0]),
           "best_epoch": int(train.early_stop.best_epoch),
           "train_s": round(time.time() - t0, 1)}
    print("RESULT_JSON " + json.dumps(out), flush=True)


# ------------------------------------------------------------------ driver

def merge_result(scale, model, seed, res, out_path):
    results = {}
    if os.path.exists(out_path):
        try:
            results = json.load(open(out_path))
        except json.JSONDecodeError:
            pass
    cell = (results.setdefault(scale, {}).setdefault(model, {})
            .setdefault(str(seed), {}))
    cell["reference_actual"] = res
    if "reference_mirror" in cell:
        m = cell["reference_mirror"]
        cell["mirror_vs_actual_recall20"] = round(
            m["recall@20"] / max(res["recall@20"], 1e-9), 3)
        cell["mirror_vs_actual_ndcg20"] = round(
            m["ndcg@20"] / max(res["ndcg@20"], 1e-9), 3)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2, default=float)
    return cell


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="+", default=["lightgcn", "kgat"])
    ap.add_argument("--scale", default="small",
                    choices=["small", "mid", "hetrec"])
    ap.add_argument("--seeds", type=int, nargs="+", default=[2020])
    ap.add_argument("--epochs", type=int, default=120)
    ap.add_argument("--out", default="experiments/parity_results.json")
    ap.add_argument("--child", nargs=3, metavar=("MODEL", "SEED", "DATAROOT"),
                    help="(internal) run one reference training in-process")
    args = ap.parse_args()

    if args.child:
        model, seed, data_root = args.child
        run_child(model, args.scale, int(seed), args.epochs, data_root)
        return

    data_root = export_reference_format(args.scale)
    out_path = os.path.join(REPO, args.out)
    for model in args.models:
        for seed in args.seeds:
            existing = {}
            if os.path.exists(out_path):
                try:
                    existing = (json.load(open(out_path))
                                .get(args.scale, {}).get(model, {})
                                .get(str(seed), {}))
                except json.JSONDecodeError:
                    pass
            if "reference_actual" in existing:
                print(f"{args.scale}/{model}/s{seed}: already done, skip")
                continue
            print(f"=== reference {args.scale}/{model}/s{seed} "
                  f"({args.epochs} epochs) ===", flush=True)
            cmd = [sys.executable, "-u", os.path.abspath(__file__),
                   "--scale", args.scale, "--epochs", str(args.epochs),
                   "--child", model, str(seed), data_root]
            proc = subprocess.run(cmd, capture_output=True, text=True)
            res = None
            for line in proc.stdout.splitlines():
                if line.startswith("RESULT_JSON "):
                    res = json.loads(line[len("RESULT_JSON "):])
            if res is None:
                print(f"FAILED rc={proc.returncode}\n--- stdout tail ---\n"
                      + "\n".join(proc.stdout.splitlines()[-20:])
                      + "\n--- stderr tail ---\n"
                      + "\n".join(proc.stderr.splitlines()[-20:]), flush=True)
                continue
            cell = merge_result(args.scale, model, seed, res, out_path)
            print(f"{args.scale}/{model}/s{seed} reference_actual: {res}")
            if "mirror_vs_actual_recall20" in cell:
                print(f"  mirror/actual recall20="
                      f"{cell['mirror_vs_actual_recall20']} "
                      f"ndcg20={cell['mirror_vs_actual_ndcg20']}")


if __name__ == "__main__":
    main()
