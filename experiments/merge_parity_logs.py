"""Reconstruct parity results from run logs and merge into the results json.

The ours/mirror queues print every completed run as

    === {scale}/{model}/s{seed}: ours (f32) ===      (header)
    {model} ours: {...python dict repr...}           (result)

This parses those pairs (robust to interleaving across files) and deep-merges
them into experiments/parity_results.json, then regenerates PARITY.md.

Usage: python experiments/merge_parity_logs.py /tmp/parity_ours.log /tmp/parity_mirror.log
"""

import json
import os
import re
import sys

import numpy as np  # noqa: F401  (eval'd reprs contain np.float64)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments.parity import _deep_merge, write_parity_md  # noqa: E402

HEADER = re.compile(
    r"^=== (\w+)/(\w+)/s(\d+): (ours(?: \((\w+)\))?|torch mirror) ===")
RESULT = re.compile(r"^(\w+) (ours|mirror): (\{.*\})$")


def parse_log(path, out):
    ctx = None
    for line in open(path):
        line = line.strip()
        m = HEADER.match(line)
        if m:
            scale, model, seed, side, dtype = m.groups()
            key = ("tagrec_tpu_bf16" if dtype == "bf16"
                   else "tagrec_tpu" if side.startswith("ours")
                   else "reference_mirror")
            ctx = (scale, model, seed, key)
            continue
        m = RESULT.match(line)
        if m and ctx is not None:
            model, _, payload = m.groups()
            scale, cmodel, seed, key = ctx
            if model != cmodel:
                ctx = None
                continue
            d = eval(payload, {"np": np})  # noqa: S307 (trusted local logs)
            d = {k: float(v) for k, v in d.items()}
            out.setdefault(scale, {}).setdefault(model, {}) \
               .setdefault(seed, {})[key] = d
            ctx = None
    return out


def main():
    res_path = "experiments/parity_results.json"
    results = {}
    if os.path.exists(res_path):
        results = json.load(open(res_path))
    recovered = {}
    for log in sys.argv[1:]:
        if os.path.exists(log):
            parse_log(log, recovered)
    results = _deep_merge(results, recovered)
    # recompute ratios per (scale, model, seed)
    for scale, models in results.items():
        for model, seeds in models.items():
            for seed, r in seeds.items():
                if not isinstance(r, dict):
                    continue
                if "tagrec_tpu" in r and "reference_mirror" in r:
                    o, m = r["tagrec_tpu"], r["reference_mirror"]
                    r["recall20_ratio"] = round(
                        o["recall@20"] / max(m["recall@20"], 1e-9), 3)
                    r["ndcg20_ratio"] = round(
                        o["ndcg@20"] / max(m["ndcg@20"], 1e-9), 3)
    with open(res_path, "w") as f:
        json.dump(results, f, indent=2, default=float)
    write_parity_md(results)
    n = sum(len(s) for m in recovered.values() for s in m.values())
    print(f"merged {n} recovered (scale, model, seed) entries; "
          f"wrote {res_path} + PARITY.md")


if __name__ == "__main__":
    main()
