"""Fold side parity files (parity_winsampler*.json, parity_kgat48.json...)
into experiments/parity_results.json and regenerate PARITY.md.

Side files exist so concurrent runs never clobber the canonical file; this
merge is the single writer (run it when the background runs are done)."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from parity import _deep_adopt, write_parity_md  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MAIN = os.path.join(ROOT, "experiments", "parity_results.json")
SIDES = ["parity_winsampler.json", "parity_winsampler48.json",
         "parity_mid_refresh.json"]


def main():
    results = json.load(open(MAIN))
    for name in SIDES:
        p = os.path.join(ROOT, "experiments", name)
        if not os.path.exists(p):
            continue
        side = json.load(open(p))
        # side files win on their own keys (they hold the fresher variant
        # cells); _deep_adopt keeps base on conflicts, so adopt base INTO
        # side then take the union
        merged = _deep_adopt(side, results)
        results = merged
    with open(MAIN, "w") as f:
        json.dump(results, f, indent=2, default=float)
    write_parity_md(results)
    print("merged", SIDES, "-> PARITY.md")


if __name__ == "__main__":
    main()
