"""Round-5 merge: fold the torch-adam re-measured cells into the store.

The training/optim.py change (torch-faithful Adam, r5) shifts ONLY the
two-phase models' trajectories (kgat, tgcn) — their pre-fix ours cells are
measurements of a non-reference-faithful optimizer and are replaced, with
the originals archived to parity_pre_torchadam_archive.json.  Mirrors always
trained under torch Adam, so mirror/actual cells are untouched (the mid
mirror refreshes in the side files are the separate reg-fix re-runs,
VERDICT r4 #6).  parity_r5_win48.json (48-epoch budget) is deliberately NOT
merged — same key as the 16-epoch cell; it stays a side artifact quoted in
the evidence notes.
"""
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from parity import _deep_adopt, write_parity_md  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXP = os.path.join(ROOT, "experiments")
MAIN = os.path.join(EXP, "parity_results.json")
ARCHIVE = os.path.join(EXP, "parity_pre_torchadam_archive.json")
EXCLUDE = {"parity_r5_win48.json", "parity_r5_win120.json"}


def main():
    results = json.load(open(MAIN))

    # archive the pre-fix two-phase ours cells once
    if not os.path.exists(ARCHIVE):
        arch = {}
        for scale, models in results.items():
            for name in ("kgat", "tgcn"):
                for seed, cells in models.get(name, {}).items():
                    for key in ("tagrec_tpu", "tagrec_tpu_winsampler",
                                "tagrec_tpu_bf16"):
                        if key in cells:
                            arch.setdefault(scale, {}).setdefault(
                                name, {}).setdefault(seed, {})[key] = cells[key]
        with open(ARCHIVE, "w") as f:
            json.dump(arch, f, indent=2, default=float)
        print(f"archived pre-torchadam cells -> {ARCHIVE}")

    sides = sorted(glob.glob(os.path.join(EXP, "parity_r5_*.json")))
    sides.append(os.path.join(EXP, "parity_winmirror_hetrec.json"))
    for p in sides:
        if os.path.basename(p) in EXCLUDE or not os.path.exists(p):
            continue
        side = json.load(open(p))
        # side wins on its own leaves: adopt main INTO side, keep the union
        results = _deep_adopt(side, results)
        print("merged", os.path.basename(p))

    with open(MAIN, "w") as f:
        json.dump(results, f, indent=2, default=float)
    write_parity_md(results, path=os.path.join(ROOT, "PARITY.md"))
    print("wrote PARITY.md")


if __name__ == "__main__":
    main()
