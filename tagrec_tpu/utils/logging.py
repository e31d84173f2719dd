"""Metrics / logging subsystem.

Replaces the reference's disabled tensorboardX scaffolding
(training/basic_train.py:33-47, utility/word.py:15) with an always-on JSONL
metrics stream plus optional TensorBoard (torch.utils.tensorboard) output, and
the reference's ANSI-colored key-line printing (utility/utils.py:76-77).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


def printc(msg: str) -> None:
    """Yellow-on-black highlight print (utility/utils.py:76-77)."""
    print(f"\033[0;33;40m{msg}\033[0m")


class MetricsWriter:
    """JSONL metrics stream (+ optional TensorBoard scalars).

    Every record carries a wall-clock timestamp, step, and tag->value pairs;
    the JSONL file is the durable artifact, TensorBoard a convenience view.
    """

    def __init__(self, out_dir: str, tensorboard: bool = False):
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, "metrics.jsonl")
        self._f = open(self.path, "a", buffering=1)
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(out_dir, "tb"))
            except Exception:
                self._tb = None

    def scalars(self, step: int, values: Dict[str, float],
                prefix: str = "") -> None:
        rec = {"t": time.time(), "step": step}
        for k, v in values.items():
            key = f"{prefix}{k}" if prefix else k
            rec[key] = float(v)
            if self._tb is not None:
                self._tb.add_scalar(key, float(v), step)
        self._f.write(json.dumps(rec) + "\n")

    def results(self, step: int, results: Dict, topks, prefix: str = "test/") -> None:
        """Per-topk eval dict -> flat scalars (add_result_to_writer semantics,
        training/basic_train.py:40-47)."""
        flat = {}
        for key, vals in results.items():
            if isinstance(vals, (list, tuple)) and len(vals) == len(topks):
                for k, v in zip(topks, vals):
                    flat[f"{prefix}{key}@{k}"] = v
            elif isinstance(vals, (list, tuple)):
                flat[f"{prefix}{key}"] = vals[0]
            else:
                flat[f"{prefix}{key}"] = vals
        self.scalars(step, flat)

    def text(self, tag: str, content: str) -> None:
        self._f.write(json.dumps({"t": time.time(), "text": {tag: content}})
                      + "\n")
        if self._tb is not None:
            self._tb.add_text(tag, content)

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()
