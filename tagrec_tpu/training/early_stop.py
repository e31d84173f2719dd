"""Early stopping + best-checkpoint tracking (reference training/early_stop.py:7-41)."""

from __future__ import annotations

from typing import Dict, Optional

from tagrec_tpu.training import checkpoint


class EarlyStop:
    """Track the early-stop metric (default NDCG at the FIRST topk entry —
    reference quirk #15: @10, not @20), save params on improvement, stop after
    ``patience`` stale evaluations."""

    def __init__(self, patience: int, key: str = "ndcg",
                 save_path: Optional[str] = None):
        self.patience = patience
        self.key = key
        self.save_path = save_path
        self.best_value = None
        self.best_result: Optional[Dict] = None
        self.best_epoch = 0
        self.best_params = None
        self.count = 0
        # higher-is-better for precision/recall/ndcg, else lower
        self.higher = key in ("precision", "recall", "ndcg", "hr", "auc")

    def __call__(self, params, results: Dict, epoch: int) -> bool:
        cur = results[self.key]
        if isinstance(cur, (list, tuple)):
            cur = cur[0]
        improved = (self.best_value is None or
                    (cur > self.best_value if self.higher else cur < self.best_value))
        if improved:
            self.best_value = cur
            self.best_result = results
            self.best_epoch = epoch
            self.best_params = params
            self.count = 0
            if self.save_path:
                checkpoint.save(self.save_path, params)
        else:
            self.count += 1
        return self.count > self.patience
