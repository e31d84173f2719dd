from tagrec_tpu.training.evaluate import Evaluator
from tagrec_tpu.training.train import Trainer, PhaseSpec, bpr_phase
from tagrec_tpu.training.early_stop import EarlyStop

__all__ = ["Evaluator", "Trainer", "PhaseSpec", "bpr_phase", "EarlyStop"]
