"""Typed configuration for tagrec_tpu.

Replaces the reference's process-global ``CFG`` dict (utility/word.py:7,
utility/utils.py:18-62) and per-model hyperparameter dicts (utility/config.py:1-81)
with explicit frozen dataclasses that are threaded through constructors —
no global state, no ``eval()`` of flag strings.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Tuple


@dataclass(frozen=True)
class ModelConfig:
    """Per-model hyperparameters (reference: utility/config.py + argparse defaults).

    Field defaults mirror the reference argparse defaults (utility/utils.py:18-47);
    per-model presets below mirror utility/config.py:72-81.
    """

    name: str = "lightgcn"
    dim_latent: int = 64
    # Layer output dims; its *length* is the number of propagation layers.
    dim_layer_list: Tuple[int, ...] = (64, 32, 16)
    norm_type: str = "bi_norm"  # bi_norm | si_norm | si_norm_self | ngcf | plain
    agg_type: str = "bi_agg"
    mul_loss_func: str = "softplus"  # softplus | logsigmoid
    use_tag: bool = True
    # Adjacency/attention execution mode (no effect on semantics):
    #   "auto"  — dense MXU-streamed formulation when the [N, M] pattern fits
    #             the dense budget (ops.ell.DENSE_ADJ_BUDGET_BYTES), else the
    #             degree-bucketed ELL / edgemap formulation; for TGCN, the
    #             slot-dedup bucketed tables (DESIGN.md §8, 1.85x)
    #   "dense" / "ell" — force one path (ell is the sharded-regime format)
    #   "dense_xla" — chunk-and-materialize XLA tier (attention models);
    #             for TGCN, the plain 25-wide table takes
    adj_mode: str = "auto"
    # Dense-adjacency stream dtype for the CONSTANT adjacencies
    # (LightGCN/NGCF): "f32" (default, bit-parity with the torch mirrors) or
    # "bf16" (halves the hot matmul's HBM traffic; f32 accumulation).
    # KGAT true-KG: bf16 relation score planes (165->107ms); TGCN plain path:
    # bf16 table gathers (no effect on the dedup default — rows, not bytes).
    adj_dtype: str = "f32"
    message_drop_list: Tuple[float, ...] = (0.0, 0.0, 0.0)
    node_drop: float = 0.0  # edge-dropout keep prob knob (reference model/help/adj.py:170)
    reg: float = 0.0
    cor_reg: float = 0.0
    # DGCF / DisenGCN / DisenHAN
    factor_k: int = 4
    iterate_k: int = 2
    cor_batch: int = 100
    # TGCN
    dim_weight: int = 10
    dim_atten: int = 32
    num_bit_conv: int = 32
    num_vec_conv: int = 8
    margin: float = 1.0
    transtag_batch: int = 512
    neighbor_k: int = 25
    transtag_reg: float = 1e-4
    # KGAT
    dim_relation: int = 64
    transe_reg: float = 1e-4
    transe_batch: int = 1024
    # TransE-phase sampler (SURVEY quirk #5, train_data/transe_training_data.py:31-37):
    #   "reference_windows" — the reference's overlapping [i:i+batch] prefix
    #                         windows over NEVER-shuffled triples (KGAT preset
    #                         default: reproduces the quirk, and measured
    #                         BETTER end quality — the weak TransE phase lets
    #                         BPR progress; hetrec recall 0.0296 vs 0.0076,
    #                         PARITY.md quirk-#5 table)
    #   "full_pass"         — one full shuffled pass per epoch (the
    #                         documented "fix"; dataclass default so TGCN's
    #                         TransTag phase — which the reference DOES run
    #                         as a full pass — is unaffected)
    transe_sampler: str = "full_pass"
    # KGAT quirk switch: the reference config sets agg_type="bi_agg" but the code
    # checks for "bi_inter" (model/kgat.py:100 vs utility/config.py:58), so the
    # shipped KGAT never propagates.  agg_type="bi_agg" reproduces that measured
    # behavior; set agg_type="bi_inter" to enable the intended propagation.

    @property
    def num_layer(self) -> int:
        return len(self.dim_layer_list)

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


# Per-model presets — semantics of utility/config.py:1-81.
_PRESETS = {
    "ngcf": dict(norm_type="ngcf", agg_type="bi_agg", mul_loss_func="logsigmoid"),
    "lightgcn": dict(mul_loss_func="softplus", norm_type="bi_norm", cor_batch=100),
    "dgcf": dict(mul_loss_func="softplus", norm_type="plain", factor_k=4,
                 iterate_k=2, cor_batch=100),
    "disengcn": dict(mul_loss_func="softplus", norm_type="plain", factor_k=4,
                     iterate_k=2, cor_batch=100),
    "disenhan": dict(mul_loss_func="softplus", norm_type="plain", factor_k=4,
                     iterate_k=2, cor_batch=100),
    "tgcn": dict(dim_weight=10, dim_atten=32, num_bit_conv=32, num_vec_conv=8,
                 margin=1.0, transtag_batch=512, neighbor_k=25, transtag_reg=1e-4,
                 mul_loss_func="logsigmoid"),
    "kgat": dict(dim_relation=64, transe_reg=1e-4, transe_batch=1024,
                 agg_type="bi_agg", mul_loss_func="softplus",
                 transe_sampler="reference_windows"),
}


def model_preset(name: str, **overrides) -> ModelConfig:
    """Build the default :class:`ModelConfig` for a model family."""
    if name not in _PRESETS:
        raise ValueError(f"unknown model {name!r}; known: {sorted(_PRESETS)}")
    kw = dict(_PRESETS[name])
    kw.update(overrides)
    return ModelConfig(name=name, **kw)


@dataclass(frozen=True)
class TrainConfig:
    """Training/eval driver configuration (reference argparse, utility/utils.py:18-47)."""

    train_batch: int = 512
    test_batch: int = 512
    has_val: bool = False
    patient_epoch: int = 10
    test_interval: int = 5
    early_stop_key: str = "ndcg"
    topks: Tuple[int, ...] = (10, 20)
    lr: float = 0.01
    epochs: int = 1000
    seed: int = 2020
    # On-device negative sampling: number of masked re-draw rounds replacing the
    # reference's CPU rejection loop (train_data/utils.py:19-28).
    neg_resample_rounds: int = 16
    # Adam semantics (training/optim.py): "torch" (default) reproduces the
    # reference's torch.optim.Adam lazy per-parameter state — a phase's
    # untouched tensors keep their step count / moments frozen, which is what
    # the two-phase models actually train under (com.py:68-86).  "global" is
    # optax.adam's one-global-count behavior (identical for single-phase
    # models; pre-r5 behavior for KGAT/TGCN).
    adam_impl: str = "torch"

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)
