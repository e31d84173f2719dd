from tagrec_tpu.ops.ell import Ell, build_ell, ell_from_coo, ell_mask
from tagrec_tpu.ops.propagate import coo_spmm, ell_mm, ell_softmax, l2_normalize
from tagrec_tpu.ops import losses, metrics, sampling

__all__ = [
    "Ell", "build_ell", "ell_from_coo", "ell_mask",
    "coo_spmm", "ell_mm", "ell_softmax", "l2_normalize",
    "losses", "metrics", "sampling",
]
