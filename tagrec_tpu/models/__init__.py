"""Model zoo — functional JAX re-designs of the reference's seven models.

Each model is a thin Python object holding static config + host-side graph
prep, exposing the duck-typed surface the reference establishes
(model/__init__.py, SURVEY.md §2.5):

* ``init(key) -> params``                               (pytree)
* ``device_data() -> gdev``                             (pytree of jnp arrays)
* ``forward(params, gdev, *, training, key) -> tuple of per-type embeddings``
* ``bpr_loss(params, gdev, batch, *, key, training) -> tuple of loss terms``
* ``predict(params, gdev, users) -> [B, n_item] sigmoid scores``
* KGAT/TGCN additionally: ``transe_loss`` / ``transtag_loss``
"""

from tagrec_tpu.models.lightgcn import LightGCN
from tagrec_tpu.models.ngcf import NGCF
from tagrec_tpu.models.dgcf import DGCF
from tagrec_tpu.models.disengcn import DisenGCN
from tagrec_tpu.models.disenhan import DisenHAN
from tagrec_tpu.models.kgat import KGAT
from tagrec_tpu.models.tgcn import TGCN

MODEL_REGISTRY = {
    "lightgcn": LightGCN,
    "ngcf": NGCF,
    "dgcf": DGCF,
    "disengcn": DisenGCN,
    "disenhan": DisenHAN,
    "kgat": KGAT,
    "tgcn": TGCN,
}

__all__ = ["LightGCN", "NGCF", "DGCF", "DisenGCN", "DisenHAN", "KGAT", "TGCN",
           "MODEL_REGISTRY"]
