"""tagrec_tpu — a TPU-native (JAX/XLA/Pallas) tag-aware graph recommendation engine.

A from-scratch re-design of the capabilities of the reference PyTorch codebase
``chenzheng5555/tag-aware-recommendation`` (see SURVEY.md): seven graph-embedding
recommendation models (LightGCN, NGCF, DGCF, DisenGCN, DisenHAN, KGAT, TGCN)
trained with BPR pairwise loss (plus TransE/TransTag auxiliary phases) over
user-item-tag heterogeneous graphs, with full-catalog top-k evaluation and
early stopping.

TPU-first design decisions (vs. the reference's torch.sparse formulation):

* All adjacency is stored in **degree-padded dense (ELL) form** — fixed-width
  neighbor/value tables per node — so propagation, sparse softmax, per-edge
  routing, and edge dropout become dense gathers + masked reductions with
  static shapes. There is no scatter in the hot path.
* Negative sampling, metric computation, and top-k run **on device** inside
  jit; the reference's CPU worker pools (train_data/bpr_training_data.py:34-39,
  training/basic_test.py:60-66) have no counterpart here.
* Distribution is expressed through ``jax.sharding.Mesh`` with named axes
  (``data``, ``model``) and sharding constraints; XLA inserts the collectives.
"""

__version__ = "0.1.0"

from tagrec_tpu.config import ModelConfig, TrainConfig, model_preset

__all__ = ["ModelConfig", "TrainConfig", "model_preset", "__version__"]
