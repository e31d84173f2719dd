from tagrec_tpu.data.graph import COO, HeteroGraph, joint_adjacency, normalize_adj
from tagrec_tpu.data.io import read_interaction_file, read_triple_file
from tagrec_tpu.data.synthetic import synthetic_graph

__all__ = [
    "COO",
    "HeteroGraph",
    "joint_adjacency",
    "normalize_adj",
    "read_interaction_file",
    "read_triple_file",
    "synthetic_graph",
]
