"""Composition root — wires graph + model + phases + evaluator per model family.

Capability-equivalent of the reference's ``com.py`` factory functions
(com.py:10-121): every model family gets its loader-derived device data, its
sampler phase(s), one shared Adam, its loss function(s), and an evaluator.
Two-phase families (TGCN: BPR + TransTag, com.py:65-74; KGAT: BPR + TransE,
com.py:77-86) run both phases against a single optimizer state per epoch.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np

from tagrec_tpu.config import ModelConfig, TrainConfig
from tagrec_tpu.data.graph import HeteroGraph
from tagrec_tpu.models import MODEL_REGISTRY
from tagrec_tpu.ops import sampling
from tagrec_tpu.training.evaluate import Evaluator
from tagrec_tpu.training.train import (PhaseSpec, bpr_phase, resampling_phase,
                                       triple_phase)


@dataclass
class Pipeline:
    model: object
    gdev: object
    phases: List[PhaseSpec]
    evaluator: Evaluator
    graph: HeteroGraph


def build_pipeline(graph: HeteroGraph, mcfg: ModelConfig,
                   tcfg: TrainConfig, kg=None, mesh=None) -> Pipeline:
    """kg: optional data.kg.KnowledgeGraph — switches KGAT to true-KG mode
    (the reference's dead kgat_load path as live capability).
    mesh: optional (data, model) Mesh — makes evaluation distributed (the
    Trainer takes the same mesh separately for SPMD training)."""
    name = mcfg.name
    if name == "kgat" and kg is not None:
        model = MODEL_REGISTRY[name](graph, mcfg, kg=kg)
    else:
        model = MODEL_REGISTRY[name](graph, mcfg)
    gdev = model.device_data()
    evaluator = Evaluator(graph, tcfg, mesh=mesh)

    pt = sampling.build_pos_table(graph.user_items["train"], graph.n_user,
                                  graph.n_item)
    edges = graph.edge_index["train"]
    phases: List[PhaseSpec] = []

    def bpr_loss_fn(params, gdev_, batch, key):
        return model.bpr_loss(params, gdev_, batch, key=key)

    if name in ("lightgcn", "ngcf", "kgat", "tgcn"):
        phases.append(bpr_phase("bpr", edges, pt, tcfg.train_batch, bpr_loss_fn,
                                neg_rounds=tcfg.neg_resample_rounds))
    elif name in ("dgcf", "disengcn", "disenhan"):
        # DGCF_training_data semantics (train_data/bpr_training_data.py:47-84):
        # per-step user resampling + correlation-sample ids.
        steps = len(edges) // tcfg.train_batch + 1
        user_ids = np.asarray(sorted(graph.user_items["train"].keys()),
                              dtype=np.int32)
        cor_sizes = {"user": (mcfg.cor_batch, graph.n_user),
                     "item": (mcfg.cor_batch, graph.n_item)}
        if mcfg.use_tag and graph.has_tags:
            cor_sizes["tag"] = (mcfg.cor_batch, graph.n_tag)

        def dgcf_loss_fn(params, gdev_, batch, key):
            return model.bpr_loss(params, gdev_, batch["bpr"], key=key,
                                  cor=batch.get("cor"))

        phases.append(resampling_phase("bpr", user_ids, pt, tcfg.train_batch,
                                       steps, dgcf_loss_fn, cor_sizes=cor_sizes,
                                       neg_rounds=tcfg.neg_resample_rounds))
    else:
        raise ValueError(f"unknown model family {name}")

    if name == "kgat":
        # TransE phase: over the six tag-graph relations by default
        # (KGAT_training_data, train_data/transe_training_data.py:12-39), or
        # the full KG triplet set in knowledge-graph mode.
        if kg is not None:
            trips = kg.all_triplet
            n_rel = kg.num_relation
            n_ids = graph.n_user + kg.num_entity
        else:
            rel = graph.relation_edges()
            trips = np.concatenate([
                np.stack([rel[k][0],
                          np.full(rel[k].shape[1], k, dtype=np.int64),
                          rel[k][1]], axis=1)
                for k in sorted(rel)])
            n_rel = 6
            n_ids = graph.n_user + graph.n_item + graph.n_tag

        def transe_loss_fn(params, gdev_, batch, key):
            return model.transe_loss(params, gdev_, batch, key=key)

        phases.append(triple_phase("transe", trips, n_rel, n_ids,
                                   mcfg.transe_batch, transe_loss_fn,
                                   neg_rounds=tcfg.neg_resample_rounds,
                                   window=(mcfg.transe_sampler
                                           == "reference_windows")))

    if name == "tgcn":
        # TransTag phase over (u, tag, item) triples
        # (TransTag_training_data, train_data/transe_training_data.py:42-71).
        uti = graph.uit_data[:, [0, 2, 1]].astype(np.int64)

        def transtag_loss_fn(params, gdev_, batch, key):
            return model.transtag_loss(params, gdev_, batch, key=key)

        phases.append(triple_phase("transtag", uti, graph.n_tag, graph.n_item,
                                   mcfg.transtag_batch, transtag_loss_fn,
                                   neg_rounds=tcfg.neg_resample_rounds))

    return Pipeline(model=model, gdev=gdev, phases=phases, evaluator=evaluator,
                    graph=graph)
