"""LightGCN (+tags) — pure SpMM propagation with layer-mean readout.

Capability parity with reference model/lightgcn.py:10-89:
* joint normalized {u,i,t} adjacency, ``bi_norm`` by default
* K layers of propagation E <- Â E with optional per-layer message dropout and
  edge-level dropout (``node_drop``)
* per-layer L2 normalize (reference quirk #8 — the author notes it hurts
  performance but ships it; reproduced for parity, switchable)
* final embedding = mean over [ego, layer_1..K]
* BPR(softplus) + L2 on **ego** embeddings
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tagrec_tpu.config import ModelConfig
from tagrec_tpu.data.graph import HeteroGraph
from tagrec_tpu.models import base
from tagrec_tpu.ops import ell as ell_lib
from tagrec_tpu.ops.propagate import adj_mm, edge_dropout, l2_normalize, message_dropout


class LightGCN:
    def __init__(self, graph: HeteroGraph, cfg: ModelConfig,
                 per_layer_normalize: bool = True):
        self.cfg = cfg
        use_tag = cfg.use_tag and graph.has_tags
        self.num_list = [graph.n_user, graph.n_item] + (
            [graph.n_tag] if use_tag else [])
        self.per_layer_normalize = per_layer_normalize
        coo = graph.joint_norm_adj(cfg.norm_type, use_tag)
        # degree-bucketed ELL (bounded padding on power-law graphs) with a
        # transpose pair for the scatter-free custom-VJP backward; on the
        # dense tier the per-type SECTORS skip the joint adjacency's
        # structurally-zero diagonal blocks (~2x less adjacency HBM stream —
        # valid for norms without self-loops)
        import numpy as _np
        symmetric = cfg.norm_type in ("bi_norm", "plain")
        no_self_loops = cfg.norm_type in ("bi_norm", "plain", "si_norm")
        self._adj_host = ell_lib.build_adj_pair(
            coo, symmetric=symmetric,
            # dense_xla is the attention-model chunked tier; for plain SpMM
            # models it means the same thing as dense
            mode={"dense_xla": "dense"}.get(cfg.adj_mode, cfg.adj_mode),
            dense_dtype=_np.float32 if cfg.adj_dtype == "f32" else "bf16",
            sectors=tuple(self.num_list) if no_self_loops else None)

    # ------------------------------------------------------------------ data
    def device_data(self):
        return {"adj": ell_lib.adj_pair_to_device(self._adj_host)}

    # ------------------------------------------------------------------ init
    def init(self, key):
        return {"embed": base.init_embeddings(key, self.num_list,
                                              self.cfg.dim_latent)}

    # --------------------------------------------------------------- forward
    def forward(self, params, gdev, *, training: bool = False, key=None):
        cfg = self.cfg
        adj = gdev["adj"]
        if training and cfg.node_drop > 0.0:
            key, sub = jax.random.split(key)
            adj = edge_dropout(adj, cfg.node_drop, sub, training)

        x = jnp.concatenate(params["embed"], axis=0)
        layer_outs = [x]
        for k in range(cfg.num_layer):
            x = adj_mm(adj, x)
            if training and cfg.message_drop_list[k] > 0.0:
                key, sub = jax.random.split(key)
                x = message_dropout(x, cfg.message_drop_list[k], sub, training)
            out = l2_normalize(x) if self.per_layer_normalize else x
            layer_outs.append(out)
        final = jnp.mean(jnp.stack(layer_outs, axis=1), axis=1)
        return base.split_nodes(final, self.num_list)

    # ----------------------------------------------------------------- loss
    def bpr_loss(self, params, gdev, batch, *, key=None, training: bool = True):
        embs = self.forward(params, gdev, training=training, key=key)
        u_all, i_all = embs[0], embs[1]
        u_ego, i_ego = params["embed"][0], params["embed"][1]
        return base.bpr_with_reg(u_all, i_all, u_ego, i_ego, batch,
                                 self.cfg.mul_loss_func, self.cfg.reg)

    # -------------------------------------------------------------- predict
    def predict(self, params, gdev, users):
        embs = self.forward(params, gdev, training=False)
        return base.predict_sigmoid(jnp.take(embs[0], users, axis=0), embs[1])
