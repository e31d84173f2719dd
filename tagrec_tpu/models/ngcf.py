"""NGCF (+tags) — bilinear-interaction propagation with layer concat.

Capability parity with reference model/ngcf.py:9-112:
* joint adjacency with ``ngcf`` norm (D^-1 A + I)
* per layer k: sum_embed = LeakyReLU((Â E + E)(W1_k + b1_k)),
               bi_embed  = LeakyReLU((Â E ⊙ E)(W2_k + b2_k)),
  E <- dropout(sum + bi); layer outputs L2-normalized and **concatenated**
  (dims 64+64+32+16)
* reference quirk #4 reproduced: the bias is broadcast-added to the weight
  matrix *before* the matmul (model/ngcf.py:78,82), i.e. x @ (W + b) —
  not x @ W + b.
* BPR(logsigmoid) + L2 on the **final** (propagated) embeddings.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tagrec_tpu.config import ModelConfig
from tagrec_tpu.data.graph import HeteroGraph
from tagrec_tpu.models import base
from tagrec_tpu.ops import ell as ell_lib
from tagrec_tpu.ops.propagate import adj_mm, l2_normalize, message_dropout


class NGCF:
    def __init__(self, graph: HeteroGraph, cfg: ModelConfig):
        self.cfg = cfg
        use_tag = cfg.use_tag and graph.has_tags
        self.num_list = [graph.n_user, graph.n_item] + (
            [graph.n_tag] if use_tag else [])
        self.dims = [cfg.dim_latent] + list(cfg.dim_layer_list)
        # The ngcf norm is D^-1 A + I (model/help/adj.py:75-87).  The +I is
        # applied ANALYTICALLY (nei = adj_mm(D^-1 A, x) + x — exactly equal),
        # so the stored adjacency has no self-loops and the dense tier can
        # skip the joint matrix's structurally-zero diagonal blocks
        # (~2x less adjacency HBM stream).
        self._add_identity = cfg.norm_type == "ngcf"
        stored_norm = "si_norm" if self._add_identity else cfg.norm_type
        coo = graph.joint_norm_adj(stored_norm, use_tag)
        import numpy as _np
        self._adj_host = ell_lib.build_adj_pair(
            coo, symmetric=stored_norm in ("bi_norm", "plain"),
            # dense_xla is the attention-model chunked tier; for plain SpMM
            # models it means the same thing as dense
            mode={"dense_xla": "dense"}.get(cfg.adj_mode, cfg.adj_mode),
            dense_dtype=_np.float32 if cfg.adj_dtype == "f32" else "bf16",
            sectors=tuple(self.num_list)
            if stored_norm in ("bi_norm", "plain", "si_norm") else None)

    def device_data(self):
        return {"adj": ell_lib.adj_pair_to_device(self._adj_host)}

    def init(self, key):
        cfg = self.cfg
        k_emb, k_mat = jax.random.split(key)
        params = {"embed": base.init_embeddings(k_emb, self.num_list, cfg.dim_latent),
                  "mat": {}}
        keys = jax.random.split(k_mat, cfg.num_layer * 4)
        for k in range(cfg.num_layer):
            d_in, d_out = self.dims[k], self.dims[k + 1]
            params["mat"][f"W1_{k}"] = base.xavier_uniform(keys[4 * k], (d_in, d_out))
            params["mat"][f"b1_{k}"] = base.xavier_uniform(keys[4 * k + 1], (1, d_out))
            params["mat"][f"W2_{k}"] = base.xavier_uniform(keys[4 * k + 2], (d_in, d_out))
            params["mat"][f"b2_{k}"] = base.xavier_uniform(keys[4 * k + 3], (1, d_out))
        return params

    def forward(self, params, gdev, *, training: bool = False, key=None):
        cfg = self.cfg
        adj = gdev["adj"]
        x = jnp.concatenate(params["embed"], axis=0)
        outs = [x]
        for k in range(cfg.num_layer):
            nei = adj_mm(adj, x)
            if self._add_identity:
                nei = nei + x  # the +I of the ngcf norm, applied analytically
            # quirk #4: bias folded into the weight before matmul
            sum_emb = jax.nn.leaky_relu(
                (nei + x) @ (params["mat"][f"W1_{k}"] + params["mat"][f"b1_{k}"]),
                negative_slope=0.2)
            bi_emb = jax.nn.leaky_relu(
                (nei * x) @ (params["mat"][f"W2_{k}"] + params["mat"][f"b2_{k}"]),
                negative_slope=0.2)
            x = sum_emb + bi_emb
            if training and cfg.message_drop_list[k] > 0.0:
                key, sub = jax.random.split(key)
                x = message_dropout(x, cfg.message_drop_list[k], sub, training)
            outs.append(l2_normalize(x))
        final = jnp.concatenate(outs, axis=1)
        return base.split_nodes(final, self.num_list)

    def bpr_loss(self, params, gdev, batch, *, key=None, training: bool = True):
        embs = self.forward(params, gdev, training=training, key=key)
        u_all, i_all = embs[0], embs[1]
        # NGCF regularizes the final embeddings (model/ngcf.py:95-105)
        return base.bpr_with_reg(u_all, i_all, u_all, i_all, batch,
                                 self.cfg.mul_loss_func, self.cfg.reg)

    def predict(self, params, gdev, users):
        embs = self.forward(params, gdev, training=False)
        return base.predict_sigmoid(jnp.take(embs[0], users, axis=0), embs[1])
