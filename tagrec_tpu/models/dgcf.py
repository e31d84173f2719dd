"""DGCF (+tags) — intent-disentangled propagation with per-edge factor routing.

Capability parity with reference model/dgcf.py:11-152:
* 'plain' joint adjacency (structure only); dim-64 embeddings split into
  ``factor_k`` chunks of dim 16
* per layer, ``iterate_k`` routing iterations: softmax over factors of the
  per-edge score table ``A_values`` (persisting across layers), then per factor
  a symmetric renormalized propagation D^-1/2 A_f D^-1/2 with the **detached**
  attention values (model/dgcf.py:92 — reproduced via stop_gradient), then a
  score update A_values += Σ_d norm(head) * tanh(norm(tail_ego)) which is NOT
  detached (gradients flow through the routing chain)
* layer outputs: per-factor L2 normalize, concat factors; final = mean over
  [ego, layer_1..K]
* BPR(softplus) + L2 on ego embeddings; optional distance-correlation loss
  over factor chunks (reference has it implemented but commented out,
  model/dgcf.py:131-145 — here enabled when cor_reg > 0)

TPU-first formulation: edges live in ELL slots [N, K]; routing softmax,
degree renormalization (segment-sum -> rsqrt -> per-slot scale) and the
propagation are dense masked ops — no sparse tensor rebuilds per iteration.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tagrec_tpu.config import ModelConfig
from tagrec_tpu.data.graph import HeteroGraph
from tagrec_tpu.models import base
from tagrec_tpu.ops import ell as ell_lib
from tagrec_tpu.ops import losses
from tagrec_tpu.ops.propagate import l2_normalize


class DGCF:
    def __init__(self, graph: HeteroGraph, cfg: ModelConfig):
        self.cfg = cfg
        use_tag = cfg.use_tag and graph.has_tags
        self.num_list = [graph.n_user, graph.n_item] + (
            [graph.n_tag] if use_tag else [])
        assert cfg.dim_latent % cfg.factor_k == 0
        self.dim_k = cfg.dim_latent // cfg.factor_k
        # slot-stable single ELL: A_values live per (row, slot)
        coo = graph.joint_norm_adj(cfg.norm_type, use_tag)  # 'plain'
        self._ell_host = ell_lib.ell_from_coo(coo)

    def device_data(self):
        ell = ell_lib.to_device(self._ell_host)
        return {"adj": ell, "mask": ell_lib.ell_mask(ell).astype(jnp.float32)}

    def init(self, key):
        return {"embed": base.init_embeddings(key, self.num_list,
                                              self.cfg.dim_latent)}

    # ------------------------------------------------------------------ core
    def _factor_update(self, a_slot, ego_split, idx, mask):
        """One factor's renormalized propagation + score update
        (model/dgcf.py:91-110). a_slot: [N, K] detached attention values."""
        row_sum = jnp.sum(a_slot, axis=1)                     # sparse.sum dim=1
        d = jax.lax.rsqrt(jnp.where(row_sum > 0, row_sum, 1.0))
        d = jnp.where(row_sum > 0, d, 0.0)                    # inf -> 0
        scaled = ego_split * d[:, None]                       # D x
        gathered = jnp.take(scaled, idx, axis=0)              # [N, K, dk]
        factor_emb = d[:, None] * jnp.einsum("nk,nkd->nd", a_slot, gathered)

        h_norm = l2_normalize(factor_emb)                     # head = row
        t_norm = l2_normalize(ego_split)                      # tail ego
        t_gath = jnp.tanh(jnp.take(t_norm, idx, axis=0))      # [N, K, dk]
        a_score = jnp.einsum("nd,nkd->nk", h_norm, t_gath) * mask
        return factor_emb, a_score

    def _iterate_update(self, a_values, ego_embed, idx, mask):
        """One layer's routing iterations (model/dgcf.py:68-89)."""
        cfg = self.cfg
        ego_split = jnp.split(ego_embed, cfg.factor_k, axis=1)
        layer_emb = []
        for t in range(cfg.iterate_k):
            a_factor = jax.nn.softmax(a_values, axis=0)       # over factors
            a_used = jax.lax.stop_gradient(a_factor) * mask   # detach (ref :92)
            scores = []
            for i in range(cfg.factor_k):
                femb, a_score = self._factor_update(a_used[i], ego_split[i],
                                                    idx, mask)
                scores.append(a_score)
                if t == cfg.iterate_k - 1:
                    layer_emb.append(femb)
            a_values = a_values + jnp.stack(scores, axis=0)   # NOT detached
        layer_emb = l2_normalize(jnp.stack(layer_emb), axis=2)
        ego_embed = jnp.concatenate(list(layer_emb), axis=1)
        return a_values, ego_embed

    def forward(self, params, gdev, *, training: bool = False, key=None):
        cfg = self.cfg
        ell, mask = gdev["adj"], gdev["mask"]
        a_values = jnp.ones((cfg.factor_k,) + ell.idx.shape, jnp.float32)
        ego = jnp.concatenate(params["embed"], axis=0)
        outs = [ego]
        for _ in range(cfg.num_layer):
            a_values, ego = self._iterate_update(a_values, ego, ell.idx, mask)
            outs.append(ego)
        final = jnp.mean(jnp.stack(outs, axis=1), axis=1)
        return base.split_nodes(final, self.num_list)

    # ----------------------------------------------------------------- loss
    def bpr_loss(self, params, gdev, batch, *, key=None, training: bool = True,
                 cor=None):
        embs = self.forward(params, gdev, training=training, key=key)
        u_all, i_all = embs[0], embs[1]
        u_ego, i_ego = params["embed"][0], params["embed"][1]
        loss, reg = base.bpr_with_reg(u_all, i_all, u_ego, i_ego, batch,
                                      self.cfg.mul_loss_func, self.cfg.reg)
        if self.cfg.cor_reg > 0.0 and cor is not None:
            chunks = []
            sel = [embs[0][cor["user"]], embs[1][cor["item"]]]
            if "tag" in cor and len(embs) > 2:
                sel.append(embs[2][cor["tag"]])
            all_emb = jnp.concatenate(sel, axis=0)
            chunks = jnp.split(all_emb, self.cfg.factor_k, axis=1)
            c = losses.cor_loss(chunks, self.cfg.factor_k)
            return loss, reg, self.cfg.cor_reg * c
        return loss, reg

    def predict(self, params, gdev, users):
        embs = self.forward(params, gdev, training=False)
        return base.predict_sigmoid(jnp.take(embs[0], users, axis=0), embs[1])
