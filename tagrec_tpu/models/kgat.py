"""KGAT (on the tag tripartite graph) — relation-projected attention + TransE phase.

Capability parity with reference model/kgat.py:10-170, as wired by com.py:77-86
(kgat_comp uses TGCN_load, so KGAT runs over the six tag-graph relations
[ui, iu, ut, tu, it, ti], not kg_final.txt — SURVEY quirk #2):

* entities = items then tags (global ids offset by n_user); 6 relations
* attention per typed edge: π = (W_r e_t) · tanh(W_r e_h + e_r)
  (model/kgat.py:69-77), row-softmax over each head's outgoing edges
  (torch.sparse.softmax dim=1, model/kgat.py:97)
* NGCF-style bi-interaction propagation over the attention adjacency with
  layer concat (model/kgat.py:106-125), bias folded into weights (quirk #4)
* **quirk #3 reproduced**: the shipped config sets agg_type="bi_agg" but the
  code checks "bi_inter" (utility/config.py:58 vs model/kgat.py:100), so by
  default propagation is SKIPPED and KGAT degenerates to MF + TransE.  Set
  agg_type="bi_inter" for the intended propagation.  (The reference's
  attention construction additionally has a latent [2,E][:,0] shape bug,
  model/kgat.py:71-72, which the skip makes unobservable; here the attention
  math is implemented correctly for the bi_inter path.)
* ``predict`` scores users against ALL entities (items + tags), matching
  predict_rating's use of the full entity table (model/kgat.py:165-169) —
  the evaluator is score-width agnostic, so metric semantics match.
* phase-2 TransE with per-relation projections and squared-norm softplus loss
  (model/kgat.py:127-141,155-163), reg scaled by cor_reg.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from tagrec_tpu.config import ModelConfig
from tagrec_tpu.data.graph import HeteroGraph
from tagrec_tpu.models import base
from tagrec_tpu.ops import dense_adj
from tagrec_tpu.ops import edgemap as emap
from tagrec_tpu.ops import flash_attention
from tagrec_tpu.ops import losses
from tagrec_tpu.ops.propagate import l2_normalize, message_dropout

# relation id for (row type -> col type) sectors, matching
# data.graph.relation_edges order [ui, iu, ut, tu, it, ti]
REL_OF = ((-1, 0, 2), (1, -1, 4), (3, 5, -1))


class KGAT:
    def __init__(self, graph: HeteroGraph, cfg: ModelConfig, kg=None):
        """kg: optional tagrec_tpu.data.kg.KnowledgeGraph — when given, KGAT
        runs over the true knowledge graph (entities + typed relations from
        kg_final.txt, the reference's exported-but-dead KGAT_load path,
        data/kgat_load.py:8-50) instead of the six tag-graph relations."""
        self.cfg = cfg
        self.num_user = graph.n_user
        self.dims = [cfg.dim_latent] + list(cfg.dim_layer_list)
        # quirk #3 (shipped config, agg_type="bi_agg"): forward() never
        # propagates, so no adjacency/attention structure is ever read —
        # skip building it entirely.  At 10x scale the edge-map fallback
        # otherwise costs ~10 min of host build + multi-GB device tables
        # for a config that never touches them.  transe_loss/predict only
        # read params.
        self.skip_adj = cfg.agg_type != "bi_inter"

        if kg is not None:
            # knowledge-graph mode: triples are (h, r, t) over users+entities
            assert kg.num_entity >= graph.n_item, (
                "items must be a prefix of the entity space "
                f"(data/kgat_load.py convention): n_item={graph.n_item} > "
                f"num_entity={kg.num_entity}")
            self.num_entity = kg.num_entity
            self.num_relation = kg.num_relation
            self.n = self.num_user + self.num_entity
            trips = kg.all_triplet
            rows = trips[:, 0].astype(np.int64)
            cols = trips[:, 2].astype(np.int64)
            rels = trips[:, 1].astype(np.int64)
        else:
            # tag-graph mode (reference wiring, com.py:78 / quirk #2)
            self.num_entity = graph.n_item + graph.n_tag
            self.num_relation = 6
            self.n = self.num_user + self.num_entity
            rel_edges = graph.relation_edges()
            rows = np.concatenate([rel_edges[k][0] for k in range(6)])
            cols = np.concatenate([rel_edges[k][1] for k in range(6)])
            rels = np.concatenate([np.full(rel_edges[k].shape[1], k,
                                           dtype=np.int64)
                                   for k in range(6)])
        # Execution mode (semantics-neutral): dense MXU-streamed attention at
        # small/medium N, bucketed edge maps otherwise.  In KG mode the
        # relation is per EDGE (not sector-determined), so the dense tier
        # uses a per-cell int8 relation-id matrix + select-accumulated
        # relation score planes (ops.dense_adj.rel_dense_row_softmax_scores,
        # round 3: 1.6M-edge gathers lose to R extra MXU planes); it engages
        # only when the edge set is dense-representable (no parallel (h, t)
        # edges, <=127 relations) and falls back to the edge maps otherwise.
        self.kg_rel_dense = False
        self.dense = self.flash = False
        if self.skip_adj:
            return
        if kg is not None and dense_adj.use_dense(cfg.adj_mode, self.n,
                                                  self.n):
            rel_id = dense_adj.rel_id_host(rows, cols, rels, self.n, self.n)
            if rel_id is not None:
                self.kg_rel_dense = True
                self._rel_id_host = rel_id
                # static row segments: user rows carry only the relations
                # actually observed with a user head (relation 0, UI), entity
                # rows the rest — skips the provably-empty score planes per
                # chunk (VERDICT r4 item 7; ~R_user/R of the plane FLOPs on
                # the user rows).
                user_rels = tuple(sorted(set(
                    int(r) for r in np.unique(rels[rows < self.num_user]))))
                ent_rels = tuple(sorted(set(
                    int(r) for r in np.unique(rels[rows >= self.num_user]))))
                self._kg_row_segments = (
                    (0, self.num_user, user_rels),
                    (self.num_user, self.num_entity, ent_rels))
                return
        self.dense = (kg is None
                      and dense_adj.use_dense(cfg.adj_mode, self.n, self.n))
        self.flash = self.dense and cfg.adj_mode != "dense_xla"
        if self.dense:
            self.segs = ((0, graph.n_user),
                         (graph.n_user, graph.n_item),
                         (graph.n_user + graph.n_item, graph.n_tag))
            if self.flash:
                self._flash_masks = self._build_flash_masks(rows, cols, rels)
            else:
                self._mask_host = dense_adj.dense_mask_host(rows, cols,
                                                            self.n, self.n)
            return
        # TWO EdgeMaps over the same edges: a node-keyed map for the
        # row-softmax over each head's out-edges (torch.sparse.softmax dim=1,
        # model/kgat.py:97) and the propagation SpMM, plus a
        # (relation, node)-keyed map on which the attention scores
        # pi = (W_r e_t).tanh(W_r e_h + e_r) are pure edge_dot products of the
        # dense per-relation projection tables — so BOTH the scores and their
        # cotangents are gathers (no scatter-add anywhere in the step).
        rk = rels * self.n
        self._em_host = emap.build_edge_map(rows, cols, None, self.n, self.n)
        self._emk_host = emap.build_edge_map(
            rk + rows, rk + cols, None, self.num_relation * self.n,
            self.num_relation * self.n)
        self._k2n, self._n2k = emap.cross_slot_maps(self._emk_host,
                                                    self._em_host)

    def _build_flash_masks(self, rows, cols, rels):
        """Per-row-type sector-pair masks in the two-segment padded column
        layout consumed by ops.flash_attention.dot_flash_* (int8, host)."""
        import numpy as np

        tile = flash_attention.TILE_I

        def pad_len(x):
            return -(-x // tile) * tile

        masks = []
        for a in range(3):
            c1, c2 = [c for c in range(3) if c != a]
            sa, la = self.segs[a]
            s1, l1 = self.segs[c1]
            s2, l2 = self.segs[c2]
            m = np.zeros((pad_len(la), pad_len(l1) + pad_len(l2)), np.int8)
            for c, (sc, lc), off in ((c1, (s1, l1), 0),
                                     (c2, (s2, l2), pad_len(l1))):
                r = REL_OF[a][c]
                sel = rels == r
                m[rows[sel] - sa, cols[sel] - sc + off] = 1
            masks.append(m)
        return masks

    def device_data(self):
        if self.skip_adj:
            return {}
        if self.kg_rel_dense:
            return {"rel_id": jnp.asarray(self._rel_id_host)}
        if self.dense and self.flash:
            return {"fmasks": tuple(jnp.asarray(m) for m in self._flash_masks)}
        if self.dense:
            return {"mask": jnp.asarray(self._mask_host)}
        return {"em": emap.to_device(self._em_host),
                "emk": emap.to_device(self._emk_host),
                "k2n": tuple(jnp.asarray(t) for t in self._k2n),
                "n2k": tuple(jnp.asarray(t) for t in self._n2k)}

    def init(self, key):
        cfg = self.cfg
        ks = jax.random.split(key, 4 + 4 * cfg.num_layer)
        params = {
            "user": base.xavier_uniform(ks[0], (self.num_user, cfg.dim_latent)),
            "entity": base.xavier_uniform(ks[1], (self.num_entity, cfg.dim_latent)),
            "relation": base.xavier_uniform(ks[2], (self.num_relation,
                                                    cfg.dim_relation)),
            "transE": base.xavier_uniform(ks[3], (self.num_relation,
                                                  cfg.dim_latent,
                                                  cfg.dim_relation)),
            "mat": {},
        }
        for k in range(cfg.num_layer):
            d_in, d_out = self.dims[k], self.dims[k + 1]
            params["mat"][f"W1_{k}"] = base.xavier_uniform(ks[4 + 4 * k], (d_in, d_out))
            params["mat"][f"b1_{k}"] = base.xavier_uniform(ks[5 + 4 * k], (1, d_out))
            params["mat"][f"W2_{k}"] = base.xavier_uniform(ks[6 + 4 * k], (d_in, d_out))
            params["mat"][f"b2_{k}"] = base.xavier_uniform(ks[7 + 4 * k], (1, d_out))
        return params

    def _flash_att_mm(self, q, proj, fmasks):
        """Flash-attention propagation: per row type, one stats sweep over the
        two-segment column layout (softmax spans ALL of a head's out-edges,
        model/kgat.py:97), then P is rebuilt tile-wise for every layer matmul
        and for the flash backward — [N, N] never exists in HBM."""
        tile = flash_attention.TILE_I

        def pad0(t):
            return flash_attention._pad_axis(t, tile, 0)

        plans = []
        for a in range(3):
            c1, c2 = [c for c in range(3) if c != a]
            r1, r2 = REL_OF[a][c1], REL_OF[a][c2]
            sa, la = self.segs[a]
            s1, l1 = self.segs[c1]
            s2, l2 = self.segs[c2]
            q2 = jnp.stack([pad0(q[r1, sa:sa + la]),
                            pad0(q[r2, sa:sa + la])])
            kcat = jnp.concatenate([pad0(proj[r1, s1:s1 + l1]),
                                    pad0(proj[r2, s2:s2 + l2])])
            split_j = (-(-l1 // tile) * tile) // flash_attention.TILE_J
            # stats are a redundant reparameterization of softmax(S) — the
            # apply op's flash backward carries the whole gradient, so the
            # stats sweep itself must not be differentiated
            ms, zs = flash_attention.dot_flash_stats(
                jax.lax.stop_gradient(q2), jax.lax.stop_gradient(kcat),
                fmasks[a], split_j)
            plans.append((q2, kcat, ms, zs, split_j, la, (s1, l1, s2, l2)))

        def att_mm(x):
            outs = []
            for a, (q2, kcat, ms, zs, split_j, la, (s1, l1, s2, l2)) in \
                    enumerate(plans):
                xcat = jnp.concatenate([pad0(x[s1:s1 + l1]),
                                        pad0(x[s2:s2 + l2])])
                out = flash_attention.dot_flash_apply(
                    q2, kcat, fmasks[a], ms, zs, xcat, split_j)
                outs.append(out[:la])
            return jnp.concatenate(outs, axis=0)

        return att_mm

    def _propagate(self, params, all_embed, gdev, training, key):
        """bi-interaction propagation over the attention adjacency."""
        cfg = self.cfg

        # dense per-relation projections: head side tanh(W_r e + e_r), tail
        # side W_r e.
        proj = jnp.einsum("nd,rde->rne", all_embed, params["transE"])
        q = jnp.tanh(proj + params["relation"][:, None, :])

        if self.kg_rel_dense:
            # true-KG dense tier: per-cell relation select over R MXU score
            # planes -> ONE [N, N] attention matrix reused by the layers.
            # adj_dtype=bf16 additionally runs the score planes in bf16.
            p_att = dense_adj.rel_dense_row_softmax_scores(
                q, proj, gdev["rel_id"],
                score_dtype=jnp.bfloat16 if cfg.adj_dtype == "bf16"
                else jnp.float32,
                row_segments=self._kg_row_segments)

            def att_mm(x):
                return p_att @ x
        elif self.dense and self.flash:
            att_mm = self._flash_att_mm(q, proj, gdev["fmasks"])
        elif self.dense:
            # sector-stacked scores -> ONE [N, N] row-softmax attention matrix
            # P, streamed through the MXU by the three propagation layers.
            qhat, khat = dense_adj.sector_stack(q, proj, self.segs, REL_OF)
            p_att = dense_adj.dense_row_softmax_scores(qhat, khat,
                                                       gdev["mask"])

            def att_mm(x):
                return p_att @ x
        else:
            # attention over the (relation, node)-keyed map is a pure per-edge
            # dot product — scores and their cotangents are gathers (no
            # scatter-add anywhere in the step).
            em, emk = gdev["em"], gdev["emk"]
            pai_k = emap.edge_dot(emk, q.reshape(-1, cfg.dim_relation),
                                  proj.reshape(-1, cfg.dim_relation))
            pai = emap.slot_transfer(pai_k, gdev["k2n"], gdev["n2k"])
            att = emap.edge_softmax(em, pai)

            def att_mm(x):
                return emap.edge_reduce(em, att, x)

        x = all_embed
        outs = [x]
        for k in range(cfg.num_layer):
            nei = att_mm(x)
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
        return jnp.concatenate(outs, axis=1)

    # --------------------------------------------------------------- forward
    def forward(self, params, gdev, *, training: bool = False, key=None):
        all_embed = jnp.concatenate([params["user"], params["entity"]], axis=0)
        if self.cfg.agg_type == "bi_inter":
            all_embed = self._propagate(params, all_embed, gdev, training, key)
        # else: quirk #3 — propagation skipped, ego embeddings returned
        return (all_embed[: self.num_user], all_embed[self.num_user:])

    # ----------------------------------------------------------------- loss
    def bpr_loss(self, params, gdev, batch, *, key=None, training: bool = True):
        u_all, e_all = self.forward(params, gdev, training=training, key=key)
        # items occupy the first n_item entity rows; batch ids are item ids
        return base.bpr_with_reg(u_all, e_all, u_all, e_all, batch,
                                 self.cfg.mul_loss_func, self.cfg.reg)

    def transe_loss(self, params, gdev, batch, *, key=None):
        """(h, r, t+, t-) — per-relation projected squared-norm TransE
        (model/kgat.py:127-141,155-163)."""
        h, r, tp, tn = batch[:, 0], batch[:, 1], batch[:, 2], batch[:, 3]
        all_embed = jnp.concatenate([params["user"], params["entity"]], axis=0)
        w = jnp.take(params["transE"], r, axis=0)               # [B, d, dr]
        r_e = jnp.take(params["relation"], r, axis=0)
        h_e = jnp.einsum("bd,bde->be", jnp.take(all_embed, h, axis=0), w)
        p_e = jnp.einsum("bd,bde->be", jnp.take(all_embed, tp, axis=0), w)
        n_e = jnp.einsum("bd,bde->be", jnp.take(all_embed, tn, axis=0), w)
        kg_loss = losses.transe_loss_sq(h_e, r_e, p_e, n_e)
        reg = losses.l2reg_loss(h_e, r_e, p_e, n_e)
        return kg_loss, self.cfg.cor_reg * reg

    # -------------------------------------------------------------- predict
    def predict(self, params, gdev, users):
        u_all, e_all = self.forward(params, gdev, training=False)
        return base.predict_sigmoid(jnp.take(u_all, users, axis=0), e_all)
