"""DisenHAN — heterogeneous disentangled attention over six typed relations.

Capability parity with reference model/disenhan.py:12-221:
* relations [ui, iu, ut, tu, it, ti] with LOCAL per-type ids (src, dst type
  pairs [[0,1],[1,0],[0,2],[2,0],[1,2],[2,1]], model/disenhan.py:79,127-148)
* per layer: per-node-type per-factor projections Wtk [3, F, d, dk] (no bias)
  + LeakyReLU + per-factor L2 normalize
* ``iterate``=2 rounds: per relation an un-normalized edge score
  e_ts = ReLU([z_u ‖ z_i] · a_e), weighted by the current relation-factor
  distribution r (summed over factors), sparse-softmaxed over each source
  node's edges (torch.sparse.softmax dim=1 -> masked ELL row softmax here),
  per-factor aggregation + LeakyReLU + shared W, new factor distribution
  r = softmax_f(tanh(z) · q_e)
* per node type aggregate over its incident relations (u<-{ui,ut}, i<-{iu,it},
  t<-{tu,ti}) with residual from the layer's static projections + normalize
* factors concatenated; layers chained (layer-output concat code is dead in
  the reference, model/disenhan.py:165-180)
* quirk #7 note: the reference creates r on CPU each forward (device mismatch
  on CUDA); behaviorally it is a uniform 1/F init per forward — reproduced.
* BPR(softplus) + L2 on final embeddings.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tagrec_tpu.config import ModelConfig
from tagrec_tpu.data.graph import HeteroGraph
from tagrec_tpu.models import base
from tagrec_tpu.ops import dense_adj
from tagrec_tpu.ops import edgemap as emap
from tagrec_tpu.ops.propagate import l2_normalize


# (src_type, dst_type) per relation, matching model/disenhan.py:79
REL_TYPES = ((0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1))


class DisenHAN:
    def __init__(self, graph: HeteroGraph, cfg: ModelConfig):
        self.cfg = cfg
        self.num_list = [graph.n_user, graph.n_item, graph.n_tag]
        assert cfg.dim_latent % cfg.factor_k == 0
        self.dim_k = cfg.dim_latent // cfg.factor_k
        ui, ut, it = graph.ui_adj, graph.ut_adj, graph.it_adj
        rel_coos = [ui, ui.transpose(), ut, ut.transpose(), it, it.transpose()]
        n = graph.n_user + graph.n_item + graph.n_tag
        self.dense = dense_adj.use_dense(cfg.adj_mode, n, n)
        # No flash tier for DisenHAN — a measured dead end, removed (VERDICT
        # r1 weak #5).  The score S = sum_f relu(hs+ts)·r is elementwise over
        # [F, TI, TJ] planes (VPU work proportional to F x the score area);
        # a recompute-based flash kernel must sweep S >= 3x (fwd + row-bwd +
        # col-bwd) while the materializing XLA tier computes it ~once and
        # stores P — so flash is structurally ~3x the VPU work and measured
        # 125ms vs 52ms at hetrec scale.  (KGAT is the opposite case: its
        # dot-product scores are MXU work, recompute is nearly free, and ONE
        # big softmax dominates — flash wins 2.3x there.  DESIGN.md §8.)
        if self.dense:
            # per-relation rectangular dense edge patterns (small blocks)
            self._mask_hosts = [
                dense_adj.dense_mask_host(c.row, c.col, *c.shape)
                for c in rel_coos]
            return
        # per-relation degree-bucketed edge maps (hub nodes would otherwise
        # inflate the [F, N, K, dk] routing tensors at production scale); the
        # edgemap primitives keep fwd AND bwd scatter-free.
        self._em_hosts = [
            emap.build_edge_map(c.row, c.col, c.val, c.shape[0], c.shape[1])
            for c in rel_coos]

    def device_data(self):
        if self.dense:
            return {"masks": tuple(jnp.asarray(m) for m in self._mask_hosts)}
        return {"ems": tuple(emap.to_device(h) for h in self._em_hosts)}

    def init(self, key):
        cfg = self.cfg
        k_emb, *k_layers = jax.random.split(key, cfg.num_layer + 1)
        params = {"embed": base.init_embeddings(k_emb, self.num_list,
                                                cfg.dim_latent),
                  "layers": []}
        for kl in k_layers:
            k1, k2, k3, k4 = jax.random.split(kl, 4)
            params["layers"].append({
                "Wtk": base.xavier_uniform(k1, (3, cfg.factor_k,
                                                cfg.dim_latent, self.dim_k)),
                "at": base.xavier_uniform(k2, (6, cfg.factor_k, 2 * self.dim_k)),
                "W": base.xavier_uniform(k3, (self.dim_k, self.dim_k)),
                "q_rela": base.xavier_uniform(k4, (6, self.dim_k)),
            })
        return params

    # ------------------------------------------------------------------ core
    def _rela_update(self, lp, e, em, new_src, old_dst, r_src):
        """One relation's attention aggregation (model/disenhan.py:36-60).

        The edge score e_ts = ReLU([z_u || z_i] . a) is SEPARABLE:
        a head term constant across a row's slots plus a tail term that is a
        per-node scalar — so scores need only per-node vectors gathered per
        slot (edge_gather/rows_gather), never a [F, Nb, Kb, dk] tail tensor.

        new_src: [F, n_src, dk] routed source factors
        old_dst: [F, n_dst, dk] static destination projections
        r_src:   [F, n_src] relation-factor distribution
        """
        a = lp["at"][e]                                         # [F, 2dk]
        head_score = jnp.einsum("fnd,fd->fn", new_src, a[:, : self.dim_k])
        tail_score = jnp.einsum("fnd,fd->fn", old_dst, a[:, self.dim_k:])
        if self.dense:
            zk = dense_adj.disenhan_dense_rela(head_score, tail_score, r_src,
                                               old_dst, em)    # em = mask here
        else:
            hs = emap.rows_gather(em, head_score[..., None])    # [F, Nb, 1]
            ts = emap.edge_gather(em, tail_score)               # [F, Nb, Kb]
            rr = emap.rows_gather(em, r_src[..., None])         # [F, Nb, 1]
            e_rela = tuple(jnp.sum(jax.nn.relu(h + t) * r, axis=0)
                           for h, t, r in zip(hs, ts, rr))      # [Nb, Kb]
            soft = emap.edge_softmax(em, e_rela)
            soft_f = tuple(
                jnp.broadcast_to(p[None], (self.cfg.factor_k,) + p.shape)
                for p in soft)
            zk = emap.edge_reduce(em, soft_f, old_dst)          # [F, n_src, dk]
        zk = jax.nn.leaky_relu(zk, negative_slope=0.2)
        emb_z = zk @ lp["W"]                                    # [F, n_src, dk]
        new_r = jax.nn.softmax(
            jnp.einsum("fnd,d->fn", jnp.tanh(emb_z), lp["q_rela"][e]), axis=0)
        return new_r, emb_z

    def _layer(self, lp, gdev, embs):
        cfg = self.cfg
        ems = gdev["masks"] if self.dense else gdev["ems"]
        fac = [l2_normalize(
            jax.nn.leaky_relu(jnp.einsum("nd,fdk->fnk", embs[t], lp["Wtk"][t]),
                              negative_slope=0.2), axis=2)
            for t in range(3)]
        new = list(fac)
        n_src = [fac[REL_TYPES[e][0]].shape[1] for e in range(6)]
        r_list = [jnp.full((cfg.factor_k, n_src[e]), 1.0 / cfg.factor_k)
                  for e in range(6)]
        for _ in range(2):  # reference hardcodes iterate=2 (model/disenhan.py:157)
            rela, emb_list = [], []
            for e in range(6):
                src_t, dst_t = REL_TYPES[e]
                nr, ez = self._rela_update(lp, e, ems[e],
                                           new[src_t], fac[dst_t], r_list[e])
                rela.append(nr)
                emb_list.append(ez)

            def new_fac(ego, idx_list):
                out = ego
                for i in idx_list:
                    out = out + emb_list[i] * rela[i][:, :, None]
                return l2_normalize(out, axis=2)

            new = [new_fac(fac[0], [0, 2]),
                   new_fac(fac[1], [1, 4]),
                   new_fac(fac[2], [3, 5])]
            r_list = rela
        # concat factors per type -> [n_t, F*dk]
        return [jnp.concatenate(list(x), axis=1) for x in new]

    def forward(self, params, gdev, *, training: bool = False, key=None):
        embs = list(params["embed"])
        if len(params["layers"]) == 1:
            return tuple(self._layer(params["layers"][0], gdev, embs))
        # layers are structurally identical; after layer 1 the per-type dims
        # are all dim_latent -> scan layers 2..L over stacked params
        embs = self._layer(params["layers"][0], gdev, embs)
        rest = params["layers"][1:]
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *rest)

        def layer(carry, lp):
            return tuple(self._layer(lp, gdev, list(carry))), None

        out, _ = jax.lax.scan(layer, tuple(embs), stacked)
        return out

    def bpr_loss(self, params, gdev, batch, *, key=None, training: bool = True,
                 cor=None):
        embs = self.forward(params, gdev, training=training, key=key)
        u_all, i_all = embs[0], embs[1]
        return base.bpr_with_reg(u_all, i_all, u_all, i_all, batch,
                                 self.cfg.mul_loss_func, self.cfg.reg)

    def predict(self, params, gdev, users):
        embs = self.forward(params, gdev, training=False)
        return base.predict_sigmoid(jnp.take(embs[0], users, axis=0), embs[1])
