"""Independent torch (CPU) mirrors of the reference model semantics.

These are re-derivations of the reference math (written from SURVEY.md, not
copied) used as golden oracles: with identical init and identical batches, the
tagrec_tpu implementations must reproduce their loss/score trajectories.
"""

import numpy as np
import torch
import torch.nn.functional as F


def sparse_adj(coo):
    n = coo.shape[0]
    idx = torch.tensor(np.stack([coo.row, coo.col]), dtype=torch.long)
    return torch.sparse_coo_tensor(idx, torch.tensor(coo.val),
                                   tuple(coo.shape)).coalesce()


class TorchLightGCN:
    """model/lightgcn.py semantics: K SpMM layers, per-layer normalize,
    layer-mean, BPR(softplus) + ego L2 reg."""

    def __init__(self, graph, embed_init, reg=0.0, num_layer=3):
        self.adj = sparse_adj(graph.joint_norm_adj("bi_norm", True))
        self.embed = [torch.nn.Parameter(torch.tensor(np.asarray(e)))
                      for e in embed_init]
        self.reg = reg
        self.num_layer = num_layer
        self.nu, self.ni = graph.n_user, graph.n_item

    def parameters(self):
        return self.embed

    def forward(self):
        x = torch.cat(self.embed, 0)
        outs = [x]
        for _ in range(self.num_layer):
            x = torch.sparse.mm(self.adj, x)
            outs.append(F.normalize(x, p=2, dim=1))
        return torch.stack(outs, 1).mean(1)

    def loss(self, batch):
        u, p, n = (torch.tensor(batch[:, i], dtype=torch.long) for i in range(3))
        fin = self.forward()
        U, I = fin[: self.nu], fin[self.nu: self.nu + self.ni]
        ue, pe, ne = U[u], I[p], I[n]
        loss = F.softplus((ue * ne).sum(1) - (ue * pe).sum(1)).mean()
        eu, ei = self.embed[0][u], self.embed[1][p]
        en = self.embed[1][n]
        reg = 0.5 * (eu.norm(2) ** 2 + ei.norm(2) ** 2 + en.norm(2) ** 2) / len(u)
        return loss + self.reg * reg

    def predict(self, users):
        with torch.no_grad():
            fin = self.forward()
            U, I = fin[: self.nu], fin[self.nu: self.nu + self.ni]
            return torch.sigmoid(U[torch.tensor(users)] @ I.T).numpy()


class TorchNGCF:
    """model/ngcf.py semantics: ngcf-norm adjacency, bilinear interaction with
    (W+b) bias folding, LeakyReLU, layer concat, BPR(logsigmoid) + final reg."""

    def __init__(self, graph, embed_init, mats, reg=0.0, dims=(64, 64, 32, 16)):
        self.adj = sparse_adj(graph.joint_norm_adj("ngcf", True))
        self.embed = [torch.nn.Parameter(torch.tensor(np.asarray(e)))
                      for e in embed_init]
        self.mat = {k: torch.nn.Parameter(torch.tensor(np.asarray(v)))
                    for k, v in mats.items()}
        self.reg = reg
        self.dims = dims
        self.nu, self.ni = graph.n_user, graph.n_item

    def parameters(self):
        return self.embed + list(self.mat.values())

    def forward(self):
        x = torch.cat(self.embed, 0)
        outs = [x]
        for k in range(len(self.dims) - 1):
            nei = torch.sparse.mm(self.adj, x)
            s = F.leaky_relu((nei + x) @ (self.mat[f"W1_{k}"] + self.mat[f"b1_{k}"]),
                             negative_slope=0.2)
            b = F.leaky_relu((nei * x) @ (self.mat[f"W2_{k}"] + self.mat[f"b2_{k}"]),
                             negative_slope=0.2)
            x = s + b
            outs.append(F.normalize(x, p=2, dim=1))
        return torch.cat(outs, 1)

    def loss(self, batch):
        u, p, n = (torch.tensor(batch[:, i], dtype=torch.long) for i in range(3))
        fin = self.forward()
        U, I = fin[: self.nu], fin[self.nu: self.nu + self.ni]
        ue, pe, ne = U[u], I[p], I[n]
        loss = -F.logsigmoid((ue * pe).sum(1) - (ue * ne).sum(1)).mean()
        reg = 0.5 * (ue.norm(2) ** 2 + pe.norm(2) ** 2 + ne.norm(2) ** 2) / len(u)
        return loss + self.reg * reg


class TorchDGCF:
    """model/dgcf.py semantics: plain adjacency, factor routing with detached
    adjacency values, D^-1/2 A D^-1/2 on-the-fly renorm, score updates."""

    def __init__(self, graph, embed_init, factor_k=4, iterate_k=2, num_layer=3,
                 reg=1e-4):
        coo = graph.joint_norm_adj("plain", True)
        self.indices = torch.tensor(np.stack([coo.row, coo.col]), dtype=torch.long)
        self.n = coo.shape[0]
        self.nnz = len(coo.row)
        self.embed = [torch.nn.Parameter(torch.tensor(np.asarray(e)))
                      for e in embed_init]
        self.factor_k, self.iterate_k, self.num_layer = factor_k, iterate_k, num_layer
        self.nu, self.ni = graph.n_user, graph.n_item
        self.dim_k = self.embed[0].shape[1] // factor_k
        self.reg = reg

    def parameters(self):
        return self.embed

    def _factor_update(self, a_vals, ego_split):
        adj = torch.sparse_coo_tensor(self.indices, a_vals.detach(),
                                      (self.n, self.n)).coalesce()
        col_sum = torch.sparse.sum(adj, dim=1)
        val = 1 / torch.sqrt(col_sum.values())
        val[torch.isinf(val)] = 0.0
        d_idx = col_sum.indices()[0].unsqueeze(0).repeat(2, 1)
        D = torch.sparse_coo_tensor(d_idx, val, (self.n, self.n))
        emb = torch.sparse.mm(D, ego_split)
        emb = torch.sparse.mm(adj, emb)
        emb = torch.sparse.mm(D, emb)
        head, tail = self.indices
        h = F.normalize(emb[head], p=2, dim=1)
        t = F.normalize(ego_split[tail], p=2, dim=1)
        return emb, (h * torch.tanh(t)).sum(1)

    def forward(self):
        a_values = torch.ones(self.factor_k, self.nnz)
        ego = torch.cat(self.embed, 0)
        outs = [ego]
        for _ in range(self.num_layer):
            ego_split = torch.split(ego, self.dim_k, dim=1)
            layer_emb = []
            for t in range(self.iterate_k):
                a_factor = torch.softmax(a_values, dim=0)
                scores = []
                for i in range(self.factor_k):
                    emb, s = self._factor_update(a_factor[i], ego_split[i])
                    scores.append(s)
                    if t == self.iterate_k - 1:
                        layer_emb.append(emb)
                a_values = a_values + torch.stack(scores, 0)
            layer_emb = F.normalize(torch.stack(layer_emb), p=2, dim=2)
            ego = torch.cat(list(layer_emb), dim=1)
            outs.append(ego)
        return torch.stack(outs, 1).mean(1)

    def loss(self, batch):
        u, p, n = (torch.tensor(batch[:, i], dtype=torch.long) for i in range(3))
        fin = self.forward()
        U, I = fin[: self.nu], fin[self.nu: self.nu + self.ni]
        ue, pe, ne = U[u], I[p], I[n]
        loss = F.softplus((ue * ne).sum(1) - (ue * pe).sum(1)).mean()
        # model/dgcf.py:125-130: L2 on the EGO embeddings (uncommented there)
        eu, ei, en = self.embed[0][u], self.embed[1][p], self.embed[1][n]
        reg = 0.5 * (eu.norm(2) ** 2 + ei.norm(2) ** 2 + en.norm(2) ** 2) / len(u)
        return loss + self.reg * reg


class TorchDisenGCN:
    """model/disengcn.py semantics: per-factor projection with (W+b) folding,
    neighborhood routing with detached p values, residual + normalize, chained
    layers, factor concat."""

    def __init__(self, graph, embed_init, layer_params, factor_k=4, iterate_k=2,
                 reg=1e-4):
        coo = graph.joint_norm_adj("plain", True)
        self.indices = torch.tensor(np.stack([coo.row, coo.col]), dtype=torch.long)
        self.n = coo.shape[0]
        self.embed = [torch.nn.Parameter(torch.tensor(np.asarray(e)))
                      for e in embed_init]
        self.layers = [{k: torch.nn.Parameter(torch.tensor(np.asarray(v)))
                        for k, v in lp.items()} for lp in layer_params]
        self.factor_k, self.iterate_k = factor_k, iterate_k
        self.nu, self.ni = graph.n_user, graph.n_item
        self.reg = reg

    def parameters(self):
        ps = list(self.embed)
        for lp in self.layers:
            ps += list(lp.values())
        return ps

    def _layer(self, lp, x):
        fac = torch.matmul(x, lp["W"] + lp["b"])
        fac = F.leaky_relu(fac, negative_slope=0.2)
        fac = F.normalize(fac, p=2, dim=2)
        row, col = self.indices
        new_fac = fac
        for _ in range(self.iterate_k):
            head = new_fac[:, row]
            tail = fac[:, col]
            p = torch.softmax((head * tail).sum(2), dim=0)
            embs = []
            for i in range(self.factor_k):
                adj = torch.sparse_coo_tensor(self.indices, p[i].detach(),
                                              (self.n, self.n)).coalesce()
                e = torch.sparse.mm(adj, fac[i])
                embs.append(F.normalize(fac[i] + e, p=2, dim=1))
            new_fac = torch.stack(embs)
        return torch.cat(list(new_fac), dim=1)

    def forward(self):
        x = torch.cat(self.embed, 0)
        for lp in self.layers:
            x = self._layer(lp, x)
        return x

    def loss(self, batch):
        u, p, n = (torch.tensor(batch[:, i], dtype=torch.long) for i in range(3))
        fin = self.forward()
        U, I = fin[: self.nu], fin[self.nu: self.nu + self.ni]
        ue, pe, ne = U[u], I[p], I[n]
        loss = F.softplus((ue * ne).sum(1) - (ue * pe).sum(1)).mean()
        # model/disengcn.py:110-115: L2 on the FINAL embeddings (the ego
        # variant is commented out in the reference)
        reg = 0.5 * (ue.norm(2) ** 2 + pe.norm(2) ** 2 + ne.norm(2) ** 2) / len(u)
        return loss + self.reg * reg


class TorchDisenHAN:
    """model/disenhan.py semantics: six local-id relations, disentangled
    relation attention with iterate=2 routing."""

    REL_TYPES = ((0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1))

    def __init__(self, graph, embed_init, layer_params, factor_k=4, reg=1e-4):
        self.embed = [torch.nn.Parameter(torch.tensor(np.asarray(e)))
                      for e in embed_init]
        self.layers = [{k: torch.nn.Parameter(torch.tensor(np.asarray(v)))
                        for k, v in lp.items()} for lp in layer_params]
        self.factor_k = factor_k
        self.reg = reg
        self.nu, self.ni = graph.n_user, graph.n_item
        ui, ut, it = graph.ui_adj, graph.ut_adj, graph.it_adj
        coos = [ui, ui.transpose(), ut, ut.transpose(), it, it.transpose()]
        self.edges = [torch.tensor(np.stack([c.row, c.col]), dtype=torch.long)
                      for c in coos]
        self.shapes = [tuple(c.shape) for c in coos]
        self.dim_k = self.embed[0].shape[1] // factor_k

    def parameters(self):
        ps = list(self.embed)
        for lp in self.layers:
            ps += list(lp.values())
        return ps

    def _rela_update(self, lp, e, new_emb, old_emb, r_node):
        u, i = self.edges[e]
        all_u = new_emb[:, u]
        all_i = old_emb[:, i]
        ui = torch.cat([all_u, all_i], dim=2)
        e_ts = torch.relu(torch.matmul(ui, lp["at"][e].unsqueeze(2)).squeeze(-1))
        e_rela = (e_ts * r_node[:, u]).sum(0)
        adj = torch.sparse_coo_tensor(self.edges[e], e_rela, self.shapes[e])
        adj = torch.sparse.softmax(adj, dim=1)
        zs = []
        for k in range(self.factor_k):
            zk = torch.sparse.mm(adj, old_emb[k])
            zs.append(F.leaky_relu(zk, negative_slope=0.2))
        emb_z = torch.matmul(torch.stack(zs), lp["W"])
        new_r = torch.softmax(torch.matmul(torch.tanh(emb_z), lp["q_rela"][e]),
                              dim=0)
        return new_r, emb_z

    def _layer(self, lp, embs):
        fac = []
        for t in range(3):
            f = torch.matmul(embs[t], lp["Wtk"][t])
            f = F.leaky_relu(f, negative_slope=0.2)
            fac.append(F.normalize(f, p=2, dim=2))
        new = list(fac)
        r_list = [torch.ones(self.factor_k, self.shapes[e][0]) / self.factor_k
                  for e in range(6)]
        for _ in range(2):
            rela, emb_list = [], []
            for e in range(6):
                s, d = self.REL_TYPES[e]
                nr, ez = self._rela_update(lp, e, new[s], fac[d], r_list[e])
                rela.append(nr)
                emb_list.append(ez)

            def nf(ego, idxs):
                out = ego
                for i in idxs:
                    out = out + emb_list[i] * rela[i].unsqueeze(2)
                return F.normalize(out, p=2, dim=2)

            new = [nf(fac[0], [0, 2]), nf(fac[1], [1, 4]), nf(fac[2], [3, 5])]
            r_list = rela
        return [torch.cat(list(x), dim=1) for x in new]

    def forward(self):
        embs = list(self.embed)
        for lp in self.layers:
            embs = self._layer(lp, embs)
        return embs

    def loss(self, batch):
        u, p, n = (torch.tensor(batch[:, i], dtype=torch.long) for i in range(3))
        U, I, _ = self.forward()
        ue, pe, ne = U[u], I[p], I[n]
        loss = F.softplus((ue * ne).sum(1) - (ue * pe).sum(1)).mean()
        # model/disenhan.py:194-199: L2 on the FINAL embeddings (ego variant
        # commented out in the reference)
        reg = 0.5 * (ue.norm(2) ** 2 + pe.norm(2) ** 2 + ne.norm(2) ** 2) / len(u)
        return loss + self.reg * reg


class TorchKGATTransE:
    """model/kgat.py:127-163 semantics: squared-norm TransE phase over the
    shipped degenerate (no-propagation) KGAT."""

    def __init__(self, embed_user, embed_entity, embed_rel, transE, cor_reg=1e-4):
        self.user = torch.nn.Parameter(torch.tensor(np.asarray(embed_user)))
        self.entity = torch.nn.Parameter(torch.tensor(np.asarray(embed_entity)))
        self.rel = torch.nn.Parameter(torch.tensor(np.asarray(embed_rel)))
        self.transE = torch.nn.Parameter(torch.tensor(np.asarray(transE)))
        self.cor_reg = cor_reg

    def parameters(self):
        return [self.user, self.entity, self.rel, self.transE]

    def loss(self, batch):
        h, r, tp, tn = (torch.tensor(batch[:, i], dtype=torch.long)
                        for i in range(4))
        all_e = torch.cat([self.user, self.entity], 0)
        w = self.transE[r]
        r_e = self.rel[r]
        h_e = torch.matmul(all_e[h].unsqueeze(1), w).squeeze(1)
        p_e = torch.matmul(all_e[tp].unsqueeze(1), w).squeeze(1)
        n_e = torch.matmul(all_e[tn].unsqueeze(1), w).squeeze(1)
        pos = (h_e + r_e - p_e).norm(2, dim=1).pow(2)
        neg = (h_e + r_e - n_e).norm(2, dim=1).pow(2)
        kg = F.softplus(pos - neg).mean()
        reg = 0.5 * (h_e.norm(2) ** 2 + r_e.norm(2) ** 2 + p_e.norm(2) ** 2
                     + n_e.norm(2) ** 2) / len(h)
        return kg + self.cor_reg * reg


class TorchTGCN:
    """model/tgcn.py semantics with the quirk-#6 static neighbor tables
    supplied from outside (same tables as the jax model)."""

    def __init__(self, embed_init, weight_init, layer_params, tables,
                 dims=(64, 64, 32, 16), reg=1e-4, loss_func="logsigmoid"):
        self.embed = [torch.nn.Parameter(torch.tensor(np.asarray(e)))
                      for e in embed_init]
        self.weight = torch.nn.Parameter(torch.tensor(np.asarray(weight_init)))
        self.layers = []
        for lp in layer_params:
            t = {"atten1": {}}
            for k, d in lp["atten1"].items():
                t["atten1"][k] = {kk: torch.nn.Parameter(torch.tensor(np.asarray(vv)))
                                  for kk, vv in d.items()}
            for k in ("U", "q", "p", "bit", "Wf", "bf"):
                t[k] = torch.nn.Parameter(torch.tensor(np.asarray(lp[k])))
            t["vec"] = [torch.nn.Parameter(torch.tensor(np.asarray(v)))
                        for v in lp["vec"]]
            self.layers.append(t)
        self.tables = {k: (torch.tensor(np.asarray(i), dtype=torch.long),
                           torch.tensor(np.asarray(w), dtype=torch.long))
                       for k, (i, w) in tables.items()}
        self.dims = dims
        self.reg = reg
        self.loss_func = loss_func

    def parameters(self):
        ps = list(self.embed) + [self.weight]
        for t in self.layers:
            for d in t["atten1"].values():
                ps += list(d.values())
            ps += [t["U"], t["q"], t["p"], t["bit"], t["Wf"], t["bf"]] + t["vec"]
        return ps

    @staticmethod
    def _atten1(ap, ev, ej0, ew0, v_j, v_w):
        eNj = ej0[v_j]
        eNw = ew0[v_w]
        k = v_j.shape[1]
        eNv = ev.unsqueeze(1).repeat(1, k, 1)
        cat = torch.cat([eNv, eNw], dim=-1)
        av = torch.matmul(cat, ap["W1"]) + torch.matmul(eNj, ap["W2"]) + ap["b"]
        x = torch.matmul(torch.relu(av), ap["v"].T)
        a = torch.softmax(x, dim=1)
        return (a * eNj).sum(1)

    @staticmethod
    def _atten2(t, u, i, tt):
        uit = torch.stack([u, i, tt], dim=1)
        x = torch.matmul(uit, t["U"]) + t["q"]
        x = torch.matmul(torch.relu(x), t["p"].T)
        b = torch.softmax(x, dim=1)
        return b * uit

    @staticmethod
    def _conv(t, eN):
        bit = torch.relu(torch.einsum("ncd,oc->nod", eN, t["bit"]))
        bit = bit.reshape(eN.shape[0], -1)
        vecs = []
        for j, w in zip((1, 2, 3), t["vec"]):
            outs = [torch.einsum("ncd,ocd->no", eN[:, p:p + j, :], w)
                    for p in range(3 - j + 1)]
            y = torch.relu(torch.stack(outs, dim=2))
            vecs.append(y.reshape(eN.shape[0], -1))
        return torch.cat([bit] + vecs, dim=1)

    def forward(self):
        eu, ei, et = self.embed
        dw = self.weight.shape[1]
        ew0 = torch.cat([torch.zeros(1, dw), self.weight], 0)
        outs_u, outs_i, outs_t = [eu], [ei], [et]
        for t in self.layers:
            z = torch.zeros(1, eu.shape[1])
            eu0 = torch.cat([z, eu], 0)
            ei0 = torch.cat([z, ei], 0)
            et0 = torch.cat([z, et], 0)
            a1 = t["atten1"]
            eu_iN = self._atten1(a1["item"], eu, ei0, ew0, *self.tables["u_iw"])
            eu_tN = self._atten1(a1["tag"], eu, et0, ew0, *self.tables["u_tw"])
            ei_uN = self._atten1(a1["user"], ei, eu0, ew0, *self.tables["i_uw"])
            ei_tN = self._atten1(a1["tag"], ei, et0, ew0, *self.tables["i_tw"])
            et_uN = self._atten1(a1["user"], et, eu0, ew0, *self.tables["t_uw"])
            et_iN = self._atten1(a1["item"], et, ei0, ew0, *self.tables["t_iw"])
            euN = self._atten2(t, eu, eu_iN, eu_tN)
            eiN = self._atten2(t, ei_uN, ei, ei_tN)
            etN = self._atten2(t, et_uN, et_iN, et)
            eu = torch.relu(torch.matmul(self._conv(t, euN), t["Wf"]) + t["bf"])
            ei = torch.relu(torch.matmul(self._conv(t, eiN), t["Wf"]) + t["bf"])
            et = torch.relu(torch.matmul(self._conv(t, etN), t["Wf"]) + t["bf"])
            outs_u.append(F.normalize(eu, p=2, dim=1))
            outs_i.append(F.normalize(ei, p=2, dim=1))
            outs_t.append(F.normalize(et, p=2, dim=1))
        return (torch.cat(outs_u, 1), torch.cat(outs_i, 1), torch.cat(outs_t, 1))

    def loss(self, batch):
        u, p, n = (torch.tensor(batch[:, i], dtype=torch.long) for i in range(3))
        U, I, _ = self.forward()
        ue, pe, ne = U[u], I[p], I[n]
        if self.loss_func == "logsigmoid":
            loss = -F.logsigmoid((ue * pe).sum(1) - (ue * ne).sum(1)).mean()
        else:
            loss = F.softplus((ue * ne).sum(1) - (ue * pe).sum(1)).mean()
        reg = 0.5 * (ue.norm(2) ** 2 + pe.norm(2) ** 2 + ne.norm(2) ** 2) / len(u)
        return loss + self.reg * reg


class TorchKGATDegenerate:
    """Shipped-config KGAT (quirk #3): forward returns ego embeddings (no
    propagation) -> BPR over user/entity tables + squared TransE phase."""

    def __init__(self, embed_user, embed_entity, embed_rel, transE,
                 reg=1e-4, cor_reg=1e-4):
        self.transe = TorchKGATTransE(embed_user, embed_entity, embed_rel,
                                      transE, cor_reg)
        self.reg = reg
        self.nu = self.transe.user.shape[0]

    def parameters(self):
        return self.transe.parameters()

    def loss(self, batch):  # BPR phase
        u, p, n = (torch.tensor(batch[:, i], dtype=torch.long) for i in range(3))
        U, E = self.transe.user, self.transe.entity
        ue, pe, ne = U[u], E[p], E[n]
        loss = F.softplus((ue * ne).sum(1) - (ue * pe).sum(1)).mean()
        reg = 0.5 * (ue.norm(2) ** 2 + pe.norm(2) ** 2 + ne.norm(2) ** 2) / len(u)
        return loss + self.reg * reg

    def loss_transe(self, batch):
        return self.transe.loss(batch)

    def forward_scores(self, users):
        with torch.no_grad():
            U, E = self.transe.user, self.transe.entity
            return torch.sigmoid(U[torch.tensor(users)] @ E.T).numpy()


class TorchKGATBiInter:
    """Intended-KGAT semantics (agg_type='bi_inter', model/kgat.py:63-125):
    relation-projected attention pi = (W_r e_t) . tanh(W_r e_h + e_r), row
    softmax over each head's out-edges, three bi-interaction layers with
    (W + b) bias folding (quirk #4), per-layer L2 normalize, concat readout;
    BPR(softplus) + L2 on FINAL embeddings; squared TransE phase.

    ``edges``: list over relations of (head_ids, tail_ids) in the GLOBAL
    (user, entity) id space — the six tag-graph relations or a KG triplet
    set.  Dense [n, n] attention (tiny test graphs only).
    """

    def __init__(self, edges, embed_user, embed_entity, embed_rel, transE,
                 mats, reg=1e-4, cor_reg=1e-4, num_layer=3):
        def P(x):
            return torch.nn.Parameter(torch.tensor(np.asarray(x)))

        self.user, self.entity = P(embed_user), P(embed_entity)
        self.rel, self.transE = P(embed_rel), P(transE)
        self.mats = {k: P(v) for k, v in mats.items()}
        self.edges = [(torch.tensor(np.asarray(h), dtype=torch.long),
                       torch.tensor(np.asarray(t), dtype=torch.long))
                      for h, t in edges]
        self.reg, self.cor_reg = reg, cor_reg
        self.num_layer = num_layer
        self.nu = self.user.shape[0]
        self.n = self.user.shape[0] + self.entity.shape[0]
        has_edge = torch.zeros(self.n, dtype=torch.bool)
        for h, _ in self.edges:
            has_edge[h] = True
        self.row_mask = has_edge.float().unsqueeze(1)

    def parameters(self):
        return [self.user, self.entity, self.rel, self.transE,
                *self.mats.values()]

    def forward(self):
        x = torch.cat([self.user, self.entity], 0)
        neg = torch.full((self.n, self.n), -1e30)
        pai_list = []
        for r, (h, t) in enumerate(self.edges):
            ph = x[h] @ self.transE[r] + self.rel[r]
            pt = x[t] @ self.transE[r]
            pai_list.append(((h, t), (pt * torch.tanh(ph)).sum(1)))
        A = neg.index_put([torch.cat([h for (h, t), _ in pai_list]),
                           torch.cat([t for (h, t), _ in pai_list])],
                          torch.cat([v for _, v in pai_list]))
        S = torch.softmax(A, dim=1) * self.row_mask
        outs = [x]
        for k in range(self.num_layer):
            nei = S @ x
            s = F.leaky_relu((nei + x) @ (self.mats[f"W1_{k}"]
                                          + self.mats[f"b1_{k}"]), 0.2)
            b = F.leaky_relu((nei * x) @ (self.mats[f"W2_{k}"]
                                          + self.mats[f"b2_{k}"]), 0.2)
            x = s + b
            outs.append(F.normalize(x, p=2, dim=1))
        return torch.cat(outs, 1)

    def loss(self, batch):  # BPR phase; reg on FINAL embeddings
        u, p, n = (torch.tensor(batch[:, i], dtype=torch.long)
                   for i in range(3))
        fin = self.forward()
        U, E = fin[: self.nu], fin[self.nu:]
        ue, pe, ne = U[u], E[p], E[n]
        loss = F.softplus((ue * ne).sum(1) - (ue * pe).sum(1)).mean()
        reg = 0.5 * (ue.norm(2) ** 2 + pe.norm(2) ** 2
                     + ne.norm(2) ** 2) / len(u)
        return loss + self.reg * reg

    def loss_transe(self, batch):
        h, r, tp, tn = (torch.tensor(batch[:, i], dtype=torch.long)
                        for i in range(4))
        x = torch.cat([self.user, self.entity], 0)
        w = self.transE[r]
        r_e = self.rel[r]
        h_e = torch.einsum("bd,bde->be", x[h], w)
        p_e = torch.einsum("bd,bde->be", x[tp], w)
        n_e = torch.einsum("bd,bde->be", x[tn], w)
        pos = ((h_e + r_e - p_e) ** 2).sum(1)
        negs = ((h_e + r_e - n_e) ** 2).sum(1)
        kg = F.softplus(-(negs - pos)).mean()
        reg = 0.5 * (h_e.norm(2) ** 2 + r_e.norm(2) ** 2 + p_e.norm(2) ** 2
                     + n_e.norm(2) ** 2) / len(h)
        return kg + self.cor_reg * reg


def tgcn_transtag_loss(mirror, batch, margin=1.0, transtag_reg=1e-4):
    """Phase-2 TransTag margin loss on TorchTGCN ego embeddings
    (model/tgcn.py:251-261)."""
    u, t, ip, ineg = (torch.tensor(batch[:, i], dtype=torch.long)
                      for i in range(4))
    eu, ei, et = mirror.embed
    ue, te, pe, ne = eu[u], et[t], ei[ip], ei[ineg]
    pos = (ue + te - pe).norm(2, dim=1)
    neg = (ue + te - ne).norm(2, dim=1)
    loss = torch.relu(margin + pos - neg).mean()
    reg = 0.5 * (ue.norm(2) ** 2 + te.norm(2) ** 2 + pe.norm(2) ** 2
                 + ne.norm(2) ** 2) / len(u)
    return loss + transtag_reg * reg
