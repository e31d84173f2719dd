"""TGCN — tag-aware GCN with dual attention + convolutional fusion.

Capability parity with reference model/tgcn.py:11-268:
* padded fixed-width (k=25) neighbor tables for the six relations
  [ui, ut, iu, it, tu, ti] (data/tgcn_load.py:27-53), ids shifted +1 with row 0
  as zero padding; interaction-multiplicity ("weight") embeddings participate
  in attention scores
* per layer ``BasicLayer``: (1) Attention1 per *neighbor type* (shared between
  e.g. user-gathers-items and tag-gathers-items): softmax over the k sampled
  neighbors of score ReLU([e_v ‖ e_w]W1 + e_j W2 + b)·vᵀ; (2) Attention2 fusing
  the three per-type aggregates with a tiny softmax gate; (3) 2D convolutions
  over the stacked [3, d] matrix — bit-level (3,1)x32ch + vector-level
  (j,d), j∈{1,2,3}, x8ch — expressed as dense einsums here; (4) linear fusion
* final = concat of [ego, normalized layer outputs] (dims 64+64+32+16)
* quirk #6 reproduced: the reference's per-layer ``sample()`` shuffles an index
  array it never uses and always takes the first k columns of tables sampled
  once at init (model/tgcn.py:196-199) — i.e. neighbor tables are effectively
  STATIC.  Default here matches (tables sampled once on host at build time);
  set ``resample_each_layer=True`` for true on-device per-layer resampling:
  the full CSR neighbor lists live on device and each layer draws k fresh
  with-replacement samples per node from them (the intended behavior; no
  truncation for degree > k nodes).
* phase-1 BPR(logsigmoid) + L2 on final embeddings; phase-2 TransTag margin
  loss on ego embeddings (model/tgcn.py:251-261).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from tagrec_tpu.config import ModelConfig
from tagrec_tpu.data.graph import COO, HeteroGraph
from tagrec_tpu.models import base
from tagrec_tpu.ops import edgemap as emap
from tagrec_tpu.ops import losses
from tagrec_tpu.ops.propagate import l2_normalize, message_dropout


_DEDUP_WIDTHS = (4, 8, 12, 16, 20, 25)


def _build_dedup_buckets(idx: np.ndarray, w: np.ndarray,
                         widths=_DEDUP_WIDTHS):
    """Compress a sampled [N, k] neighbor table into degree-bucketed DISTINCT
    (neighbor, weight) pairs with multiplicities.

    The reference samples k=25 neighbors WITH replacement per node
    (data/utils.py:67-84), so low-degree nodes repeat the same pair many
    times; on this chip gathers are issue-rate-bound per ROW (DESIGN.md §8 —
    bf16 halving bytes bought only 13%), so the win is gathering each
    distinct pair ONCE and folding the duplicate count into the softmax:
    softmax over 25 slots with duplicates == multiplicity-weighted softmax
    over distinct pairs (exact, same exp values grouped).  Measured 1.89x
    fewer gathered rows at hetrec scale after bucket padding.

    Returns (buckets, inv): buckets = list of (rows [Nb], ids [Nb, W],
    wids [Nb, W], mult [Nb, W] f32, W), pad slots have mult 0; inv[n] =
    position of node n in the concatenated bucket row order.
    """
    n, k = idx.shape
    if widths[-1] < k:
        # configs with neighbor_k beyond the default ladder get extra rungs
        # (multiples of 8 for lane-friendly tiles) capped by k itself
        extra = tuple(range(widths[-1] + 7, k, 8))
        widths = widths + extra + (k,)
    # vectorized per-row unique: encode (neighbor, weight) pairs, sort each
    # row, run-length-encode.  new[:, 0] is always True, so each row's last
    # run is terminated by the next row's first flat position — one global
    # diff yields all run lengths.
    m = int(w.max()) + 1
    enc = idx.astype(np.int64) * m + w.astype(np.int64)
    s = np.sort(enc, axis=1)
    new = np.ones_like(s, dtype=bool)
    new[:, 1:] = s[:, 1:] != s[:, :-1]
    dcount = new.sum(1)
    flat = np.flatnonzero(new.ravel())
    counts = np.diff(np.append(flat, n * k))
    vals = s.ravel()[flat]
    # padded [n, k] distinct matrices (row r uses its first dcount[r] cols)
    row_of = np.repeat(np.arange(n), dcount)
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(dcount, out=starts[1:])
    col_of = np.arange(len(flat)) - starts[row_of]
    ids_m = np.zeros((n, k), dtype=np.int32)
    wid_m = np.zeros((n, k), dtype=np.int32)
    mul_m = np.zeros((n, k), dtype=np.float32)
    ids_m[row_of, col_of] = vals // m
    wid_m[row_of, col_of] = vals % m
    mul_m[row_of, col_of] = counts

    order = []
    buckets = []
    for wi, width in enumerate(widths):
        lo = 0 if wi == 0 else widths[wi - 1]
        rows = np.nonzero((dcount > lo) & (dcount <= width))[0]
        if len(rows) == 0:
            continue
        buckets.append((rows.astype(np.int32), ids_m[rows, :width],
                        wid_m[rows, :width], mul_m[rows, :width]))
        order.append(rows)
    inv = np.empty(n, dtype=np.int32)
    inv[np.concatenate(order)] = np.arange(n, dtype=np.int32)
    return buckets, inv


def _sample_neighbor_table(coo: COO, k: int, rng: np.random.Generator):
    """Sample k neighbors (with replacement) + weights per row; ids +1, 0=pad.

    Equivalent to taking the first k columns of the reference's max-degree
    tables (data/utils.py:87-106 + model/tgcn.py:197-199).

    Known delta: the reference's ``all_neighbor_sample`` switches to sampling
    WITHOUT replacement for rows whose degree reaches the table width
    (data/utils.py:98-101); we always sample with replacement.  The cases
    differ only for rows with degree in (k, max_deg] truncated to k — a
    vanishing fraction at the shipped k=25 — and the slot-dedup tier's
    multiplicity-weighted softmax is exact for either draw, so distributions
    are indistinguishable in every parity run (PARITY.md tgcn rows).
    """
    from tagrec_tpu import runtime

    n = coo.shape[0]
    order = np.argsort(coo.row, kind="stable")
    rows, cols, vals = coo.row[order], coo.col[order], coo.val[order]
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(rows, minlength=n), out=starts[1:])
    return runtime.neighbor_sample_csr(starts, cols, vals, k,
                                       int(rng.integers(0, 2**63 - 1)))


class TGCN:
    # neighbor-table order (data/tgcn_load.py:29): ui, ut, iu, it, tu, ti
    REL_ORDER = ("u_iw", "u_tw", "i_uw", "i_tw", "t_uw", "t_iw")

    def __init__(self, graph: HeteroGraph, cfg: ModelConfig,
                 resample_each_layer: bool = False, sample_seed: int = 0):
        self.cfg = cfg
        self.num_list = [graph.n_user, graph.n_item, graph.n_tag]
        self.num_weight = graph.num["weight"]
        self.dims = [cfg.dim_latent] + list(cfg.dim_layer_list)
        self.resample_each_layer = resample_each_layer

        rng = np.random.default_rng(sample_seed)
        adjs = [graph.ui_adj, graph.ut_adj, graph.ui_adj.transpose(),
                graph.it_adj, graph.ut_adj.transpose(),
                graph.it_adj.transpose()]
        self._tables = [
            _sample_neighbor_table(a, cfg.neighbor_k, rng) for a in adjs]

        # resample_each_layer: full CSR neighbor lists (cols +1-shifted,
        # weight ids) so each layer can draw k FRESH with-replacement samples
        # per node on device — no truncation of degree > k support.
        self._csr_host = []
        if resample_each_layer:
            for a in adjs:
                order = np.argsort(a.row, kind="stable")
                cols = a.col[order].astype(np.int32) + 1
                w = a.val[order].astype(np.int32)
                starts = np.zeros(a.shape[0] + 1, dtype=np.int32)
                np.cumsum(np.bincount(a.row, minlength=a.shape[0]),
                          out=starts[1:])
                self._csr_host.append((starts, cols, w))

        # Optional EdgeMap formulation (adj_mode="ell"): each [N, k] neighbor
        # table IS a fixed edge set over the (N_col+1)-shifted node space —
        # pads are real edges to node 0 (whose embedding row is zero), so the
        # reference's pad-including softmax over k stays exact
        # (model/tgcn.py:30-33).  edge_vgather turns every table gather's
        # COTANGENT into transpose-structure gathers (no scatter-add in the
        # backward).  MEASURED on the chip (hetrec scale, DESIGN.md §8) this
        # does NOT win: the step is bound by raw gather/scatter throughput
        # (~12x off the HBM roofline either way) — plain 60.1ms vs edgemap
        # 64.3ms — so the plain jnp.take path stays the default and the
        # EdgeMap path is kept behind adj_mode="ell" (it also guards the
        # edge_vgather primitive with a production-shaped consumer).
        # em_j and em_w share one fwd slot layout (identical rows/degrees;
        # the fwd ELL bucketing is column-independent) but carry their own
        # transpose structures over the node resp. weight-id spaces.
        # Default (adj_mode="auto") execution tier: degree-bucketed DEDUPED
        # tables (see _build_dedup_buckets — 1.9x fewer gathered rows, exact
        # same math).  adj_mode="dense_xla" keeps the plain 25-wide takes
        # (the materializing tier); "ell" the EdgeMap tier.  Per-layer
        # resampling draws fresh tables each step, so it keeps plain takes.
        self._dedup_host = []
        if cfg.adj_mode == "auto" and not resample_each_layer:
            self._dedup_host = [_build_dedup_buckets(idx, w)
                                for idx, w in self._tables]

        self._emaps_host = []
        if cfg.adj_mode == "ell":
            for (idx, w), a in zip(self._tables, adjs):
                n, k = idx.shape
                rows = np.repeat(np.arange(n, dtype=np.int64), k)
                # pad_multiple=1: every row has exactly k edges -> no
                # width-rounding waste (k=25 stays 25)
                self._emaps_host.append((
                    emap.build_edge_map(rows, idx.ravel().astype(np.int64),
                                        None, n, a.shape[1] + 1,
                                        pad_multiple=1),
                    emap.build_edge_map(rows, w.ravel().astype(np.int64),
                                        None, n, self.num_weight + 1,
                                        pad_multiple=1)))

    def device_data(self):
        out = {}
        for name, (idx, w) in zip(self.REL_ORDER, self._tables):
            out[name] = (jnp.asarray(idx), jnp.asarray(w))
        if self._emaps_host and not self.resample_each_layer:
            out["em"] = {name: (emap.to_device(ej), emap.to_device(ew))
                         for name, (ej, ew) in zip(self.REL_ORDER,
                                                   self._emaps_host)}
        if self._dedup_host:
            out["dedup"] = {
                name: (tuple(tuple(jnp.asarray(a) for a in bk)
                             for bk in buckets), jnp.asarray(inv))
                for name, (buckets, inv) in zip(self.REL_ORDER,
                                                self._dedup_host)}
        if self._csr_host:
            out["csr"] = {name: tuple(jnp.asarray(x) for x in csr)
                          for name, csr in zip(self.REL_ORDER,
                                               self._csr_host)}
        return out

    # ------------------------------------------------------------------ init
    def init(self, key):
        cfg = self.cfg
        k_emb, k_w, *k_layers = jax.random.split(key, cfg.num_layer + 2)
        params = {
            "embed": base.init_embeddings(k_emb, self.num_list, cfg.dim_latent),
            "weight": base.xavier_uniform(k_w, (self.num_weight,
                                                cfg.dim_weight)),
            "layers": [],
        }
        for li, kl in enumerate(k_layers):
            d_in, d_out = self.dims[li], self.dims[li + 1]
            ks = jax.random.split(kl, 16)
            lp = {"atten1": {}}
            for ti, tname in enumerate(("user", "item", "tag")):
                lp["atten1"][tname] = {
                    "W1": base.xavier_uniform(ks[4 * ti + 0],
                                              (d_in + cfg.dim_weight,
                                               cfg.dim_atten)),
                    "W2": base.xavier_uniform(ks[4 * ti + 1], (d_in, cfg.dim_atten)),
                    "b": base.xavier_uniform(ks[4 * ti + 2], (1, cfg.dim_atten)),
                    "v": base.xavier_uniform(ks[4 * ti + 3], (1, cfg.dim_atten)),
                }
            lp["U"] = base.xavier_uniform(ks[12], (d_in, cfg.dim_atten))
            kq, kp = jax.random.split(ks[13])
            lp["q"] = base.xavier_uniform(kq, (1, cfg.dim_atten))
            lp["p"] = base.xavier_uniform(kp, (1, cfg.dim_atten))
            # conv weights initialized with torch Conv2d shapes for matching
            # xavier fan computation, then squeezed for the einsum form
            kb, k1, k2, k3 = jax.random.split(ks[14], 4)
            lp["bit"] = base.xavier_uniform(kb, (cfg.num_bit_conv, 1, 3, 1))[:, 0, :, 0]
            lp["vec"] = [
                base.xavier_uniform(kj, (cfg.num_vec_conv, 1, j, d_in))[:, 0]
                for kj, j in ((k1, 1), (k2, 2), (k3, 3))]
            in_k = cfg.num_bit_conv * d_in + cfg.num_vec_conv * (3 + 2 + 1)
            kf, kbf = jax.random.split(ks[15])
            lp["Wf"] = base.xavier_uniform(kf, (in_k, d_out))
            lp["bf"] = base.xavier_uniform(kbf, (1, d_out))
            params["layers"].append(lp)
        return params

    # ------------------------------------------------------------- attention
    @staticmethod
    def _atten1(ap, ev, ej, ew, v_j, v_w):
        """Neighbor attention (model/tgcn.py:11-37).  ev [N,d]; ej/ew are the
        neighbor-type / weight embedding tables (zero row prepended).

        When the tables arrive in bf16 (``adj_dtype="bf16"``), the [N, k, d]
        gathers, score matmuls, and the backward's scatter-adds all move half
        the bytes — the step is gather/scatter-throughput-bound (DESIGN.md §8)
        so this targets the dominant cost directly.  Softmax logits are
        upcast to f32 (tiny [N, k] tensor), and the aggregate returns f32."""
        dt = ej.dtype
        eNj = jnp.take(ej, v_j, axis=0)                  # [N, k, d]
        eNw = jnp.take(ew, v_w, axis=0)                  # [N, k, dw]
        k = v_j.shape[1]
        ev = ev.astype(dt)
        eNv = jnp.broadcast_to(ev[:, None, :], (ev.shape[0], k, ev.shape[1]))
        cat = jnp.concatenate([eNv, eNw], axis=-1)
        av = (cat @ ap["W1"].astype(dt) + eNj @ ap["W2"].astype(dt)
              + ap["b"].astype(dt))
        x = jax.nn.relu(av) @ ap["v"].T.astype(dt)       # [N, k, 1]
        a = jax.nn.softmax(x.astype(jnp.float32), axis=1)  # over k (pads
        # included, matching the reference which does not mask; zero-degree
        # rows attend to the zero row uniformly and aggregate to 0)
        return jnp.sum(a.astype(dt) * eNj, axis=1).astype(jnp.float32)

    @staticmethod
    def _atten1_dedup(ap, ev, ej, ew, buckets, inv):
        """Attention1 over degree-bucketed DISTINCT (neighbor, weight) pairs.

        Exactly the reference softmax over the k=25 sampled slots
        (model/tgcn.py:11-37): duplicate slots contribute identical scores,
        so grouping them multiplies each exp by its multiplicity.  Gathers
        ~1.9x fewer rows than the plain path at hetrec scale — the step is
        gather-ISSUE-bound, so row count is the cost (DESIGN.md §8)."""
        dt = ej.dtype
        d = ev.shape[1]
        ev = ev.astype(dt)
        w1v, w1w = ap["W1"][:d].astype(dt), ap["W1"][d:].astype(dt)
        w2, b = ap["W2"].astype(dt), ap["b"].astype(dt)
        vT = ap["v"].T.astype(dt)
        outs = []
        for rows, ids, wids, mult in buckets:
            evb = jnp.take(ev, rows, axis=0)             # [Nb, d]
            eNj = jnp.take(ej, ids, axis=0)              # [Nb, W, d]
            eNw = jnp.take(ew, wids, axis=0)             # [Nb, W, dw]
            av = (evb @ w1v)[:, None, :] + eNw @ w1w + eNj @ w2 + b
            x = (jax.nn.relu(av) @ vT)[..., 0]           # [Nb, W]
            x = x.astype(jnp.float32)
            live = mult > 0
            xm = jnp.where(live, x, -jnp.inf)
            mx = jnp.max(xm, axis=-1, keepdims=True)
            e = mult * jnp.exp(xm - mx)                  # pad slots -> 0
            a = e / jnp.sum(e, axis=-1, keepdims=True)
            outs.append(jnp.einsum("nw,nwd->nd", a.astype(dt), eNj))
        return jnp.take(jnp.concatenate(outs, axis=0), inv,
                        axis=0).astype(jnp.float32)

    @staticmethod
    def _atten1_em(ap, ev, ej0, ew0, em_j, em_w):
        """Scatter-free Attention1 over the neighbor-table EdgeMaps.

        Same math as :meth:`_atten1` (model/tgcn.py:11-37) — softmax over all
        k slots including pad edges to node 0 — but every table read is an
        edgemap primitive whose VJP is a transpose-structure gather, so the
        backward contains no scatter-adds into the node/weight tables."""
        eNj = emap.edge_vgather(em_j, ej0)               # ([Nb, K, d], ...)
        eNw = emap.edge_vgather(em_w, ew0)               # ([Nb, K, dw], ...)
        evb = emap.rows_gather(em_j, ev)                 # ([Nb, d], ...)
        d = ev.shape[1]
        w1v, w1w = ap["W1"][:d], ap["W1"][d:]
        outs = []
        for eb, ew_, ej_, deg, idx in zip(evb, eNw, eNj, em_j.f_deg,
                                          em_j.f_idx):
            av = (eb @ w1v)[:, None, :] + ew_ @ w1w + ej_ @ ap["W2"] + ap["b"]
            x = (jax.nn.relu(av) @ ap["v"].T)[..., 0]    # [Nb, K]
            # masked softmax over the table's k slots (node-0 pad edges are
            # REAL slots here, deg == k; only ELL width-rounding is masked)
            m = (jnp.arange(idx.shape[1], dtype=jnp.int32)[None, :]
                 < deg[:, None])
            xm = jnp.where(m, x, jnp.finfo(x.dtype).min)
            a = jax.nn.softmax(xm, axis=-1) * m
            outs.append(jnp.einsum("nk,nkd->nd", a, ej_))
        return jnp.take(jnp.concatenate(outs, axis=-2), em_j.f_inv, axis=-2)

    @staticmethod
    def _atten2(lp, u, i, t):
        uit = jnp.stack([u, i, t], axis=1)               # [N, 3, d]
        x = uit @ lp["U"] + lp["q"]
        x = jax.nn.relu(x) @ lp["p"].T                   # [N, 3, 1]
        b = jax.nn.softmax(x, axis=1)
        return b * uit

    @staticmethod
    def _conv(lp, eN):
        """Bit-level + vector-level convolutions as einsums (model/tgcn.py:66-101)."""
        bit = jnp.einsum("ncd,oc->nod", eN, lp["bit"])
        bit = jax.nn.relu(bit).reshape(eN.shape[0], -1)  # [N, 32*d]
        vecs = []
        for j, w in zip((1, 2, 3), lp["vec"]):           # w: [8, j, d]
            outs = [jnp.einsum("ncd,ocd->no", eN[:, p:p + j, :], w)
                    for p in range(3 - j + 1)]
            y = jax.nn.relu(jnp.stack(outs, axis=2))     # [N, 8, 3-j+1]
            vecs.append(y.reshape(eN.shape[0], -1))
        return jnp.concatenate([bit] + vecs, axis=1)

    def _fusion(self, lp, x):
        return jax.nn.relu(x @ lp["Wf"] + lp["bf"])

    def _resample(self, gdev, key):
        """On-device per-layer neighbor resampling (intended behavior).

        Draws k fresh with-replacement samples per node from the FULL CSR
        neighbor lists (gdev["csr"]) — same distribution as the host-side
        ``neighbor_sample_csr`` table build, so degree > k support is never
        truncated.  Degree-0 rows keep the 0-pad (zero embedding row)."""
        out = {}
        k = self.cfg.neighbor_k
        keys = jax.random.split(key, 6)
        for kk, name in zip(keys, self.REL_ORDER):
            starts, cols, w = gdev["csr"][name]
            deg = starts[1:] - starts[:-1]                       # [N]
            j = jax.random.randint(kk, (deg.shape[0], k), 0,
                                   jnp.maximum(deg, 1)[:, None])
            flat = starts[:-1, None] + j                         # [N, k]
            live = deg[:, None] > 0
            out[name] = (jnp.where(live, jnp.take(cols, flat), 0),
                         jnp.where(live, jnp.take(w, flat), 0))
        return out

    # --------------------------------------------------------------- forward
    def forward(self, params, gdev, *, training: bool = False, key=None):
        cfg = self.cfg
        eu, ei, et = params["embed"]
        ew = params["weight"]
        # adj_dtype="bf16": the six [N, k] table gathers (and their backward
        # scatter-adds) dominate the step (DESIGN.md §8); gathering bf16 rows
        # halves the bytes moved.  Quality gate: PARITY.md bf16 table.
        # (plain-take path only; the EdgeMap tier keeps f32 tables)
        tdt = (jnp.bfloat16 if cfg.adj_dtype == "bf16" and "em" not in gdev
               else jnp.float32)
        ew0 = jnp.concatenate([jnp.zeros((1, cfg.dim_weight)), ew],
                              axis=0).astype(tdt)
        outs_u, outs_i, outs_t = [eu], [ei], [et]
        for li, lp in enumerate(params["layers"]):
            if self.resample_each_layer and key is not None:
                key, sub = jax.random.split(key)
                tabs = self._resample(gdev, sub)
            else:
                tabs = gdev
            zu = jnp.zeros((1, eu.shape[1]))
            eu0 = jnp.concatenate([zu, eu], axis=0).astype(tdt)
            ei0 = jnp.concatenate([zu, ei], axis=0).astype(tdt)
            et0 = jnp.concatenate([zu, et], axis=0).astype(tdt)
            a1 = lp["atten1"]
            if "dedup" in gdev and tabs is gdev:
                dd = gdev["dedup"]
                eu_iN = self._atten1_dedup(a1["item"], eu, ei0, ew0, *dd["u_iw"])
                eu_tN = self._atten1_dedup(a1["tag"], eu, et0, ew0, *dd["u_tw"])
                ei_uN = self._atten1_dedup(a1["user"], ei, eu0, ew0, *dd["i_uw"])
                ei_tN = self._atten1_dedup(a1["tag"], ei, et0, ew0, *dd["i_tw"])
                et_uN = self._atten1_dedup(a1["user"], et, eu0, ew0, *dd["t_uw"])
                et_iN = self._atten1_dedup(a1["item"], et, ei0, ew0, *dd["t_iw"])
            elif "em" in gdev and tabs is gdev:
                em = gdev["em"]
                eu_iN = self._atten1_em(a1["item"], eu, ei0, ew0, *em["u_iw"])
                eu_tN = self._atten1_em(a1["tag"], eu, et0, ew0, *em["u_tw"])
                ei_uN = self._atten1_em(a1["user"], ei, eu0, ew0, *em["i_uw"])
                ei_tN = self._atten1_em(a1["tag"], ei, et0, ew0, *em["i_tw"])
                et_uN = self._atten1_em(a1["user"], et, eu0, ew0, *em["t_uw"])
                et_iN = self._atten1_em(a1["item"], et, ei0, ew0, *em["t_iw"])
            else:
                eu_iN = self._atten1(a1["item"], eu, ei0, ew0, *tabs["u_iw"])
                eu_tN = self._atten1(a1["tag"], eu, et0, ew0, *tabs["u_tw"])
                ei_uN = self._atten1(a1["user"], ei, eu0, ew0, *tabs["i_uw"])
                ei_tN = self._atten1(a1["tag"], ei, et0, ew0, *tabs["i_tw"])
                et_uN = self._atten1(a1["user"], et, eu0, ew0, *tabs["t_uw"])
                et_iN = self._atten1(a1["item"], et, ei0, ew0, *tabs["t_iw"])

            euN = self._atten2(lp, eu, eu_iN, eu_tN)
            eiN = self._atten2(lp, ei_uN, ei, ei_tN)
            etN = self._atten2(lp, et_uN, et_iN, et)

            eu = self._fusion(lp, self._conv(lp, euN))
            ei = self._fusion(lp, self._conv(lp, eiN))
            et = self._fusion(lp, self._conv(lp, etN))
            if training and cfg.message_drop_list[li] > 0.0 and key is not None:
                key, k1, k2, k3 = jax.random.split(key, 4)
                r = cfg.message_drop_list[li]
                eu = message_dropout(eu, r, k1, training)
                ei = message_dropout(ei, r, k2, training)
                et = message_dropout(et, r, k3, training)
            outs_u.append(l2_normalize(eu))
            outs_i.append(l2_normalize(ei))
            outs_t.append(l2_normalize(et))
        return (jnp.concatenate(outs_u, axis=1),
                jnp.concatenate(outs_i, axis=1),
                jnp.concatenate(outs_t, axis=1))

    # ----------------------------------------------------------------- loss
    def bpr_loss(self, params, gdev, batch, *, key=None, training: bool = True):
        embs = self.forward(params, gdev, training=training, key=key)
        u_all, i_all = embs[0], embs[1]
        # reg on final embeddings (ego-reg code commented out, model/tgcn.py:243-246)
        return base.bpr_with_reg(u_all, i_all, u_all, i_all, batch,
                                 self.cfg.mul_loss_func, self.cfg.reg)

    def transtag_loss(self, params, gdev, batch, *, key=None):
        """(u, tag, i+, i-) margin loss on EGO embeddings (model/tgcn.py:251-261)."""
        u, t, ip, ineg = batch[:, 0], batch[:, 1], batch[:, 2], batch[:, 3]
        eu, ei, et = params["embed"]
        ue = jnp.take(eu, u, axis=0)
        te = jnp.take(et, t, axis=0)
        pe = jnp.take(ei, ip, axis=0)
        ne = jnp.take(ei, ineg, axis=0)
        loss = losses.transtag_loss(ue, te, pe, ne, margin=self.cfg.margin)
        reg = losses.l2reg_loss(ue, te, pe, ne)
        return loss, self.cfg.transtag_reg * reg

    def predict(self, params, gdev, users):
        embs = self.forward(params, gdev, training=False)
        return base.predict_sigmoid(jnp.take(embs[0], users, axis=0), embs[1])
