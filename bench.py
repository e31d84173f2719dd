"""Benchmark: BPR training throughput (examples/sec/chip) on the flagship model.

Runs the jit'd LightGCN BPR train step (full 3-layer propagation over the joint
user-item-tag adjacency + loss + Adam update — the reference hot loop,
training/basic_train.py:10-30 + model/lightgcn.py:49-82) on a hetrec-scale
synthetic graph, on whatever backend JAX selects (the real TPU chip under the
driver).

Baseline: an independent torch (CPU) implementation of the same reference
semantics — torch.sparse COO adjacency, 3 SpMM layers with per-layer
normalize, layer-mean, BPR softplus, Adam — i.e. what the reference codebase
does on this machine, measured in-process.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "examples/s", "vs_baseline": N}
"""

import json
import sys
import time

import numpy as np


def build_graph():
    from tagrec_tpu.data.synthetic import synthetic_graph_large

    # hetrec movielens-2k scale: ~2k users, ~10k items, ~400k interactions
    return synthetic_graph_large(n_user=2000, n_item=10000, n_tag=3000,
                                 n_edges=400_000, tag_per_inter=0.3, seed=0)


def bench_tpu(graph, batch=512, steps=100):
    import jax
    import jax.numpy as jnp
    import optax

    from tagrec_tpu.config import TrainConfig, model_preset
    from tagrec_tpu.models.lightgcn import LightGCN
    from tagrec_tpu.ops import sampling
    from tagrec_tpu.training.train import Trainer, bpr_phase

    cfg = model_preset("lightgcn", reg=1e-4)
    tcfg = TrainConfig(train_batch=batch)
    model = LightGCN(graph, cfg)
    params = model.init(jax.random.PRNGKey(0))
    gdev = model.device_data()
    pt = sampling.build_pos_table(graph.user_items["train"], graph.n_user,
                                  graph.n_item)
    edges = graph.edge_index["train"]

    def loss_fn(p, g, b, key):
        return model.bpr_loss(p, g, b, key=key)

    phase = bpr_phase("bpr", edges, pt, batch, loss_fn)
    # Cap the scanned epoch at `steps` steps for timing.
    phase.steps_per_epoch = min(phase.steps_per_epoch, steps)
    trainer = Trainer([phase], tcfg)
    opt_state = trainer.init_opt_state(params)
    fn = trainer._epoch_fn(phase)

    key = jax.random.PRNGKey(1)
    # warmup + compile; the host transfer (float(...)) is the ONLY reliable
    # synchronization on the tunneled backend — block_until_ready can return
    # before execution there (see DESIGN.md §6)
    p, o, key, parts = fn(params, opt_state, key, gdev, phase.data)
    checksum = float(jnp.sum(parts))
    assert np.isfinite(checksum)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        p, o, key, parts = fn(p, o, key, gdev, phase.data)
        checksum += float(jnp.sum(parts))
    dt = (time.perf_counter() - t0) / reps
    assert np.isfinite(checksum)
    n_steps = phase.steps_per_epoch
    # roofline accounting: the step is HBM-bound on the adjacency stream
    # (DESIGN.md §7).  Per step, each of the L layers reads the forward
    # sector blocks once and the transpose pair once in the backward — and
    # the bytes actually streamed are BF16, not f32: TPU default matmul
    # precision converts f32 operands to bf16, and XLA hoists that
    # conversion OUT of the whole-epoch while-loop (verified in the
    # compiled HLO, r4: the loop-body dots take bf16[2000,10000]-etc
    # parameters), so the steady-state stream is 2 bytes/element.  This is
    # also why opting into adj_dtype="bf16" storage only buys ~5%: the hot
    # loop already streams bf16 either way.  Embedding activations
    # ([N, 64] f32 per layer, ~4 MB) are <1% and ignored.
    # gdev already holds BOTH the forward sectors and the transpose pair,
    # so "all leaves once per layer" covers fwd + bwd streams.
    # Pricing (ADVICE r4): the bf16 constant is HLO-verified only for FLOAT
    # matmul operands (the dense sector tier lightgcn uses here); integer
    # index tables (ELL/hybrid tiers) stream at their full itemsize and are
    # never bf16-converted.
    def leaf_bytes(a):
        if not hasattr(a, "dtype"):
            return 0
        if jnp.issubdtype(a.dtype, jnp.floating):
            return a.size * 2  # bf16 stream in the hot loop (HLO-verified)
        return a.size * a.dtype.itemsize
    sweep_bytes = sum(leaf_bytes(a)
                      for a in jax.tree_util.tree_leaves(gdev)) * cfg.num_layer
    return batch * n_steps / dt, dt / n_steps, sweep_bytes


def bench_attention_model(graph, name="dgcf", batch=512, steps=30, kg=None,
                          **preset_overrides):
    """Step time of a non-flagship model so kernel regressions are
    driver-visible (VERDICT r1 #10, r2 #7: dgcf + tgcn + true-KG kgat).
    Whole-epoch scan capped at ``steps``; chained measurement with a host
    transfer (DESIGN.md §6)."""
    import jax
    import jax.numpy as jnp

    from tagrec_tpu.compose import build_pipeline
    from tagrec_tpu.config import TrainConfig, model_preset
    from tagrec_tpu.training.train import Trainer

    mcfg = model_preset(name, reg=1e-4, **preset_overrides)
    tcfg = TrainConfig(train_batch=batch)
    pipe = build_pipeline(graph, mcfg, tcfg, kg=kg)
    params = pipe.model.init(jax.random.PRNGKey(0))
    phase = pipe.phases[0]
    phase.steps_per_epoch = min(phase.steps_per_epoch, steps)
    trainer = Trainer([phase], tcfg)
    opt_state = trainer.init_opt_state(params)
    fn = trainer._epoch_fn(phase)

    key = jax.random.PRNGKey(1)
    p, o, key, parts = fn(params, opt_state, key, pipe.gdev, phase.data)
    checksum = float(jnp.sum(parts))
    assert np.isfinite(checksum)
    t0 = time.perf_counter()
    p, o, key, parts = fn(p, o, key, pipe.gdev, phase.data)
    checksum = float(jnp.sum(parts))
    dt = time.perf_counter() - t0
    assert np.isfinite(checksum)
    return dt / phase.steps_per_epoch


# torch-CPU baseline measured on this machine with both cores idle
# (BENCH_r01, load < 0.2).  When the live measurement runs on a contended
# machine (the builder's background parity jobs), vs_baseline is computed
# against max(measured, this anchor) so contention can only UNDERSTATE the
# speedup, never inflate it (VERDICT r2 weak #1).
IDLE_BASELINE_ANCHOR = 1687.7

# absolute flagship step-time history (ms) — the stable headline trend
STEP_MS_HISTORY = {"r1": 4.12, "r2": 2.17, "r3": 2.12, "r4": 2.09}

# v5e HBM bandwidth (public spec, ~819 GB/s) for the roofline fraction
HBM_ROOFLINE_GBPS = 819.0


def bench_torch_baseline(graph, batch=512, steps=5, blocks=5):
    """Reference-semantics LightGCN step in torch on CPU (independent impl).

    Returns the MEDIAN examples/s over ``blocks`` timed blocks (a single
    block is at the mercy of scheduler noise on a shared machine)."""
    import torch

    torch.manual_seed(0)
    coo = graph.joint_norm_adj("bi_norm", True)
    n = coo.shape[0]
    idx = torch.tensor(np.stack([coo.row, coo.col]), dtype=torch.long)
    val = torch.tensor(coo.val)
    adj = torch.sparse_coo_tensor(idx, val, (n, n)).coalesce()

    nu, ni, nt = graph.n_user, graph.n_item, graph.n_tag
    embed = [torch.nn.Parameter(torch.empty(m, 64)) for m in (nu, ni, nt)]
    for e in embed:
        torch.nn.init.xavier_uniform_(e)
    opt = torch.optim.Adam(embed, lr=0.01)

    edges = graph.edge_index["train"]
    rng = np.random.default_rng(0)

    def step():
        sel = rng.integers(0, len(edges), batch)
        u = torch.tensor(edges[sel, 0], dtype=torch.long)
        i = torch.tensor(edges[sel, 1], dtype=torch.long)
        j = torch.tensor(rng.integers(0, ni, batch), dtype=torch.long)
        x = torch.cat(embed, dim=0)
        outs = [x]
        for _ in range(3):
            x = torch.sparse.mm(adj, x)
            outs.append(torch.nn.functional.normalize(x, p=2, dim=1))
        final = torch.stack(outs, dim=1).mean(dim=1)
        uu, ii = final[:nu], final[nu:nu + ni]
        ue, pe, ne = uu[u], ii[i], ii[j]
        pos = (ue * pe).sum(1)
        neg = (ue * ne).sum(1)
        loss = torch.nn.functional.softplus(neg - pos).mean()
        reg = 0.5 * (embed[0][u].norm(2) ** 2 + embed[1][i].norm(2) ** 2
                     + embed[1][j].norm(2) ** 2) / batch
        loss = loss + 1e-4 * reg
        opt.zero_grad()
        loss.backward()
        opt.step()

    step()  # warmup
    rates = []
    for _ in range(blocks):
        t0 = time.perf_counter()
        for _ in range(steps):
            step()
        rates.append(batch * steps / (time.perf_counter() - t0))
    return float(np.median(rates))


# the ONE JSON line must land inside the driver's ~590s window; finalize
# with whatever details completed by this internal deadline
WINDOW_S = 500


def main():
    import os
    import signal

    t_start = time.perf_counter()
    graph = build_graph()
    ours, step_time, sweep_bytes = bench_tpu(graph)
    # achieved adjacency bandwidth vs the v5e HBM roofline (~819 GB/s) —
    # VERDICT r3 weak #5: make the roofline distance visible every round
    adj_gbps = sweep_bytes / step_time / 1e9
    details = {"step_ms": round(step_time * 1e3, 3),
               "step_ms_history": dict(STEP_MS_HISTORY),
               "adj_gbps": round(adj_gbps, 1),
               "roofline_frac": round(adj_gbps / HBM_ROOFLINE_GBPS, 3)}
    details["baseline_idle_anchor"] = IDLE_BASELINE_ANCHOR
    base = 0.0  # re-measured at the END if time remains; max()'d with anchor

    def finalize():
        # contention can only understate (see IDLE_BASELINE_ANCHOR)
        base_eff = max(base, IDLE_BASELINE_ANCHOR)
        print(json.dumps({
            "metric": "lightgcn_bpr_examples_per_sec_per_chip",
            "value": round(ours, 1),
            "unit": "examples/s",
            "vs_baseline": round(ours / base_eff, 3),
            "details": details,
        }), flush=True)

    # per-model step-time details are best-effort.  r4 lesson (VERDICT r4
    # weak #2): absolute-elapsed gates evaporate when the headline portion
    # runs long (cold remote compile) — gate each detail on the REMAINING
    # window vs its own estimated cost instead, highest-priority first
    # (serving has never landed in a BENCH artifact), and all bounded by an
    # alarm that finalizes early rather than losing the JSON line.
    class _Deadline(Exception):
        pass

    def _on_alarm(*_):
        raise _Deadline()

    def detail(key, est_s, fn):
        remaining = WINDOW_S - (time.perf_counter() - t_start)
        if remaining < est_s:
            details[key] = f"skipped: {remaining:.0f}s left < est {est_s}s"
            return
        try:
            details[key] = round(fn() * 1e3, 3)
        except _Deadline:
            details[key] = "skipped: window deadline"
            raise
        except Exception as e:  # never lose the headline metric
            details[key] = f"error: {e}"

    def kg_kgat():
        from tagrec_tpu.data.kg import KnowledgeGraph

        kg = KnowledgeGraph.synthetic(graph, n_entity=15_000,
                                      n_triples=500_000, n_rela=6, seed=0)
        # bi_inter = real propagation over the 1.6M-edge KG (the default
        # bi_agg preset reproduces quirk #3 and skips propagation entirely,
        # which would time the degenerate-MF step instead)
        return bench_attention_model(graph, "kgat", steps=8, kg=kg,
                                     agg_type="bi_inter")

    def serving_latency():
        """ms per 256-user top-20 query over the frozen lightgcn export
        (tagrec_tpu/serving.py) — the online retrieval hot path.

        Chained measurement (VERDICT r3 weak #4): Q queries run inside ONE
        jit'd lax.scan where each query's user batch is derived from the
        previous query's results (a true data dependency, so nothing
        pipelines), same compute as Retriever._single_fn.  Per-call dispatch
        through the tunnel has a ~30 ms floor that the old sequential-call
        measurement mostly timed; the dispatch-inclusive number is still
        reported separately as serving_dispatch_ms.
        """
        import jax
        import jax.numpy as jnp

        from tagrec_tpu import serving as sv
        from tagrec_tpu.config import model_preset
        from tagrec_tpu.models.lightgcn import LightGCN

        model = LightGCN(graph, model_preset("lightgcn", reg=1e-4))
        params = model.init(jax.random.PRNGKey(0))
        u_t, i_t = sv.export_tables(model, params, model.device_data(),
                                    n_item=graph.n_item)
        pad, _ = sv._pad_positives(graph.user_items["train"], graph.n_user)
        r = sv.Retriever(u_t, i_t, train_pad=pad, block=256)
        rng = np.random.default_rng(0)
        r.topk(rng.integers(0, graph.n_user, 256), 20)  # compile
        reps = 10
        t0 = time.perf_counter()
        for _ in range(reps):  # per-call path incl. host<->device + dispatch
            r.topk(rng.integers(0, graph.n_user, 256), 20)
        details["serving_dispatch_ms"] = round(
            (time.perf_counter() - t0) / reps * 1e3, 3)

        U, I, TP = r._U, r._I, r._train_pad
        n_user, k, q_chain = u_t.shape[0], 20, 64

        @jax.jit
        def chain(users0):
            def body(users, i):
                u = jnp.take(U, users, axis=0)
                scores = jax.nn.sigmoid(u @ I.T)
                tp = jnp.take(TP, users, axis=0)
                rows = jnp.broadcast_to(jnp.arange(users.shape[0])[:, None],
                                        tp.shape)
                scores = scores.at[rows, tp].set(sv.MASK_SCORE, mode="drop")
                v, ids = jax.lax.top_k(scores, k)
                nxt = (ids[:, 0].astype(jnp.int32) + i + 1) % n_user
                return nxt, jnp.sum(v)
            last, sums = jax.lax.scan(body, users0,
                                      jnp.arange(q_chain, dtype=jnp.int32))
            return jnp.sum(sums) + jnp.sum(last)

        users0 = jnp.asarray(rng.integers(0, n_user, 256), dtype=jnp.int32)
        assert np.isfinite(float(chain(users0)))  # compile + warm
        t0 = time.perf_counter()
        s = float(chain(users0))
        dt = time.perf_counter() - t0
        assert np.isfinite(s)
        return dt / q_chain

    signal.signal(signal.SIGALRM, _on_alarm)
    signal.alarm(max(int(WINDOW_S - (time.perf_counter() - t_start)), 1))
    try:
        # est_s = warm-cache compile (~15-25s, CLAUDE.md r4 measurement)
        # + 2 chained epochs + slack; kgat_kg adds the 1.6M-triple KG build
        detail("serving_topk256_ms", 45, serving_latency)
        detail("dgcf_step_ms", 50, lambda: bench_attention_model(
            graph, "dgcf"))
        detail("tgcn_step_ms", 50, lambda: bench_attention_model(
            graph, "tgcn"))
        detail("kgat_kg_step_ms", 90, kg_kgat)
        # torch baseline LAST (VERDICT r4 #4): it is max()'d with the idle
        # anchor anyway, so skipping it under time pressure only means the
        # anchor stands in — the details above must land first.
        remaining = WINDOW_S - (time.perf_counter() - t_start)
        if remaining >= 40:
            base = bench_torch_baseline(graph)
            details["torch_cpu_baseline_examples_per_s"] = round(base, 1)
            details["baseline_loadavg1"] = round(os.getloadavg()[0], 2)
        else:
            details["torch_cpu_baseline_examples_per_s"] = (
                f"skipped ({remaining:.0f}s left): idle anchor used")
    except _Deadline:
        pass
    finally:
        signal.alarm(0)
    finalize()


if __name__ == "__main__":
    sys.exit(main())
