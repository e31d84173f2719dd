"""Multi-phase training driver with whole-epoch jit'd scans.

Capability-equivalent of Basic_train/epoch_training
(training/basic_train.py:10-85): each epoch runs its training phases in
sequence (1 phase for CF models; BPR + TransE/TransTag for KGAT/TGCN, all
phases stepping ONE shared Adam state — com.py:68-73,80-86), evaluates every
``test_interval`` epochs, early-stops on patience.

TPU-first differences from the reference:
* An epoch is ONE jit'd ``lax.scan`` over steps — sampling (shuffle, negative
  draws) happens on device inside the scan; there is no host<->device traffic
  inside an epoch.
* Batches have static shapes: steps = E // batch and the remainder is dropped
  (the reference instead merges the short tail into the previous batch,
  train_data/abstract.py:17-23 — a documented deviation of < one batch of
  coverage per epoch, with fresh shuffling each epoch).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from tagrec_tpu.config import TrainConfig
from tagrec_tpu.ops import sampling


@dataclass
class PhaseSpec:
    """One training phase: how to produce batches and score them.

    epoch_reset(key)              -> epoch_data pytree (device), e.g. a shuffled
                                     edge table; traced under jit.
    make_batch(key, i, epoch_data)-> batch pytree for step i; traced.
    loss_fn(params, gdev, batch, key) -> tuple of scalar loss terms (summed
                                     for the gradient; parts logged separately,
                                     like training/basic_train.py:15-17).
                                     gdev MUST flow as an argument — closing
                                     over device graph arrays turns them into
                                     jit constants, which XLA lays out ~100x
                                     slower than parameters (measured).
    """

    name: str
    steps_per_epoch: int
    epoch_reset: Callable   # (key, data) -> epoch_data
    make_batch: Callable    # (key, i, epoch_data, data) -> batch
    loss_fn: Callable       # (params, gdev, batch, key) -> loss parts
    data: object = None     # device pytree (edge tables, positive tables);
                            # threaded as a jit ARGUMENT, never a closure


def bpr_phase(name: str, edges: np.ndarray, pos_table: sampling.PosTable,
              batch: int, loss_fn, neg_rounds: int = 16) -> PhaseSpec:
    """Standard BPR phase over all train interactions
    (BPR_training_data semantics, train_data/bpr_training_data.py:12-45):
    per epoch shuffle every (u, i+) pair, pair each with one uniform negative
    outside the user's positive set."""
    batch = min(batch, len(edges))  # tiny datasets: one full batch
    steps = max(len(edges) // batch, 1)
    data = {"edges": jnp.asarray(edges, dtype=jnp.int32), "pt": pos_table}

    def epoch_reset(key, data):
        perm = jax.random.permutation(key, data["edges"].shape[0])
        return jnp.take(data["edges"], perm, axis=0)

    def make_batch(key, i, shuffled, data):
        sl = jax.lax.dynamic_slice(shuffled, (i * batch, 0), (batch, 2))
        users, pos = sl[:, 0], sl[:, 1]
        neg = sampling.sample_negatives(key, data["pt"], users,
                                        rounds=neg_rounds)
        return jnp.stack([users, pos, neg], axis=1)

    return PhaseSpec(name=name, steps_per_epoch=steps, epoch_reset=epoch_reset,
                     make_batch=make_batch, loss_fn=loss_fn, data=data)


def resampling_phase(name: str, user_ids: np.ndarray, pos_table: sampling.PosTable,
                     batch: int, steps: int, loss_fn,
                     cor_sizes: Optional[Dict[str, int]] = None,
                     neg_rounds: int = 16) -> PhaseSpec:
    """DGCF-family phase (DGCF_training_data, train_data/bpr_training_data.py:47-84):
    every step samples ``batch`` users, one positive and one negative each,
    plus ``cor_batch`` correlation-sample ids per node type for the
    distance-correlation regularizer.

    User draws match the reference exactly in distribution
    (train_data/utils.py:58-64): WITHOUT replacement within a batch when
    len(all_user) > batch (random.sample; strict inequality — at equality
    the reference falls through to np.random.choice WITH replacement, a
    quirk kept on purpose), with replacement otherwise."""
    cor_sizes = cor_sizes or {}
    n_users = len(user_ids)
    without_replacement = n_users > batch
    data = {"users": jnp.asarray(user_ids, dtype=jnp.int32), "pt": pos_table}

    def epoch_reset(key, data):
        return jnp.zeros((), dtype=jnp.int32)  # stateless

    def make_batch(key, i, _, data):
        k_u, k_p, k_n, k_c = jax.random.split(key, 4)
        if without_replacement:
            sel = jax.random.permutation(k_u, n_users)[:batch]
        else:
            sel = jax.random.randint(k_u, (batch,), 0, n_users)
        users = jnp.take(data["users"], sel)
        pos = sampling.sample_positive(k_p, data["pt"], users)
        neg = sampling.sample_negatives(k_n, data["pt"], users,
                                        rounds=neg_rounds)
        out = {"bpr": jnp.stack([users, pos, neg], axis=1)}
        if cor_sizes:
            cor_keys = jax.random.split(k_c, len(cor_sizes))
            out["cor"] = {
                name_: jax.random.randint(kk, (nb,), 0, hi)
                for kk, (name_, (nb, hi)) in zip(cor_keys, cor_sizes.items())
            }
        return out

    return PhaseSpec(name=name, steps_per_epoch=steps, epoch_reset=epoch_reset,
                     make_batch=make_batch, loss_fn=loss_fn, data=data)


def triple_phase(name: str, triples: np.ndarray, n_rel_or_keys, n_ids: int,
                 batch: int, loss_fn, neg_rounds: int = 16,
                 window: bool = False) -> PhaseSpec:
    """TransE/TransTag phase: per epoch shuffle all (h, r, t) triples; per
    batch sample a corrupted tail outside the observed (h, r, *) set
    (train_data/transe_training_data.py:12-71).

    ``n_rel_or_keys`` is either ``n_rel`` (int — the membership set is built
    here) or a prebuilt ``(sampling.TripleSet, keys)`` pair.

    ``window=True`` reproduces the reference KGAT sampler's
    overlapping-prefix-window quirk exactly (SURVEY quirk #5,
    train_data/transe_training_data.py:31-37): ``reset()`` is a no-op —
    triples stay in creation order (relation 0..5 concatenated) every epoch —
    and step i trains on the window ``triples[i : i+batch]``, i stepping by
    ONE, for ``len(triples) // batch`` steps.  Net effect: each epoch sees
    only the first ``N//B + B - 1`` triples (overwhelmingly relation-0 ui
    edges), re-drawn negatives being the only per-epoch variation.  Default
    ``window=False`` is the deliberate fix: a full shuffled pass per epoch.
    """
    if isinstance(n_rel_or_keys, int):
        # sorted-code membership set: O(T) memory — the padded-row table
        # OOM'd at 10x scale on zipf hub heads (sampling.TripleSet)
        ts, keys = sampling.build_triple_set(triples, n_rel_or_keys, n_ids)
    else:
        # prebuilt payload must be a (TripleSet, keys) pair — the pre-r4
        # (PosTable, keys) form would only fail deep inside the jitted epoch
        ts, keys = n_rel_or_keys
        assert isinstance(ts, sampling.TripleSet), (
            "triple_phase expects (TripleSet, keys) as the prebuilt payload; "
            f"got {type(ts).__name__}")
    batch = min(batch, len(triples))  # tiny datasets: one full batch
    steps = max(len(triples) // batch, 1)
    data = {"trips": jnp.asarray(triples, dtype=jnp.int32),
            "keys": jnp.asarray(keys, dtype=jnp.int32), "ts": ts}

    def epoch_reset(key, data):
        if window:  # quirk #5: no shuffle, ever
            return (data["trips"], data["keys"])
        perm = jax.random.permutation(key, data["trips"].shape[0])
        return (jnp.take(data["trips"], perm, axis=0),
                jnp.take(data["keys"], perm))

    def make_batch(key, i, state, data):
        trips, tkeys = state
        start = i if window else i * batch
        sl = jax.lax.dynamic_slice(trips, (start, 0), (batch, 3))
        ks = jax.lax.dynamic_slice(tkeys, (start,), (batch,))
        neg = sampling.sample_negatives_from_set(key, data["ts"], ks,
                                                 rounds=neg_rounds)
        # (h, r, t+, t-)
        return jnp.concatenate([sl, neg[:, None]], axis=1)

    return PhaseSpec(name=name, steps_per_epoch=steps, epoch_reset=epoch_reset,
                     make_batch=make_batch, loss_fn=loss_fn, data=data)


class Trainer:
    """Runs phases over one shared optimizer state; see module docstring.

    ``mesh``: optional (data, model) jax.sharding.Mesh (parallel.mesh) — when
    given, the whole-epoch jit runs SPMD: embedding-table rows and graph
    tables are sharded over ``model`` (the true-parallel successor of the
    reference's sequential --split_adj_k row folds, model/help/adj.py:114-167),
    batches over ``data``; XLA inserts the all-gathers/psums."""

    def __init__(self, phases: List[PhaseSpec], cfg: TrainConfig,
                 optimizer: Optional[optax.GradientTransformation] = None,
                 mesh=None):
        from tagrec_tpu.training import optim

        self.phases = phases
        self.cfg = cfg
        self.opt = optimizer or optim.make_optimizer(cfg)
        self.mesh = mesh
        self._epoch_fns = {}

    def init_opt_state(self, params):
        return self.opt.init(params)

    def _epoch_fn(self, phase: PhaseSpec):
        if phase.name in self._epoch_fns:
            return self._epoch_fns[phase.name]
        opt = self.opt
        steps = phase.steps_per_epoch
        mesh = self.mesh

        @jax.jit
        def run_epoch(params, opt_state, key, gdev, data):
            key, k_reset = jax.random.split(key)
            epoch_data = phase.epoch_reset(k_reset, data)

            def step(carry, i):
                params, opt_state, key = carry
                key, k_batch, k_loss = jax.random.split(key, 3)
                batch = phase.make_batch(k_batch, i, epoch_data, data)
                if mesh is not None:
                    from tagrec_tpu.parallel import sharding as shd
                    batch = shd.constrain_batch(batch, mesh)

                def total_loss(p):
                    parts = phase.loss_fn(p, gdev, batch, k_loss)
                    return sum(parts), jnp.stack(parts)

                (_, parts), grads = jax.value_and_grad(
                    total_loss, has_aux=True)(params)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                if mesh is not None:
                    from tagrec_tpu.parallel import sharding as shd
                    params = shd.constrain_params(params, mesh)
                    opt_state = shd.constrain_params(opt_state, mesh)
                return (params, opt_state, key), parts

            (params, opt_state, key), parts = jax.lax.scan(
                step, (params, opt_state, key), jnp.arange(steps))
            return params, opt_state, key, parts

        self._epoch_fns[phase.name] = run_epoch
        return run_epoch

    def run(self, params, key, evaluator, model, gdev, early_stop,
            log=print, metrics=None, state_path: Optional[str] = None) -> Dict:
        """Full training loop with periodic eval + early stopping
        (Basic_train.run semantics, training/basic_train.py:60-85).
        ``metrics``: optional tagrec_tpu.utils.MetricsWriter.
        ``state_path``: optional resume file — full (params, opt_state, epoch)
        is saved at every eval and restored on start if present (capability
        the reference lacks, SURVEY.md §5)."""
        import os

        from tagrec_tpu.training import checkpoint as ckpt

        cfg = self.cfg
        opt_state = self.init_opt_state(params)
        start_ep = 0
        if self.mesh is None:
            if state_path and os.path.exists(state_path):
                params, opt_state, start_ep = ckpt.restore_train_state(
                    state_path, params, opt_state)
                log(f"resumed from {state_path} at epoch {start_ep}")
        else:
            # SPMD placement: row-shard tables over `model`, replicate the
            # rest; opt_state mirrors the params layout (Adam moments are
            # per-parameter).  Graph tables shard by row where divisible.
            from tagrec_tpu.parallel import sharding as shd
            p_shard = shd.params_sharding(params, self.mesh)
            o_shard = shd.params_sharding(opt_state, self.mesh)
            params = shd.place(params, p_shard)
            opt_state = shd.place(opt_state, o_shard)
            gdev = shd.place(gdev, shd.gdev_sharding(gdev, self.mesh))
            # under a mesh, state_path is a DIRECTORY of per-shard
            # checkpoints (rotated); each process restores only the shards
            # it addresses
            self._mesh_state = {"params": p_shard, "opt_state": o_shard}
            last = ckpt.latest_step_dir(state_path) if state_path else None
            if last:
                state = ckpt.load_sharded(
                    last, {"params": params, "opt_state": opt_state,
                           "step": np.asarray(0)},
                    {"params": p_shard, "opt_state": o_shard, "step": None})
                params, opt_state = state["params"], state["opt_state"]
                start_ep = int(np.asarray(state["step"]))
                log(f"resumed sharded state from {last} at epoch {start_ep}")
        for ep in range(start_ep, cfg.epochs):
            for pi, phase in enumerate(self.phases):
                t0 = time.time()
                fn = self._epoch_fn(phase)
                params, opt_state, key, parts = fn(params, opt_state, key,
                                                   gdev, phase.data)
                parts = np.asarray(parts)
                if not np.isfinite(parts).all():
                    # failure detection (SURVEY §5): a diverged epoch has
                    # already corrupted params — stop instead of training on
                    # NaNs; the last eval-time checkpoint (state_path) is the
                    # recovery point
                    msg = (f"non-finite loss in epoch {ep} phase "
                           f"{phase.name}; last saved state: "
                           f"{state_path or '(none)'}")
                    log(f"FATAL: {msg}")
                    raise FloatingPointError(msg)
                dt = time.time() - t0
                log(f"[Epoch:{ep}][{phase.name}][{dt:.2f}s] "
                    f"avg_loss: {parts.sum(axis=1).mean():.5f} "
                    f"parts_sum: {list(parts.sum(axis=0))}")
                if metrics is not None:
                    metrics.scalars(ep, {
                        f"train/loss_{pi}": float(parts.sum(axis=1).mean()),
                        f"train/epoch_time_{pi}": dt})

            if ep % cfg.test_interval == 0:
                t0 = time.time()
                results = evaluator.run(model, params, gdev)
                log(f"[Epoch {ep}][eval {time.time()-t0:.2f}s] {results}")
                if metrics is not None:
                    metrics.results(ep, results, cfg.topks)
                if state_path and self.mesh is None:
                    ckpt.save_train_state(state_path, params, opt_state,
                                          step=ep + 1)
                elif state_path:
                    ckpt.save_sharded(
                        state_path, {"params": params, "opt_state": opt_state,
                                     "step": np.asarray(ep + 1)},
                        step=ep + 1, rotate=3)
                if early_stop(params, results, ep):
                    log(f"early stop trigger at epoch {ep}")
                    break

        log(f"best result [{early_stop.best_epoch}:{early_stop.best_result}]")
        return {"params": params, "opt_state": opt_state,
                "best_epoch": early_stop.best_epoch,
                "best_result": early_stop.best_result}
