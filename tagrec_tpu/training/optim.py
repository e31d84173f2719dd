"""torch-faithful Adam — per-leaf lazy state, the reference's optimizer.

The reference trains multi-phase models (KGAT BPR+TransE, TGCN BPR+TransTag)
with ONE torch.optim.Adam over all parameters (com.py:68-86).  torch Adam
initializes a parameter's state LAZILY and advances it only on steps where
that parameter has a gradient (`opt.zero_grad()` -> grad None -> skipped):
after 780 BPR steps, the first TransE step still sees t=1 for the relation /
transE tensors.  optax.adam instead keeps ONE global step count and updates
EVERY leaf every step, which (a) mis-scales the bias correction of a phase's
first updates by up to ~2.3x (t=781 instead of t=1: mhat ~ 0.1g vs g, vhat
denominator 0.54 vs 1e-3) and (b) leaks decayed momentum from one phase into
the other's zero-grad steps.  Measured effect (round 5): the KGAT hetrec
eval-0 recall gap vs the reference (VERDICT r4 #1) — the torch sides peak at
the first eval, the global-count side starts lower.

``torch_adam`` reproduces torch semantics at LEAF granularity: a leaf's
(count, m, v) advance only on steps where its gradient is structurally
nonzero — exactly torch's grad-None skip, since a phase that never touches a
tensor yields an exactly-zero gradient for it under jax.grad.  For
single-phase models every leaf participates every step, so this is
bit-for-bit optax.adam (same formula: update = -lr * mhat / (sqrt(vhat) +
eps), eps outside the sqrt, matching torch).

Switch: TrainConfig.adam_impl = "torch" (default, reference-faithful) |
"global" (optax.adam, the pre-r5 behavior).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class TorchAdamState(NamedTuple):
    count: Any  # per-leaf int32 scalar pytree (steps this leaf participated)
    mu: Any
    nu: Any


def torch_adam(lr: float, b1: float = 0.9, b2: float = 0.999,
               eps: float = 1e-8) -> optax.GradientTransformation:
    def init(params):
        return TorchAdamState(
            count=jax.tree_util.tree_map(
                lambda p: jnp.zeros((), jnp.int32), params),
            mu=jax.tree_util.tree_map(jnp.zeros_like, params),
            nu=jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(grads, state, params=None):
        del params
        g_leaves, treedef = jax.tree_util.tree_flatten(grads)
        c_leaves = treedef.flatten_up_to(state.count)
        m_leaves = treedef.flatten_up_to(state.mu)
        n_leaves = treedef.flatten_up_to(state.nu)

        ups, cs, ms, vs = [], [], [], []
        for g, c, m, v in zip(g_leaves, c_leaves, m_leaves, n_leaves):
            has = jnp.any(g != 0)
            c2 = c + has.astype(jnp.int32)
            m2 = jnp.where(has, b1 * m + (1.0 - b1) * g, m)
            v2 = jnp.where(has, b2 * v + (1.0 - b2) * (g * g), v)
            t = c2.astype(g.dtype)
            bc1 = 1.0 - jnp.power(jnp.asarray(b1, g.dtype), t)
            bc2 = 1.0 - jnp.power(jnp.asarray(b2, g.dtype), t)
            # c2 == 0 only when has is False (update is zeroed anyway) —
            # guard the 0/0
            bc1 = jnp.where(bc1 == 0, 1.0, bc1)
            bc2 = jnp.where(bc2 == 0, 1.0, bc2)
            u = -lr * (m2 / bc1) / (jnp.sqrt(v2 / bc2) + eps)
            ups.append(jnp.where(has, u, jnp.zeros_like(g)))
            cs.append(c2)
            ms.append(m2)
            vs.append(v2)

        unflat = jax.tree_util.tree_unflatten
        return unflat(treedef, ups), TorchAdamState(
            count=unflat(treedef, cs), mu=unflat(treedef, ms),
            nu=unflat(treedef, vs))

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg) -> optax.GradientTransformation:
    """TrainConfig.adam_impl dispatch (default torch-faithful)."""
    impl = getattr(cfg, "adam_impl", "torch")
    if impl == "global":
        return optax.adam(cfg.lr)
    if impl == "torch":
        return torch_adam(cfg.lr)
    raise ValueError(f"unknown adam_impl {impl!r}; known: torch, global")
