"""Loss kernels (reference model/help/loss.py:4-81, model/kgat.py:155-163).

All functions are pure jnp and differentiable; they match the reference's
measured semantics exactly (including the KGAT squared-norm TransE variant and
the ego-vs-final regularization choices made by each model's caller).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bpr_loss(users_emb: jnp.ndarray, pos_emb: jnp.ndarray, neg_emb: jnp.ndarray,
             kind: str = "softplus") -> jnp.ndarray:
    """Pairwise BPR loss (model/help/loss.py:4-12).

    kind='logsigmoid' -> -mean(logsigmoid(pos - neg))   (NGCF, TGCN)
    otherwise         ->  mean(softplus(neg - pos))      (LightGCN et al.)
    The two are algebraically equal; both kept for config parity.
    """
    pos = jnp.sum(users_emb * pos_emb, axis=1)
    neg = jnp.sum(users_emb * neg_emb, axis=1)
    if kind == "logsigmoid":
        return -jnp.mean(jax.nn.log_sigmoid(pos - neg))
    return jnp.mean(jax.nn.softplus(neg - pos))


def l2reg_loss(*embs: jnp.ndarray) -> jnp.ndarray:
    """0.5 * sum_i ||E_i||_F^2 / batch (model/help/loss.py:27-32)."""
    total = sum(jnp.sum(jnp.square(e)) for e in embs)
    return 0.5 * total / embs[0].shape[0]


def transtag_loss(head_e, rela_e, pos_tail_e, neg_tail_e,
                  margin: float = 0.0) -> jnp.ndarray:
    """Margin hinge on translation distances (model/help/loss.py:35-41)."""
    pos = jnp.linalg.norm(head_e + rela_e - pos_tail_e, axis=1)
    neg = jnp.linalg.norm(head_e + rela_e - neg_tail_e, axis=1)
    return jnp.mean(jax.nn.relu(margin + pos - neg))


def transe_loss(head_e, rela_e, pos_tail_e, neg_tail_e) -> jnp.ndarray:
    """Softplus TransE on L2 distances (model/help/loss.py:44-50)."""
    pos = jnp.linalg.norm(head_e + rela_e - pos_tail_e, axis=1)
    neg = jnp.linalg.norm(head_e + rela_e - neg_tail_e, axis=1)
    return jnp.mean(jax.nn.softplus(pos - neg))


def transe_loss_sq(head_e, rela_e, pos_tail_e, neg_tail_e) -> jnp.ndarray:
    """KGAT's inlined squared-norm TransE variant (model/kgat.py:157-160)."""
    pos = jnp.sum(jnp.square(head_e + rela_e - pos_tail_e), axis=1)
    neg = jnp.sum(jnp.square(head_e + rela_e - neg_tail_e), axis=1)
    return jnp.mean(jax.nn.softplus(pos - neg))


def cor_loss(factor_embs, factor_k: int) -> jnp.ndarray:
    """Distance-correlation decorrelation across factor chunks
    (model/help/loss.py:53-81; call sites commented out in the reference but
    kept as first-class capability here — enable with cor_reg > 0)."""

    def centered_distance(x):
        r = jnp.sum(jnp.square(x), axis=1, keepdims=True)
        d = jnp.sqrt(jnp.maximum(r - 2 * x @ x.T + r.T, 0.0) + 1e-8)
        return (d - jnp.mean(d, axis=0, keepdims=True)
                - jnp.mean(d, axis=1, keepdims=True) + jnp.mean(d))

    def distance_covariance(d1, d2):
        n = d1.shape[0]
        return jnp.sqrt(jnp.maximum(jnp.sum(d1 * d2) / (n * n), 0.0) + 1e-8)

    def distance_correlation(x, y):
        d1, d2 = centered_distance(x), centered_distance(y)
        dxy = distance_covariance(d1, d2)
        dxx = distance_covariance(d1, d1)
        dyy = distance_covariance(d2, d2)
        return dxy / (jnp.sqrt(jnp.maximum(dxx * dyy, 0.0)) + 1e-10)

    loss = 0.0
    for i in range(factor_k - 1):
        loss = loss + distance_correlation(factor_embs[i], factor_embs[i + 1])
    return loss / ((factor_k + 1.0) * factor_k / 2.0)
