"""Shared model utilities: initializers, embedding splits, prediction."""

from __future__ import annotations

import math
from typing import List, Sequence

import jax
import jax.numpy as jnp

from tagrec_tpu.ops.losses import bpr_loss, l2reg_loss


def _fan_in_out(shape: Sequence[int]):
    """torch.nn.init._calculate_fan_in_and_fan_out semantics: for an
    N-d tensor, receptive = prod(shape[2:]), fan_in = shape[1]*receptive,
    fan_out = shape[0]*receptive."""
    receptive = 1
    for s in shape[2:]:
        receptive *= s
    fan_in = shape[1] * receptive if len(shape) > 1 else shape[0]
    fan_out = shape[0] * receptive
    return fan_in, fan_out


def xavier_uniform(key, shape, dtype=jnp.float32) -> jnp.ndarray:
    """Xavier/Glorot uniform matching torch.nn.init.xavier_uniform_
    (used by every reference model, e.g. model/lightgcn.py:44-47)."""
    fan_in, fan_out = _fan_in_out(shape)
    a = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)


def init_embeddings(key, num_list: Sequence[int], dim: int) -> List[jnp.ndarray]:
    keys = jax.random.split(key, len(num_list))
    return [xavier_uniform(k, (n, dim)) for k, n in zip(keys, num_list)]


def split_nodes(x: jnp.ndarray, num_list: Sequence[int]):
    """Split a stacked [sum(num_list), D] node matrix back into per-type parts
    (torch.split semantics, model/lightgcn.py:62)."""
    outs, start = [], 0
    for n in num_list:
        outs.append(jax.lax.slice_in_dim(x, start, start + n, axis=0))
        start += n
    return tuple(outs)


def predict_sigmoid(user_emb_sel: jnp.ndarray, item_emb: jnp.ndarray) -> jnp.ndarray:
    """sigmoid(U_sel @ I^T) — the shared predict_rating surface
    (model/lightgcn.py:84-89)."""
    return jax.nn.sigmoid(user_emb_sel @ item_emb.T)


def bpr_with_reg(u_all, i_all, u_reg_src, i_reg_src, batch, loss_kind, reg):
    """Common BPR + L2 pattern: BPR on propagated embeddings, L2 on the given
    regularization source (ego or final, per model)."""
    users, pos, neg = batch[:, 0], batch[:, 1], batch[:, 2]
    ue = jnp.take(u_all, users, axis=0)
    pe = jnp.take(i_all, pos, axis=0)
    ne = jnp.take(i_all, neg, axis=0)
    loss = bpr_loss(ue, pe, ne, loss_kind)
    ur = jnp.take(u_reg_src, users, axis=0)
    pr = jnp.take(i_reg_src, pos, axis=0)
    nr = jnp.take(i_reg_src, neg, axis=0)
    return loss, reg * l2reg_loss(ur, pr, nr)
