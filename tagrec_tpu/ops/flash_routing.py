"""Pallas TPU kernels for factor-softmax routing (DGCF / DisenGCN dense mode).

The disentangled routing models weight each edge by a softmax over FACTORS of
low-rank pair scores (model/dgcf.py:74, model/disengcn.py:30-33) — a purely
tile-local operation (no row reduction), which makes it the ideal fusion
target: the [F, N, N] routed adjacency never exists.  Each kernel recomputes
score tiles on the MXU from [F, N, r] factors, applies the factor softmax and
the boolean edge mask in VMEM, and consumes the tile immediately.  HBM traffic
is the int8 mask plus the small factor/feature matrices — the XLA chunked
formulation (ops.dense_adj) materializes [chunk, N] score and probability
planes in HBM instead.

Both models DETACH the routing weights (reference model/dgcf.py:92,
model/disengcn.py:36), so the adjacency needs no cotangent: the only backward
work is the transposed propagation sweep (``_mm_kernel`` over the transposed
mask), wired through a custom VJP in ``routed_mm``.

Kernels:
* ``routed_mm(q, k, mask, x, base)``      out_f = (softmax_F(base + q_f k_f^T) . mask) @ x_f
* ``routed_rowsum(q, k, mask, base)``     d_f   = row sums of the routed adjacency
Wrappers pad N to tile multiples and fall back to interpret mode off-TPU
(tests run the same kernels on CPU).

ops.dense_adj functions are the correctness oracles (tests/test_flash_routing.py).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_I = 256
TILE_J = 256


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _pad_axis(x, mult: int, axis: int):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _scores(q_tile, k_tile, base):
    """[F, TI, TJ] = base + q_tile @ k_tile^T (batched over factors)."""
    return base + jax.lax.dot_general(
        q_tile, k_tile, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


# Exp-plane execution variant for the VPU-bound [F, TI, TJ] softmax planes
# (the DGCF/DisenGCN floor, VERDICT r2 #6).  Routing weights are detached in
# both reference models, so lower-precision PLANES change no gradient path.
#   f32       — round-2 baseline: F divides + F mask multiplies
#   f32_recip — fold mask and 1/denominator into ONE [TI, TJ] plane, then F
#               multiplies (replaces F VPU divides with 1 divide + F mults)
#   bf16      — exp + normalize in bf16 (2x VPU packing if Mosaic vectorizes
#               it), f32 denominator accumulation, bf16 aggregation matmul
#               with f32 MXU accumulation
# Default set by the round-3 chip measurement (experiments/dgcf_probe.py).
EXP_MODE = "f32"


def _routed_tile(q_tile, k_tile, m_tile, base):
    s = _scores(q_tile, k_tile, base)
    # manual softmax without the max-subtraction pass: both callers' scores
    # are bounded (DGCF: |S| <= 1 + iterations, unit-normalized update dots;
    # DisenGCN: |S| <= 1), so exp cannot overflow — saves a VPU sweep over
    # the [F, TI, TJ] plane (these kernels are VPU-bound, not MXU-bound)
    if EXP_MODE == "bf16":
        e = jnp.exp(s.astype(jnp.bfloat16))
        denom = jnp.sum(e.astype(jnp.float32), axis=0)
        w = (m_tile.astype(jnp.float32) / denom).astype(jnp.bfloat16)
        return e * w[None]  # bf16 planes; caller casts x for the MXU dot
    e = jnp.exp(s)
    if EXP_MODE == "f32_recip":
        w = m_tile.astype(jnp.float32) / jnp.sum(e, axis=0)
        return e * w[None]
    p = e / jnp.sum(e, axis=0, keepdims=True)
    return p * m_tile[None].astype(jnp.float32)


def _mm_kernel(base, q_ref, k_ref, m_ref, x_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    p = _routed_tile(q_ref[...], k_ref[...], m_ref[...], base)
    x = x_ref[...].astype(p.dtype)  # bf16 variant: bf16 MXU, f32 accumulate
    out_ref[...] += jax.lax.dot_general(
        p, x, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def _rowsum_kernel(base, q_ref, k_ref, m_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    p = _routed_tile(q_ref[...], k_ref[...], m_ref[...], base)
    out_ref[...] += jnp.sum(p.astype(jnp.float32), axis=2)


def _mm_call(q, k, mask, x, base):
    """Padded-core routed matmul: all dims already tile multiples."""
    f, n, r = q.shape
    m = k.shape[1]
    dx = x.shape[2]
    grid = (n // TILE_I, m // TILE_J)
    return pl.pallas_call(
        partial(_mm_kernel, float(base)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((f, TILE_I, r), lambda i, j: (0, i, 0)),
            pl.BlockSpec((f, TILE_J, r), lambda i, j: (0, j, 0)),
            pl.BlockSpec((TILE_I, TILE_J), lambda i, j: (i, j)),
            pl.BlockSpec((f, TILE_J, dx), lambda i, j: (0, j, 0)),
        ],
        out_specs=pl.BlockSpec((f, TILE_I, dx), lambda i, j: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((f, n, dx), jnp.float32),
        interpret=_interpret(),
    )(q, k, mask, x)


def _prep(q, k, mask, xs):
    """Pad node dims to tile multiples; mask pads are 0 so padded rows/cols
    contribute nothing."""
    qp = _pad_axis(q, TILE_I, 1)
    kp = _pad_axis(k, TILE_J, 1)
    mp = _pad_axis(_pad_axis(mask.astype(jnp.int8), TILE_I, 0), TILE_J, 1)
    xsp = [_pad_axis(x, TILE_J, 1) for x in xs]
    return qp, kp, mp, xsp


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def routed_mm(q, k, mask, x, base: float = 0.0):
    """out_f = (softmax_F(base + q_f @ k_f^T) * mask) @ x_f — fused on TPU.

    q [F, N, r], k [F, M, r], mask [N, M] (bool/int8), x [F, M, dx].
    The routing weights are treated as constants (both reference models detach
    them); gradients flow through ``x`` only — q, k, mask receive zeros.
    """
    return _routed_mm_fwd_impl(q, k, mask, x, base)


def _routed_mm_fwd_impl(q, k, mask, x, base):
    n = q.shape[1]
    qp, kp, mp, (xp,) = _prep(q, k, mask, [x])
    return _mm_call(qp, kp, mp, xp, base)[:, :n]


def _routed_mm_fwd(q, k, mask, x, base):
    return _routed_mm_fwd_impl(q, k, mask, x, base), (q, k, mask)


def _routed_mm_bwd(base, res, g):
    q, k, mask = res
    m_nodes = k.shape[1]
    # dx_f = (softmax_F)^T applied to g: same kernel over the transposed mask
    # with roles of q/k swapped.
    kp, qp, mpt, (gp,) = _prep(k, q, mask.T, [g])
    dx = _mm_call(kp, qp, mpt, gp, base)[:, :m_nodes]
    if jnp.issubdtype(mask.dtype, jnp.floating):
        dmask = jnp.zeros_like(mask)
    else:
        dmask = np.zeros(mask.shape, dtype=jax.dtypes.float0)
    return jnp.zeros_like(q), jnp.zeros_like(k), dmask, dx


routed_mm.defvjp(_routed_mm_fwd, _routed_mm_bwd)


def routed_rowsum(q, k, mask, base: float = 0.0):
    """d_f[n] = sum_m (softmax_F(base + q_f k_f^T) * mask)[n, m].

    Used for DGCF's degree renormalization; the result feeds detached paths
    only, so it is wrapped in stop_gradient.
    """
    n = q.shape[1]
    qp, kp, mp, _ = _prep(q, k, mask, [])
    f, npad, r = qp.shape
    m = kp.shape[1]
    grid = (npad // TILE_I, m // TILE_J)
    out = pl.pallas_call(
        partial(_rowsum_kernel, float(base)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((f, TILE_I, r), lambda i, j: (0, i, 0)),
            pl.BlockSpec((f, TILE_J, r), lambda i, j: (0, j, 0)),
            pl.BlockSpec((TILE_I, TILE_J), lambda i, j: (i, j)),
        ],
        out_specs=pl.BlockSpec((f, TILE_I), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((f, npad), jnp.float32),
        interpret=_interpret(),
    )(qp, kp, mp)
    return jax.lax.stop_gradient(out[:, :n])
