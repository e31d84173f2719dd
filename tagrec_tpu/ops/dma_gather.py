"""Dynamically-addressed DMA row gather (Pallas) — the sparse-regime probe.

The sparse-regime models (TGCN's six [N, k] neighbor tables, true-KG KGAT's
1.6M-edge EdgeMap) are bound by XLA's gather/scatter throughput, measured
~12x off the HBM roofline on this chip (DESIGN.md §8).  Mosaic cannot do
vector int indexing into VMEM ("Cannot do int indexing on TPU"), but it DOES
support dynamically-addressed async copies: a scalar row id read from SMEM
(scalar prefetch) can drive a per-row HBM→VMEM DMA.  This module is the
standard TPU embedding-lookup recipe built from that primitive:

* ``gather_rows(x, idx)``     — out[r] = x[idx[r]]; drop-in for
                                ``jnp.take(x, idx, axis=0)`` (forward only)
* ``gather_reduce(x, idx, val)`` — out[n] = Σ_k val[n,k] · x[idx[n,k]]; the
                                fused ELL-SpMM form (gather + weighted
                                segment-sum accumulated in VMEM)

Shape of the kernel: the row-id table is a scalar-prefetch operand (SMEM),
the embedding table stays in HBM (memory_space=ANY), and each grid step
issues ``slots`` outstanding per-row DMAs round-robin into the VMEM output
block — issue slot s, wait slot s, reissue — so up to ``slots`` copies are
in flight while the scalar core computes the next addresses (the guide's
double-buffering pattern generalized to an N-deep pipeline).

Role match: /root/reference/model/help/adj.py:158-167 (SpMM),
model/tgcn.py:11-37 (neighbor-table gathers), model/kgat.py:96-106
(attention gathers).  Off-TPU the kernels run in interpret mode so the CPU
suite covers them.

CHIP VERDICT (round 3, v5e, DESIGN.md §8): per-row DMA gather is
ISSUE-RATE-BOUND at ~25-31 ns/row regardless of slot depth (8/16/32
identical) — 5.4x slower than jnp.take at the TGCN shape (12.2 vs 2.28 ms
for 395k x 256B rows) and 7.9x at the KG shape (37.2 vs 4.73 ms for
1.64M rows); the fused gather_reduce lands at the same wall (12.2 vs
3.0 ms).  XLA's gather, though ~9-19x off the HBM roofline, is the better
tool for 256B rows on this chip: its gathers pipeline inside the vector
pipeline while DMA descriptors serialize on the scalar core.  These
kernels are kept as measured evidence + the recipe (scalar-prefetch,
dynamically-addressed copies, N-deep pipeline) for hardware where DMA
issue is cheaper or rows are >=2KB (where per-row DMA amortizes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# ------------------------------------------------------------- gather_rows


def _gather_kernel(idx_ref, x_ref, out_ref, sem, *, block_rows: int,
                   slots: int):
    """One grid step: DMA ``block_rows`` randomly-addressed rows of ``x``
    into the output block, ``slots`` copies in flight."""
    base = pl.program_id(0) * block_rows

    def copy(i):
        row = idx_ref[base + i]
        return pltpu.make_async_copy(
            x_ref.at[pl.ds(row, 1), :],
            out_ref.at[pl.ds(i, 1), :],
            sem.at[jax.lax.rem(i, slots)])

    def warm(i, _):
        copy(i).start()
        return _

    jax.lax.fori_loop(0, min(slots, block_rows), warm, None)

    def body(i, _):
        # issue i+slots (same sem slot as i, which we are about to drain —
        # in-order wait keeps at most one outstanding copy per slot) ...
        @pl.when(i + slots < block_rows)
        def _():
            copy(i + slots).start()

        # ... then wait for copy i (reconstructing the descriptor is the
        # documented way to wait on a started DMA)
        copy(i).wait()
        return _

    jax.lax.fori_loop(0, block_rows, body, None)


# scalar-prefetch operands are materialized in SMEM; stay well under its
# ~1MB by chunking the id table and lax.map-ing the kernel over chunks
MAX_PREFETCH_IDS = 128 * 1024

# Mosaic requires DMA slice shapes aligned to the ref's tiling: the LANE
# (last) dim of a per-row copy must be a multiple of 128.  d=64 tables are
# padded to 128 lanes before the kernel (measured on chip: the copy then
# moves 2x the payload bytes — fold that into any roofline comparison).
LANE = 128


def _pad_lanes(x):
    pad = (-x.shape[1]) % LANE
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    return x


@functools.partial(jax.jit, static_argnames=("block_rows", "slots"))
def gather_rows(x: jax.Array, idx: jax.Array, *, block_rows: int = 1024,
                slots: int = 16) -> jax.Array:
    """out[r, :] = x[idx[r], :] via per-row dynamically-addressed DMA.

    ``idx`` must be 1-D int32 with in-range ids (callers using +1-shifted
    0-pad tables already guarantee this).  Forward only — wrap in a
    custom_vjp at the call site if the consumer differentiates through it.
    """
    (r,) = idx.shape
    d = x.shape[1]
    if r > MAX_PREFETCH_IDS:
        chunk = MAX_PREFETCH_IDS
        pad = (-r) % chunk
        idx_c = jnp.pad(idx, (0, pad)).reshape(-1, chunk)
        out = jax.lax.map(
            lambda ic: gather_rows(x, ic, block_rows=block_rows,
                                   slots=slots), idx_c)
        return out.reshape(-1, d)[:r]
    x = _pad_lanes(x)
    pad = (-r) % block_rows
    if pad:
        idx = jnp.pad(idx, (0, pad))  # pad rows gather row 0, then dropped
    n_pad = r + pad

    out = pl.pallas_call(
        functools.partial(_gather_kernel, block_rows=block_rows,
                          slots=slots),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_pad // block_rows,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (block_rows, x.shape[1]), lambda g, idx: (g, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((slots,))],
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, x.shape[1]), x.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_interpret(),
    )(idx.astype(jnp.int32), x)
    return out[:r, :d]


# ----------------------------------------------------------- gather_reduce


def _reduce_kernel(idx_ref, val_ref, x_ref, out_ref, buf, sem, *,
                   block_n: int, k: int, slots: int):
    """out[n] = Σ_k val[n, k] · x[idx[n, k]] for ``block_n`` output rows.

    All block_n·k gathered rows land in the VMEM staging buffer first
    (k-deep DMA pipeline), then one einsum does the weighted segment-sum —
    splitting DMA from compute keeps the scalar core issuing back-to-back.
    """
    # idx arrives FLAT [n*k]: a 2-D scalar-prefetch operand is lane-padded
    # to 128 in SMEM (measured: [5120, 25] i32 became a 2.6MB allocation,
    # over the 1MB SMEM), a 1-D one is not
    base = pl.program_id(0) * block_n * k
    total = block_n * k

    def copy(e):
        row = idx_ref[base + e]
        return pltpu.make_async_copy(
            x_ref.at[pl.ds(row, 1), :],
            buf.at[pl.ds(e, 1), :],
            sem.at[jax.lax.rem(e, slots)])

    def warm(e, _):
        copy(e).start()
        return _

    jax.lax.fori_loop(0, min(slots, total), warm, None)

    def body(e, _):
        @pl.when(e + slots < total)
        def _():
            copy(e + slots).start()

        copy(e).wait()
        return _

    jax.lax.fori_loop(0, total, body, None)

    rows = buf[:].reshape(block_n, k, x_ref.shape[1])
    # multiply+sum on the VPU: Mosaic cannot lower the batched
    # [n,k]x[n,k,d] dot_general (TPU_DotDimensionNumbersAttr parse failure,
    # measured on chip), and the op is DMA-bound anyway
    w = val_ref[:].astype(jnp.float32)[:, :, None]
    out_ref[:] = jnp.sum(rows.astype(jnp.float32) * w,
                         axis=1).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "slots"))
def gather_reduce(x: jax.Array, idx: jax.Array, val: jax.Array, *,
                  block_n: int = 256, slots: int = 16) -> jax.Array:
    """Fused ELL SpMM: out[n, :] = Σ_k val[n, k] · x[idx[n, k], :].

    ``idx``/``val``: [N, K] (pad slots: any in-range id with val 0).
    Forward only (the transpose-pair machinery owns the backward).
    """
    n, k = idx.shape
    d = x.shape[1]
    if n * k > MAX_PREFETCH_IDS:
        rows_per = max(block_n, (MAX_PREFETCH_IDS // k) // block_n * block_n)
        pad = (-n) % rows_per
        idx_c = jnp.pad(idx, ((0, pad), (0, 0))).reshape(-1, rows_per, k)
        val_c = jnp.pad(val, ((0, pad), (0, 0))).reshape(-1, rows_per, k)
        out = jax.lax.map(
            lambda iv: gather_reduce(x, iv[0], iv[1], block_n=block_n,
                                     slots=slots), (idx_c, val_c))
        return out.reshape(-1, d)[:n]
    x = _pad_lanes(x)
    pad = (-n) % block_n
    if pad:
        idx = jnp.pad(idx, ((0, pad), (0, 0)))
        val = jnp.pad(val, ((0, pad), (0, 0)))
    n_pad = n + pad

    out = pl.pallas_call(
        functools.partial(_reduce_kernel, block_n=block_n, k=k, slots=slots),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_pad // block_n,),
            in_specs=[
                pl.BlockSpec((block_n, k), lambda g, idx: (g, 0),
                             memory_space=pltpu.VMEM),  # val
                pl.BlockSpec(memory_space=pl.ANY),      # x (HBM)
            ],
            out_specs=pl.BlockSpec(
                (block_n, x.shape[1]), lambda g, idx: (g, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((block_n * k, x.shape[1]), x.dtype),
                pltpu.SemaphoreType.DMA((slots,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, x.shape[1]),
                                       jnp.promote_types(x.dtype, val.dtype)),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_interpret(),
    )(idx.astype(jnp.int32).ravel(), val, x)
    return out[:n, :d]
