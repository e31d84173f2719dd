"""Chip measurement: dynamically-addressed DMA gather vs XLA's gather.

The sparse-regime question from VERDICT r2 #2 / DESIGN.md §8: XLA's random
row gather runs ~12x off the HBM roofline on this chip.  Does the Pallas
per-row-DMA recipe (ops/dma_gather.py) beat it?

Shapes measured (the two consumers):
  * TGCN table:  x [12.8k, 64], idx [15.8k * 25]   (one of six per layer)
  * KG-KGAT:     x [17k, 64],   idx [1.64M]         (edgemap row gathers)

Timing protocol per CLAUDE.md: lax.scan chain inside ONE jit where each
iteration consumes the previous output (fold the gathered rows back into a
scalar that perturbs the index base), plus a host transfer at the end.

Usage: python -u experiments/gather_bench.py [--iters 20]
Needs the TPU chip free (one TPU process at a time).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def chain_time(fn, args, iters, label):
    """Scan-chain fn inside one jit; each iter consumes the last output."""

    @jax.jit
    def chained(args):
        def body(carry, _):
            out = fn(*jax.tree_util.tree_map(
                lambda a: a if a.dtype != jnp.int32
                else (a + carry.astype(jnp.int32)) % jnp.int32(7) + a, args))
            # consume ALL of the output (full reduction -> next iter's carry)
            return jnp.sum(out) * 1e-9, None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return c

    c = float(chained(args))  # compile + warmup
    assert np.isfinite(c)
    t0 = time.perf_counter()
    c = float(chained(args))
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(c)
    print(f"{label}: {dt * 1e3:.3f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--slots", type=int, nargs="+", default=[8, 16, 32])
    args = ap.parse_args()

    from tagrec_tpu.ops import dma_gather as dg

    print("backend:", jax.default_backend(), flush=True)
    results = {}
    rng = np.random.default_rng(0)

    for name, m, r in (("tgcn_table", 12_800, 15_800 * 25),
                       ("kg_edges", 17_000, 1_640_000)):
        x = jnp.asarray(rng.standard_normal((m, 64)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, m - 8, size=r).astype(np.int32))
        bytes_moved = r * 64 * 4
        res = {}
        res["xla_take_ms"] = chain_time(
            lambda x, i: jnp.take(x, i, axis=0), (x, idx), args.iters,
            f"{name} xla take [{r} rows]") * 1e3
        for s in args.slots:
            res[f"dma_s{s}_ms"] = chain_time(
                lambda x, i, s=s: dg.gather_rows(x, i, slots=s),
                (x, idx), args.iters, f"{name} dma slots={s}") * 1e3
        res["roofline_ms"] = bytes_moved / 800e9 * 1e3  # ~800GB/s HBM
        results[name] = res
        print(name, json.dumps(res), flush=True)

    # fused reduce at the TGCN shape (out[n] = sum_k val * x[idx])
    n, k = 15_800, 25
    x = jnp.asarray(rng.standard_normal((12_800, 64)).astype(np.float32))
    idx2 = jnp.asarray(rng.integers(0, 12_792, size=(n, k)).astype(np.int32))
    val = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    res = {}
    res["xla_einsum_ms"] = chain_time(
        lambda x, i, v: jnp.einsum("nk,nkd->nd", v, jnp.take(x, i, axis=0)),
        (x, idx2, val), args.iters, "reduce xla take+einsum") * 1e3
    res["dma_reduce_ms"] = chain_time(
        lambda x, i, v: dg.gather_reduce(x, i, v),
        (x, idx2, val), args.iters, "reduce dma fused") * 1e3
    results["gather_reduce"] = res
    print(json.dumps(results, indent=1), flush=True)


if __name__ == "__main__":
    main()
