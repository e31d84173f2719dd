"""DGCF floor probe (VERDICT r2 #6): exp-plane variants of flash_routing.

The DGCF/DisenGCN flash kernels bottom out at ~83/71ms, attributed to the
VPU-bound [F, TI, TJ] exp/normalize planes.  Two untried levers:

* f32_recip — fold mask * 1/denominator into ONE [TI, TJ] plane (replaces F
  VPU divides + F mask mults with 1 divide + (F+1) mults)
* bf16      — exp/normalize in bf16 (2x VPU packing IF Mosaic vectorizes
  it; the r2 finding that XLA gets no bf16 VPU win does not automatically
  transfer to Mosaic), bf16 aggregation matmul with f32 accumulation

Measures raw routed_mm at hetrec shape (N=15k padded to tile multiples,
F=4, r=16, dx=16 — the DGCF per-factor shapes) for each variant, chained
inside one jit with a host transfer (DESIGN.md §6), then the full DGCF
train step for the winner.

Usage: python -u experiments/dgcf_probe.py   (needs the chip free)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def time_variant(mode, q, k, mask, x, iters=20):
    from tagrec_tpu.ops import flash_routing as fr

    fr.EXP_MODE = mode

    @jax.jit
    def chained(q, k, mask, x):
        def body(carry, _):
            out = fr.routed_mm(q + carry, k, mask, x)
            return jnp.sum(out) * 1e-12, None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return c

    c = float(chained(q, k, mask, x))
    assert np.isfinite(c)
    t0 = time.perf_counter()
    c = float(chained(q, k, mask, x))
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(c)
    print(f"routed_mm[{mode}]: {dt * 1e3:.3f} ms", flush=True)
    return dt


def full_step(mode, steps=30):
    """Full DGCF train step time at hetrec scale under the given variant."""
    from tagrec_tpu.ops import flash_routing as fr

    fr.EXP_MODE = mode
    import bench

    graph = bench.build_graph()
    dt = bench.bench_attention_model(graph, "dgcf", steps=steps)
    print(f"dgcf step[{mode}]: {dt * 1e3:.2f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--full", nargs="*", default=None,
                    help="also run the full DGCF step for these modes")
    args = ap.parse_args()

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    n = 15_360  # hetrec N (15.1k) padded to 256-tile multiple
    f, r, dx = 4, 16, 16
    q = jnp.asarray(rng.standard_normal((f, n, r)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((f, n, r)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((f, n, dx)).astype(np.float32))
    mask = jnp.asarray(rng.random((n, n)) < 0.004)  # hetrec density

    # numerical sanity: variants vs baseline
    from tagrec_tpu.ops import flash_routing as fr
    outs = {}
    for mode in ("f32", "f32_recip", "bf16"):
        fr.EXP_MODE = mode
        outs[mode] = np.asarray(fr.routed_mm(q[:, :512], k[:, :512],
                                             mask[:512, :512], x[:, :512]))
    for mode in ("f32_recip", "bf16"):
        d = np.max(np.abs(outs[mode] - outs["f32"])) / (
            np.max(np.abs(outs["f32"])) + 1e-9)
        print(f"max rel dev vs f32 [{mode}]: {d:.2e}", flush=True)

    for mode in ("f32", "f32_recip", "bf16"):
        time_variant(mode, q, k, mask, x, iters=args.iters)

    if args.full is not None:
        for mode in (args.full or ("f32", "f32_recip", "bf16")):
            full_step(mode)


if __name__ == "__main__":
    main()
