"""Examples/s scaling report over mesh sizes — the BASELINE.json ">=85%
examples/s scaling 1 -> N hosts" harness.

Runs the PRODUCTION data-parallel train step (compose.build_pipeline +
Trainer(mesh) whole-epoch scan) over growing (data, model) meshes and reports
examples/s per mesh size plus the scaling efficiency vs the 1-device run.

On this machine it runs on the virtual CPU mesh (correctness of the sharding
math and the measurement protocol; CPU "devices" share two physical cores, so
the efficiency NUMBER is not meaningful here).  On a real slice the same
script produces the deliverable number: JAX_PLATFORMS unset, devices = the
slice, optionally multi-process via parallel.launch.initialize().

Usage:
    python -u experiments/scaling.py --cpu --sizes 1 2 4 8 --steps 20
Writes: SCALING.md
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(mesh, graph, batch, steps, model_name="lightgcn"):
    import jax
    import jax.numpy as jnp

    from tagrec_tpu.compose import build_pipeline
    from tagrec_tpu.config import TrainConfig, model_preset
    from tagrec_tpu.parallel import sharding as shd
    from tagrec_tpu.training.train import Trainer

    mcfg = model_preset(model_name, reg=1e-4)
    tcfg = TrainConfig(train_batch=batch)
    pipe = build_pipeline(graph, mcfg, tcfg, mesh=mesh)
    params = pipe.model.init(jax.random.PRNGKey(0))
    phase = pipe.phases[0]
    phase.steps_per_epoch = steps
    trainer = Trainer([phase], tcfg, mesh=mesh)
    opt_state = trainer.init_opt_state(params)
    if mesh is not None:
        params = shd.place(params, shd.params_sharding(params, mesh))
        opt_state = shd.place(opt_state,
                              shd.params_sharding(opt_state, mesh))
        gdev = shd.place(pipe.gdev, shd.gdev_sharding(pipe.gdev, mesh))
    else:
        gdev = pipe.gdev
    fn = trainer._epoch_fn(phase)

    key = jax.random.PRNGKey(1)
    p, o, key, parts = fn(params, opt_state, key, gdev, phase.data)
    chk = float(jnp.sum(parts))  # host transfer = real sync (DESIGN.md §6)
    assert np.isfinite(chk)
    t0 = time.perf_counter()
    p, o, key, parts = fn(p, o, key, gdev, phase.data)
    chk += float(jnp.sum(parts))
    dt = time.perf_counter() - t0
    assert np.isfinite(chk)
    return batch * steps / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--model", default="lightgcn")
    ap.add_argument("--mp", type=int, default=1,
                    help="model-parallel factor within each mesh")
    ap.add_argument("--weak", action="store_true",
                    help="weak scaling: per-device batch fixed at --batch "
                         "(global batch grows with dp); default is strong "
                         "scaling (global batch fixed)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="SCALING.md")
    args = ap.parse_args()

    import jax

    if args.cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count="
                        f"{max(args.sizes) * args.mp}").strip()
        jax.config.update("jax_platforms", "cpu")

    from tagrec_tpu.data.synthetic import synthetic_graph_large
    from tagrec_tpu.parallel.launch import initialize
    from tagrec_tpu.parallel.mesh import make_mesh

    initialize()  # no-op single-process; wires jax.distributed on a slice
    backend = jax.default_backend()
    n_dev = len(jax.devices())
    print(f"backend: {backend}, devices: {n_dev}", flush=True)

    graph = synthetic_graph_large(n_user=2000, n_item=10000, n_tag=3000,
                                  n_edges=400_000, tag_per_inter=0.3, seed=0)
    rows = []
    base = None
    for n in args.sizes:
        if n * args.mp > n_dev:
            print(f"skip size {n} (need {n * args.mp} devices)", flush=True)
            continue
        mesh = None if n * args.mp == 1 else make_mesh(
            n * args.mp, data_parallel=n)
        # weak scaling: per-device batch fixed -> global batch grows with dp
        gbatch = args.batch * n if args.weak else args.batch
        eps = measure(mesh, graph, gbatch, args.steps, args.model)
        if base is None:
            base = eps
        eff = eps / (base * n / args.sizes[0])
        rows.append((n, round(eps, 1), round(100 * eff, 1)))
        print(f"dp={n} mp={args.mp} batch={gbatch}: {eps:.1f} examples/s "
              f"(efficiency {100*eff:.1f}%)", flush=True)

    if backend == "cpu":
        # A virtual CPU mesh shares 2 physical cores: more "devices" =
        # core contention, and an "efficiency vs linear" table is actively
        # misleading (VERDICT r4 weak #6).  Leave the hand-written
        # SCALING.md (harness description + what IS validated here) alone
        # and only report to stdout.
        print(f"cpu virtual mesh — not overwriting {args.out} "
              "(no meaningful scaling numbers on shared cores)", flush=True)
    else:
        with open(args.out, "w") as f:
            f.write("# SCALING — data-parallel examples/s vs mesh size\n\n")
            f.write(f"Backend: **{backend}** ({n_dev} devices), model "
                    f"{args.model}, "
                    f"{'per-device' if args.weak else 'global'} batch "
                    f"{args.batch}, mp={args.mp}, "
                    f"{'weak' if args.weak else 'strong'} scaling.\n")
            f.write("\n| dp | examples/s | efficiency vs linear |\n"
                    "|---|---|---|\n")
            for n, eps, eff in rows:
                f.write(f"| {n} | {eps} | {eff}% |\n")
        print(f"wrote {args.out}", flush=True)
    print(json.dumps({"rows": rows, "backend": backend}))


if __name__ == "__main__":
    main()
