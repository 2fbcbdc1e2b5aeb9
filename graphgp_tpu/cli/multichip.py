"""Multi-chip scaling-efficiency harness: walks/s and CG iters/s vs devices.

Measures the two north-star throughput axes (BASELINE.md: >=80% scaling
efficiency 1 chip -> host -> pod on million-node graphs) against the device
count, using the SPMD paths in ..shard:

  * sharded walker (start-node blocks over the mesh, replicated gather
    tables — zero collectives),
  * distributed Gram CG (two psums per iteration, shard.py:162-272).

On real hardware the mesh spans chips and the efficiency numbers are the
north-star artifact. On a single host the same harness runs against the
virtual CPU platform (tests/conftest.py pattern) — there the devices share
one socket's cores, so parallel efficiency reflects harness correctness and
collective overhead, NOT hardware scaling; the CSV records the platform so
the two are never confused. This is the pod-ready driver the reference has
no analog of (its only parallelism is a fork pool, SURVEY §2.4 P1).

Usage:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m graphgp_tpu.cli.multichip --devices 1 2 4 8
"""
from __future__ import annotations

import argparse
import time
from typing import Dict, List

import numpy as np


def _time_best(fn, repeats: int = 3) -> float:
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    from ..utils.config import add_config_flag, parse_with_config

    add_config_flag(p)
    p.add_argument("--devices", type=int, nargs="+", default=None,
                   help="device counts to sweep (default: 1,2,4,... up to "
                        "all available)")
    p.add_argument("--n-nodes", type=int, default=32768)
    p.add_argument("--walks-per-node", type=int, default=100)
    p.add_argument("--p-halt", type=float, default=0.1)
    p.add_argument("--max-walk-length", type=int, default=3)
    p.add_argument("--n-train", type=int, default=4096)
    p.add_argument("--cg-iters", type=int, default=50)
    p.add_argument("--cg-batch", type=int, default=8)
    p.add_argument("--force-cpu", action="store_true",
                   help="run on the 8-device virtual CPU platform (the "
                        "container's sitecustomize pins jax_platforms to "
                        "the TPU backend, overriding JAX_PLATFORMS)")
    p.add_argument("--results-dir", default="artifacts/results")
    args, _cfg = parse_with_config(p, argv)

    import os

    if args.force_cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()

    import jax

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from .. import WalkConfig, pack_laplacian
    from ..data.synthetic import generate_ring_data
    from ..features import LogFeatures
    from ..gp import params as P
    from ..shard import distributed_gram_solve, make_mesh, sharded_walk_log
    from ..utils.io import save_results
    from ..walker import sample_walk_log

    n_avail = len(jax.devices())
    devices = args.devices
    if devices is None:
        devices = []
        d = 1
        while d <= n_avail:
            devices.append(d)
            d *= 2
    devices = [d for d in devices if d <= n_avail]
    platform = jax.devices()[0].platform
    print(f"platform={platform} devices available={n_avail} sweep={devices}")

    n = args.n_nodes
    data = generate_ring_data(n, seed=0)
    graph = pack_laplacian(data["adjacency"])
    cfg = WalkConfig(
        walks_per_node=args.walks_per_node,
        p_halt=args.p_halt,
        max_walk_length=args.max_walk_length,
    )

    # Features for the CG arm (built once, single-device; the solve shards
    # it). LogFeatures: its products are einsum/scatter over the walk log —
    # no lax.scan in the matvec, which shard_map's varying-axes checker
    # requires (the ELL layouts scan over steps; their carries would need
    # pvary plumbing inside shard_map).
    log = sample_walk_log(graph, jax.random.PRNGKey(0), cfg)
    feats = LogFeatures(log, num_target_nodes=n)
    params = P.init_params("free", cfg.max_walk_length, jax.random.PRNGKey(1))
    rng = np.random.default_rng(0)
    train_idx = jnp.asarray(
        np.sort(rng.choice(n, args.n_train, replace=False)), jnp.int32
    )
    b = jnp.asarray(
        rng.normal(size=(args.n_train, args.cg_batch)), jnp.float32
    )

    records: List[Dict] = []
    base_walk = base_cg = base_nd = None
    for nd in devices:
        mesh = make_mesh(nd)

        def run_walk(seed=0):
            lg = sharded_walk_log(graph, jax.random.PRNGKey(seed), cfg, mesh)
            jax.block_until_ready(lg.loads)

        run_walk()  # compile
        walk_s = _time_best(run_walk)
        walks_per_s = n * cfg.walks_per_node / walk_s

        def run_cg():
            # tol=0 forces exactly cg-iters iterations -> comparable work
            x = distributed_gram_solve(
                feats, params, train_idx, b, mesh,
                tol=0.0, max_iters=args.cg_iters,
            )
            jax.block_until_ready(x)

        run_cg()  # compile
        cg_s = _time_best(run_cg)
        cg_iters_per_s = args.cg_iters / cg_s

        if base_walk is None:
            base_walk, base_cg, base_nd = walks_per_s, cg_iters_per_s, nd
        # Per-device efficiency relative to the first swept device count:
        # eff = (tp / base_tp) * (base_nd / nd) — exact even when the sweep
        # does not include nd=1 (perfect scaling always reports 1.0).
        eff_walk = (walks_per_s / base_walk) * (base_nd / nd)
        eff_cg = (cg_iters_per_s / base_cg) * (base_nd / nd)
        records.append({
            "platform": platform,
            "n_devices": nd,
            "n_nodes": n,
            "walks_per_s": walks_per_s,
            "walk_seconds": walk_s,
            "walk_parallel_efficiency": eff_walk,
            "cg_iters_per_s": cg_iters_per_s,
            "cg_seconds": cg_s,
            "cg_parallel_efficiency": eff_cg,
        })
        print(
            f"[{nd} dev] walks/s={walks_per_s:,.0f} (eff {eff_walk:.2f})  "
            f"CG iters/s={cg_iters_per_s:.1f} (eff {eff_cg:.2f})"
        )

    path = save_results(records, args.results_dir, "multichip",
                        config=vars(args))
    print(f"results -> {path}")
    return records


if __name__ == "__main__":
    main()
