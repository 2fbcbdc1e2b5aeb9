"""Scaling experiment driver: RW sampling throughput + GP train/predict
across graph sizes.

Re-design of reference ``run_scaling_experiment.py`` (experiments/sparse/
scaling_exp/run_scaling_experiment.py:53-971): ring graphs over a size sweep,
phase flags (--rw-only / --gp-only / --exact-only), CSV results with
timestamped copies, per-phase timers. The reference's sparse/dense framework
split (GPyTorch CG vs GPflow Cholesky) maps to our iterative vs exact GP on
one shared feature stack.

Usage:
    python -m graphgp_tpu.cli.scaling --sizes 1024 4096 --walks-per-node 100
"""
from __future__ import annotations

import argparse
import time
from typing import Dict, List

import numpy as np


def run_rw_phase(sizes, cfg_args, records):
    import jax
    import jax.numpy as jnp

    from .. import WalkConfig, blocked_ell_features, pack_laplacian
    from ..data.synthetic import generate_ring_data
    from ..utils.profiling import walks_per_second

    cfg = WalkConfig(
        walks_per_node=cfg_args.walks_per_node,
        p_halt=cfg_args.p_halt,
        max_walk_length=cfg_args.max_walk_length,
    )
    for n in sizes:
        data = generate_ring_data(n, seed=cfg_args.seed)
        graph = pack_laplacian(data["adjacency"])
        # Timed quantity = the full kernel build (walk + consolidation into
        # ELL step matrices), the deliverable of the reference's RW benchmark
        # (run_scaling_experiment.py:329-379). Blocked pipeline handles any N.
        feats = blocked_ell_features(graph, jax.random.PRNGKey(cfg_args.seed), cfg)
        float(jnp.sum(feats.mats.vals))  # compile + warm
        t0 = time.time()
        feats = blocked_ell_features(
            graph, jax.random.PRNGKey(cfg_args.seed + 1), cfg,
            capacity=feats.mats.row_capacity,
        )
        float(jnp.sum(feats.mats.vals))
        dt = time.time() - t0
        mats = feats.mats
        nnz = int(mats.nnz())
        dense_bytes = cfg.max_walk_length * n * n * 4
        ell_bytes = int(np.prod(mats.cols.shape)) * 8
        rec = {
            "phase": "rw",
            "n_nodes": n,
            "walks_per_node": cfg.walks_per_node,
            "rw_seconds": dt,
            "walks_per_s": walks_per_second(n, cfg.walks_per_node, dt),
            "nnz": nnz,
            "ell_mb": ell_bytes / 1e6,
            "compression_vs_dense": dense_bytes / max(ell_bytes, 1),
        }
        records.append(rec)
        print(
            f"[rw] n={n}: {dt:.3f}s  {rec['walks_per_s']:,.0f} walks/s  "
            f"nnz={nnz}  {rec['ell_mb']:.1f}MB (x{rec['compression_vs_dense']:.0f} vs dense)"
        )


def run_gp_phase(sizes, cfg_args, records, exact_mode=False):
    import jax
    import jax.numpy as jnp

    from .. import WalkConfig
    from ..data.synthetic import generate_ring_data
    from ..features import DenseFeatures
    from ..gp import exact as gp_exact
    from ..gp import iterative
    from ..preprocessor import preprocess_graph

    cfg = WalkConfig(
        walks_per_node=cfg_args.walks_per_node,
        p_halt=cfg_args.p_halt,
        max_walk_length=cfg_args.max_walk_length,
    )
    settings = iterative.CGSettings(
        cg_tol=cfg_args.cg_tol, cg_max_iters=100, num_probes=16
    )
    for n in sizes:
        data = generate_ring_data(n, seed=cfg_args.seed)
        # iterative arm: layout="auto" → stencil on these ring graphs, so CG
        # matvecs are rolls+FMAs; exact arm needs ELL mats to densify.
        feats = preprocess_graph(
            data["adjacency"], cfg, seed=cfg_args.seed,
            cache_dir=cfg_args.cache_dir,
            layout="ell" if exact_mode else "auto",
        )
        if exact_mode:
            from ..features import ell_to_dense

            feats = DenseFeatures(ell_to_dense(feats.mats))
        rng = np.random.default_rng(cfg_args.seed)
        perm = rng.permutation(n)
        tr = jnp.asarray(np.sort(perm[: n // 2]), jnp.int32)
        te = jnp.asarray(np.sort(perm[n // 2 :]), jnp.int32)
        y = jnp.asarray(data["y_observed"], jnp.float32)

        t0 = time.time()
        if exact_mode:
            # L-BFGS mirrors the reference dense arm (gpflow Scipy optimizer,
            # run_scaling_experiment.py:713-789) and converges in far fewer
            # steps than Adam on the exact MLL.
            res = gp_exact.fit(
                feats, tr, y[tr], kind="free", num_steps=cfg_args.train_epochs,
                learning_rate=cfg_args.learning_rate, optimizer="lbfgs",
            )
        else:
            res = iterative.fit(
                feats, tr, y[tr], kind="free", num_steps=cfg_args.train_epochs,
                learning_rate=cfg_args.learning_rate, settings=settings,
            )
        jax.block_until_ready(res.params)
        train_s = time.time() - t0

        t0 = time.time()
        if exact_mode:
            post = gp_exact.predict(feats, res.params, tr, y[tr], te, kind="free")
            mean = post.mean
        else:
            samples = iterative.pathwise_predict(
                feats, res.params, tr, y[tr], te, jax.random.PRNGKey(0),
                kind="free", num_samples=cfg_args.num_pathwise_samples,
                settings=settings,
                # dense train sets ride the scatter-free full-space solver
                # (same auto rule as iterative.fit)
                full_space=bool(tr.shape[0] * 8 >= n),
            )
            mean = iterative.summarize_samples(samples).mean
        float(jnp.sum(mean))
        predict_s = time.time() - t0
        rmse = float(
            jnp.sqrt(jnp.mean((mean - jnp.asarray(data["y_true"])[te]) ** 2))
        )
        phase = "exact_gp" if exact_mode else "iterative_gp"
        records.append(
            {
                "phase": phase,
                "n_nodes": n,
                "train_seconds": train_s,
                "predict_seconds": predict_s,
                "rmse": rmse,
                "final_loss": float(res.losses[-1]),
            }
        )
        print(
            f"[{phase}] n={n}: train {train_s:.2f}s predict {predict_s:.2f}s "
            f"rmse {rmse:.4f}"
        )


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    from ..utils.config import add_config_flag, parse_with_config

    add_config_flag(p)
    p.add_argument("--sizes", type=int, nargs="+", default=[256, 1024, 4096])
    p.add_argument("--walks-per-node", type=int, default=100)
    p.add_argument("--p-halt", type=float, default=0.1)
    p.add_argument("--max-walk-length", type=int, default=3)
    p.add_argument("--train-epochs", type=int, default=50)
    p.add_argument("--learning-rate", type=float, default=0.1)
    p.add_argument("--cg-tol", type=float, default=1e-2)
    p.add_argument("--num-pathwise-samples", type=int, default=64)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--rw-only", action="store_true")
    p.add_argument("--gp-only", action="store_true")
    p.add_argument("--exact-only", action="store_true")
    p.add_argument("--results-dir", default="artifacts/results")
    p.add_argument("--cache-dir", default="artifacts/step_matrices")
    args, _cfg = parse_with_config(p, argv)

    records: List[Dict] = []
    do_all = not (args.rw_only or args.gp_only or args.exact_only)

    def run_phase(fn, sizes, phase_name, **kw):
        # per-size fault tolerance (reference semantics: record error row,
        # continue the sweep — ablation_study.py:167-173)
        for n in sizes:
            try:
                fn([n], args, records, **kw)
            except Exception as e:  # noqa: BLE001
                print(f"!! {phase_name} n={n} failed: {e}")
                records.append(
                    {"phase": phase_name, "n_nodes": n,
                     "error": f"{type(e).__name__}: {e}"}
                )

    if args.rw_only or do_all:
        run_phase(run_rw_phase, args.sizes, "rw")
    if args.gp_only or do_all:
        run_phase(run_gp_phase, args.sizes, "iterative_gp", exact_mode=False)
    if args.exact_only or do_all:
        exact_sizes = [n for n in args.sizes if n <= 4096]
        run_phase(run_gp_phase, exact_sizes, "exact_gp", exact_mode=True)

    from ..utils.io import save_results

    path = save_results(records, args.results_dir, "scaling", config=vars(args))
    print(f"results -> {path}")
    return records


if __name__ == "__main__":
    main()
