"""Bayesian-optimization driver: algorithm sweep × seed sweep on synthetic
graphs or loaded datasets.

Re-design of reference ``run_bo.py`` / ``run_graph_bo.py``
(experiments/sparse/scalable_bo/run_bo.py:17-194, experiments/graph_bo/
scripts/run_graph_bo.py:39-191): per-dataset step-matrix cache, target
gaussianization, algorithm × seed sweep, combined CSV results.

Usage:
    python -m graphgp_tpu.cli.bo --graph-type grid --n-nodes 1024 \
        --algorithms random_search bfs grf_thompson --iterations 20
"""
from __future__ import annotations

import argparse
from typing import Dict, List

import numpy as np


def gaussianize(y: np.ndarray) -> np.ndarray:
    """Rank-based inverse-normal transform of the targets (reference
    run_graph_bo.py:57 normalizes targets before BO)."""
    from scipy import stats

    ranks = stats.rankdata(y)
    return stats.norm.ppf(ranks / (len(y) + 1)).astype(np.float32)


def _error_text(e: Exception, max_chars: int = 12000) -> str:
    """Error-row text that keeps the ACTIONABLE tail. Compiler failures put
    the real diagnostic (OOM line, allocation table) at the END of a long
    dump; round 3's first-N capture truncated before it and the facebook
    failure was undiagnosable from artifacts."""
    msg = f"{type(e).__name__}: {e}"
    if len(msg) <= max_chars:
        return msg
    head = msg[:2000]
    tail = msg[-(max_chars - 2000):]
    return head + "\n...[middle truncated]...\n" + tail


def _print_error(prefix: str, e: Exception, lines: int = 15) -> None:
    body = f"{type(e).__name__}: {e}".splitlines()
    shown = body[:1] + (["  ..."] if len(body) > lines + 1 else []) + body[-lines:] if len(body) > 1 else body
    print(f"!! {prefix} failed:")
    for ln in shown:
        print(f"   {ln}")


def make_algorithm(name, data, feats, args, rng):
    from ..bo import BFS, DFS, GreedySearch, GRFThompson, RandomSearch
    from ..gp import iterative

    n = data["y_observed"].shape[0]
    if name == "random_search":
        return RandomSearch(n, rng)
    if name == "bfs":
        return BFS(data["adjacency"], n, rng)
    if name == "dfs":
        return DFS(data["adjacency"], n, rng)
    if name == "greedy_search":
        return GreedySearch(data["adjacency"], n, rng)
    if name == "grf_thompson":
        return GRFThompson(
            feats,
            n,
            rng,
            kind=args.kernel_kind,
            learning_rate=args.learning_rate,
            train_epochs=args.train_epochs,
            retrain_interval=args.gp_retrain_interval,
            settings=iterative.CGSettings(cg_tol=args.cg_tol, cg_max_iters=100),
            # full-run capacity → the CG/MLL graphs compile exactly once
            observation_capacity=args.initial_points
            + args.iterations * args.batch_size,
        )
    raise ValueError(f"unknown algorithm {name!r}")


# Flags forwarded verbatim to isolated per-cell child processes.
_CELL_FLAGS = [
    ("n_nodes", "--n-nodes"), ("iterations", "--iterations"),
    ("initial_points", "--initial-points"), ("batch_size", "--batch-size"),
    ("walks_per_node", "--walks-per-node"), ("p_halt", "--p-halt"),
    ("max_walk_length", "--max-walk-length"), ("kernel_kind", "--kernel-kind"),
    ("learning_rate", "--learning-rate"), ("train_epochs", "--train-epochs"),
    ("gp_retrain_interval", "--gp-retrain-interval"), ("cg_tol", "--cg-tol"),
    ("cache_dir", "--cache-dir"), ("seed", "--seed"),
]


def _run_isolated(args, targets, seeds):
    """One subprocess per (dataset, algorithm, seed) cell, with one retry:
    a TPU-runtime fault (worker crash) poisons the in-process PJRT client
    permanently, so containment + recovery require a process boundary."""
    import csv
    import os
    import subprocess
    import sys

    from ..utils.io import print_summary, save_results

    all_records = []
    for graph_type in targets:
        for algo_name in args.algorithms:
            for seed in seeds:
                cell = f"{graph_type}_{algo_name}_{seed}"
                cell_dir = os.path.join(args.results_dir, ".cells", cell)
                cmd = [
                    sys.executable, "-u", "-m", "graphgp_tpu.cli.bo",
                    "--graph-type", str(graph_type),
                    "--algorithms", algo_name,
                    "--bo-seeds", str(seed),
                    "--results-dir", cell_dir,
                ]
                for attr, flag in _CELL_FLAGS:
                    cmd += [flag, str(getattr(args, attr))]
                if args.gaussianize:
                    cmd.append("--gaussianize")
                if args.force_cpu:
                    cmd.append("--force-cpu")
                rows, err_text = None, ""
                for attempt in range(2):
                    tag = "" if attempt == 0 else " [retry]"
                    print(f"== cell {cell}{tag} ==", flush=True)
                    try:
                        proc = subprocess.run(
                            cmd, capture_output=True, text=True,
                            timeout=args.cell_timeout,
                        )
                        out = (proc.stdout or "") + (proc.stderr or "")
                    except subprocess.TimeoutExpired as te:
                        proc = None
                        out = (
                            f"cell timeout after {args.cell_timeout}s\n"
                            + ((te.stdout or "") if isinstance(te.stdout, str) else "")
                        )
                    csv_path = os.path.join(cell_dir, "bo.csv")
                    if proc is not None and proc.returncode == 0 and os.path.exists(csv_path):
                        with open(csv_path) as fh:
                            raw = list(csv.DictReader(fh))
                        rows = []
                        for r in raw:
                            rec = {}
                            for k, v in r.items():
                                if v is None or v == "":
                                    continue
                                try:
                                    rec[k] = float(v) if "." in v or "e" in v.lower() else int(v)
                                except ValueError:
                                    rec[k] = v
                            rows.append(rec)
                        # a child that recorded only error rows is a failure
                        if any("error" not in r for r in rows):
                            break
                        err_text = "\n".join(str(r.get("error", "")) for r in rows)
                        rows = None
                    else:
                        tail = "\n".join(out.splitlines()[-15:])
                        err_text = f"cell rc={getattr(proc, 'returncode', 'timeout')}\n{tail}"
                        print(f"!! cell {cell} failed (attempt {attempt + 1}):")
                        for ln in err_text.splitlines()[-8:]:
                            print(f"   {ln}")
                if rows is not None:
                    all_records.extend(rows)
                    final = [r for r in rows if r.get("iteration") == args.iterations]
                    if final:
                        print(
                            f"   final best={final[-1].get('best_value')} "
                            f"regret={final[-1].get('regret')}"
                        )
                else:
                    all_records.append(
                        {"graph_type": graph_type, "algorithm": algo_name,
                         "seed": seed, "error": err_text[-8000:]}
                    )

    path = save_results(all_records, args.results_dir, "bo", config=vars(args))
    final = [
        r for r in all_records
        if r.get("iteration") == args.iterations and "error" not in r
    ]
    if final:
        print_summary(final, ["graph_type", "algorithm"], ["best_value", "regret"])
    n_err = sum("error" in r for r in all_records)
    if n_err:
        print(f"{n_err} sweep cell(s) failed; error rows recorded")
    print(f"results -> {path}")
    return all_records


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    from ..utils.config import add_config_flag, parse_with_config

    add_config_flag(p)
    p.add_argument("--graph-type", default="grid",
                   help="synthetic generator name or dataset name")
    p.add_argument("--datasets", nargs="+", default=None,
                   help="sweep multiple graph types/datasets (overrides "
                        "--graph-type; YAML 'datasets' lands here)")
    p.add_argument("--n-nodes", type=int, default=1024)
    p.add_argument(
        "--algorithms", nargs="+",
        default=["random_search", "bfs", "dfs", "greedy_search", "grf_thompson"],
    )
    p.add_argument("--iterations", type=int, default=20)
    p.add_argument("--runs", type=int, default=3)
    p.add_argument("--bo-seeds", type=int, nargs="+", default=None,
                   help="explicit BO seeds (overrides --runs; the reference "
                        "uses 100+10i, run_bo.py:50)")
    p.add_argument("--isolate", action="store_true",
                   help="run each (dataset, algorithm, seed) cell in its own "
                        "subprocess: a TPU-runtime fault kills one cell, not "
                        "the sweep, and the next cell reconnects to the "
                        "recovered device (the in-process client stays dead "
                        "after a worker crash). Mirrors the reference's "
                        "per-seed subprocess isolation (ablation_study.py:"
                        "210-222), applied at the cell level.")
    p.add_argument("--cell-timeout", type=int, default=5400,
                   help="per-cell timeout in seconds under --isolate")
    p.add_argument("--initial-points", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--walks-per-node", type=int, default=1000)
    p.add_argument("--p-halt", type=float, default=0.1)
    p.add_argument("--max-walk-length", type=int, default=5)
    p.add_argument("--kernel-kind", default="free")
    p.add_argument("--learning-rate", type=float, default=0.1)
    p.add_argument("--train-epochs", type=int, default=30)
    p.add_argument("--gp-retrain-interval", type=int, default=10)
    p.add_argument("--cg-tol", type=float, default=1e-2)
    p.add_argument("--gaussianize", action="store_true")
    p.add_argument("--force-cpu", action="store_true",
                   help="run on the host CPU platform (fallback for "
                        "TPU-runtime instability; the container's "
                        "sitecustomize pins the TPU backend over "
                        "JAX_PLATFORMS)")
    p.add_argument("--results-dir", default="artifacts/results")
    p.add_argument("--cache-dir", default="artifacts/step_matrices")
    p.add_argument("--seed", type=int, default=42)
    args, _cfg = parse_with_config(p, argv)

    if args.force_cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from .. import WalkConfig
    from ..bo import run_optimization
    from ..data import synthetic
    from ..preprocessor import preprocess_graph
    from ..utils.io import print_summary, save_results

    def load_graph(graph_type):
        if graph_type in synthetic.GENERATORS:
            return synthetic.generate(graph_type, args.n_nodes, seed=args.seed)
        from ..data.database import GraphDataLoader

        loader = GraphDataLoader()
        if graph_type not in loader.registry:
            raise ValueError(
                f"unknown graph type {graph_type!r}; synthetic "
                f"generators: {sorted(synthetic.GENERATORS)}; datasets: "
                f"{loader.available()}"
            )
        return loader(graph_type)

    targets = args.datasets or [args.graph_type]
    all_records: List[Dict] = []
    seeds = args.bo_seeds or [100 + 10 * i for i in range(args.runs)]
    needs_gp = any(a == "grf_thompson" for a in args.algorithms)

    if args.isolate:
        return _run_isolated(args, targets, seeds)

    for graph_type in targets:
        # Sweep fault tolerance (reference run_graph_bo.py:171-175): one bad
        # dataset or cell records an error row and the sweep continues.
        try:
            data = load_graph(graph_type)
            objective = data["y_observed"].astype(np.float32)
            if args.gaussianize:
                objective = gaussianize(objective)
            feats = None
            if needs_gp:
                cfg = WalkConfig(
                    walks_per_node=args.walks_per_node,
                    p_halt=args.p_halt,
                    max_walk_length=args.max_walk_length,
                )
                # layout="auto": stencil on structured graphs (the 1e6-node
                # grid protocol rides roll-based matvecs), column-sorted
                # transpose on unstructured ones (no scatter rmatvec).
                feats = preprocess_graph(
                    data["adjacency"], cfg, seed=args.seed,
                    cache_dir=args.cache_dir, layout="auto",
                )
        except Exception as e:  # noqa: BLE001 — sweep must survive any cell
            _print_error(f"{graph_type}: data/preprocess", e)
            all_records.append(
                {"graph_type": graph_type, "error": _error_text(e)}
            )
            continue

        from ..features import set_stencil_pallas

        for algo_name in args.algorithms:
            for seed in seeds:
                # GP cells retry once with stencil Pallas forced off: a
                # planner/compiler miss inside the Pallas kernels degrades to
                # the XLA roll chain instead of killing the sweep cell.
                attempts = (
                    [None, False] if algo_name == "grf_thompson" else [None]
                )
                for att_i, pallas_mode in enumerate(attempts):
                    try:
                        set_stencil_pallas(pallas_mode)
                        rng = np.random.default_rng(seed)
                        algo = make_algorithm(algo_name, data, feats, args, rng)
                        tag = "" if pallas_mode is None else " [pallas off]"
                        print(f"== {graph_type} {algo_name} seed={seed}{tag} ==")
                        result = run_optimization(
                            algo,
                            objective,
                            n_iterations=args.iterations,
                            initial_points=args.initial_points,
                            batch_size=args.batch_size,
                            seed=seed,
                        )
                        for rec in result.records:
                            rec.update(
                                {"algorithm": algo_name, "seed": seed,
                                 "graph_type": graph_type,
                                 "n_nodes": objective.shape[0]}
                            )
                        all_records.extend(result.records)
                        print(
                            f"   final best={result.records[-1]['best_value']:.4f} "
                            f"regret={result.records[-1]['regret']:.4f}"
                        )
                        break
                    except Exception as e:  # noqa: BLE001
                        _print_error(
                            f"{graph_type}/{algo_name}/seed={seed}", e
                        )
                        if att_i + 1 < len(attempts):
                            print("   retrying with stencil Pallas disabled "
                                  "(XLA roll-chain fallback)")
                            continue
                        all_records.append(
                            {"graph_type": graph_type, "algorithm": algo_name,
                             "seed": seed, "error": _error_text(e)}
                        )
                    finally:
                        set_stencil_pallas(None)

    path = save_results(all_records, args.results_dir, "bo", config=vars(args))
    final = [
        r for r in all_records
        if r.get("iteration") == args.iterations and "error" not in r
    ]
    if final:
        print_summary(final, ["graph_type", "algorithm"], ["best_value", "regret"])
    n_err = sum("error" in r for r in all_records)
    if n_err:
        print(f"{n_err} sweep cell(s) failed; error rows recorded")
    print(f"results -> {path}")
    return all_records


if __name__ == "__main__":
    main()
