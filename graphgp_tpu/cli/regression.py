"""GRF→exact-kernel convergence regression benchmark (traffic protocol).

Re-design of the reference PEMS traffic study (experiments/dense/
traffic_dataset/traffic_regression.ipynb cells 3-22): fit an exact-diffusion
GP as ground truth, then sweep GRF kernels (diffusion + free modulator) over
walks_per_node, reporting LML/RMSE/NLPD convergence toward the exact
baseline.

Works on any registered dataset or synthetic generator; the reference's San
Jose PEMS graph requires OSMnx downloads unavailable here — supply the graph
via --dataset when present, or use the default synthetic grid.

Usage:
    python -m graphgp_tpu.cli.regression --graph-type grid --n-nodes 900 \
        --walks 10 100 1000
"""
from __future__ import annotations

import argparse
from typing import Dict, List

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--graph-type", default="grid")
    p.add_argument("--n-nodes", type=int, default=900)
    p.add_argument("--num-train", type=int, default=250)
    p.add_argument("--walks", type=int, nargs="+", default=[1, 4, 16, 64, 256, 1024])
    p.add_argument("--p-halt", type=float, default=0.1)
    p.add_argument("--max-walk-length", type=int, default=10)
    p.add_argument("--train-steps", type=int, default=200)
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument("--results-dir", default="artifacts/results")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from .. import WalkConfig, pack_laplacian
    from ..data import synthetic
    from ..features import DenseFeatures
    from ..gp import exact
    from ..gp import params as P
    from ..utils.io import print_summary, save_results
    from ..walker import sample_dense_step_matrices

    if args.graph_type in synthetic.GENERATORS:
        data = synthetic.generate(args.graph_type, args.n_nodes, seed=0)
    else:
        from ..data.database import GraphDataLoader

        data = GraphDataLoader()(args.graph_type)

    n = data["y_observed"].shape[0]
    y_all = jnp.asarray(
        (data["y_observed"] - data["y_observed"].mean())
        / (data["y_observed"].std() + 1e-12),
        jnp.float32,
    )  # normalized targets (reference traffic nb normalizes, cell 3)

    records: List[Dict] = []
    adj = data["adjacency"]

    # --- exact-diffusion baseline (dense eigh kernel, trainable β/σ_f) ---
    # Build "step matrices" for the exact kernel via PoFM? No: use the exact
    # expm GP by expressing it through DenseFeatures of exact Laplacian
    # powers — i.e. PoFM with enough terms is exact up to truncation; instead
    # we use the closed-form eigendecomposition for the baseline.
    import scipy.sparse as sp

    adj_dense = adj.toarray() if sp.issparse(adj) else np.asarray(adj)
    deg = adj_dense.sum(axis=1)
    dinv = np.where(deg > 0, 1.0 / np.sqrt(np.where(deg > 0, deg, 1.0)), 0.0)
    lap = np.eye(n) - adj_dense * dinv[:, None] * dinv[None, :]
    evals, evecs = np.linalg.eigh(lap)

    for seed in range(args.seeds):
        rng = np.random.default_rng(seed)
        perm = rng.permutation(n)
        tr = jnp.asarray(np.sort(perm[: args.num_train]), jnp.int32)
        te = jnp.asarray(np.sort(perm[args.num_train :]), jnp.int32)

        # exact baseline: grid-search β, σ², σ_f over the eigenbasis MLL
        ev = jnp.asarray(evals, jnp.float32)
        q = jnp.asarray(evecs, jnp.float32)

        def exact_gp_metrics(beta, noise_var):
            k = (q * jnp.exp(-beta * ev)[None, :]) @ q.T
            k_tt = k[tr][:, tr] + noise_var * jnp.eye(tr.shape[0])
            chol = jnp.linalg.cholesky(k_tt + 1e-6 * jnp.eye(tr.shape[0]))
            alpha = jax.scipy.linalg.cho_solve((chol, True), y_all[tr])
            mean = k[te][:, tr] @ alpha
            v = jax.scipy.linalg.solve_triangular(chol, k[tr][:, te], lower=True)
            var = jnp.maximum(jnp.diag(k)[te] - jnp.sum(v * v, 0), 1e-10) + noise_var
            lml = -0.5 * (
                y_all[tr] @ alpha
                + 2 * jnp.sum(jnp.log(jnp.diagonal(chol)))
                + tr.shape[0] * jnp.log(2 * jnp.pi)
            )
            rmse = jnp.sqrt(jnp.mean((mean - y_all[te]) ** 2))
            nlpd = jnp.mean(
                0.5 * (jnp.log(2 * jnp.pi * var) + (y_all[te] - mean) ** 2 / var)
            )
            return lml, rmse, nlpd

        best = None
        for beta in [0.25, 0.5, 1.0, 2.0, 4.0]:
            for nv in [0.01, 0.05, 0.1, 0.3]:
                lml, rmse, nlpd = exact_gp_metrics(beta, nv)
                if best is None or float(lml) > best[0]:
                    best = (float(lml), float(rmse), float(nlpd), beta, nv)
        records.append(
            {
                "seed": seed, "kernel": "exact_diffusion", "walks_per_node": 0,
                "lml": best[0], "rmse": best[1], "nlpd": best[2],
                "beta": best[3],
            }
        )
        print(
            f"seed={seed} exact_diffusion: lml={best[0]:.1f} rmse={best[1]:.4f} "
            f"nlpd={best[2]:.4f} (beta={best[3]})"
        )

        # --- GRF sweeps ---
        graph = pack_laplacian(adj)
        for wpn in args.walks:
            cfg = WalkConfig(
                walks_per_node=wpn, p_halt=args.p_halt,
                max_walk_length=args.max_walk_length,
            )
            mats = sample_dense_step_matrices(
                graph, jax.random.PRNGKey(42 + seed), cfg
            )
            feats = DenseFeatures(mats)
            for kind in ("diffusion", "free"):
                res = exact.fit(
                    feats, tr, y_all[tr], kind=kind,
                    key=jax.random.PRNGKey(seed),
                    num_steps=args.train_steps, learning_rate=0.05,
                )
                post = exact.predict(
                    feats, res.params, tr, y_all[tr], te, kind=kind
                )
                rec = {
                    "seed": seed,
                    "kernel": f"grf_{kind}",
                    "walks_per_node": wpn,
                    "lml": -float(res.losses[-1]),
                    "rmse": float(exact.rmse(post, y_all[te])),
                    "nlpd": float(exact.nlpd(post, res.params, y_all[te])),
                }
                records.append(rec)
                print(
                    f"seed={seed} grf_{kind} wpn={wpn}: lml={rec['lml']:.1f} "
                    f"rmse={rec['rmse']:.4f} nlpd={rec['nlpd']:.4f}"
                )

    path = save_results(records, args.results_dir, "regression", config=vars(args))
    print_summary(records, ["kernel", "walks_per_node"], ["rmse", "nlpd"])
    print(f"results -> {path}")
    return records


if __name__ == "__main__":
    main()
