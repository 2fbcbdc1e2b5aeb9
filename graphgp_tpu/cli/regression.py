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
    from ..utils.config import add_config_flag, parse_with_config

    add_config_flag(p)
    p.add_argument("--graph-type", default="grid")
    p.add_argument(
        "--pems-npz", default=None,
        help="pre-built PEMS traffic graph npz (CSR triplets A_* + X, y — "
             "the reference's San Jose sensor graph, built offline from "
             "OSMnx per traffic_utils/preprocessing.py:71-182); overrides "
             "--graph-type",
    )
    p.add_argument("--n-nodes", type=int, default=900)
    p.add_argument("--num-train", type=int, default=250)
    p.add_argument("--walks", type=int, nargs="+", default=[1, 4, 16, 64, 256, 1024])
    p.add_argument("--p-halt", type=float, default=0.1)
    p.add_argument("--max-walk-length", type=int, default=10)
    p.add_argument("--train-steps", type=int, default=200)
    p.add_argument("--obs-noise", type=float, default=0.1,
                   help="observation-noise std added to the NORMALIZED "
                        "synthetic field (per seed). The reference's PEMS "
                        "speeds carry real sensor noise; a noiseless "
                        "synthetic field makes every fit near-interpolating "
                        "and amplifies MC kernel error, hiding the "
                        "GRF-to-exact-floor convergence the protocol "
                        "demonstrates (traffic nb cells 20-22). 0 disables.")
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument("--gp-field", type=float, default=None, metavar="BETA",
                   help="replace the dataset targets with a GP sample from "
                        "amplitude·exp(−BETA·L) on the loaded graph (seeded "
                        "once, shared across seeds). Matches the protocol "
                        "conditions of the reference's PEMS study, whose "
                        "speed field is diffusion-smooth on a sparse road "
                        "graph — the regime where the GRF estimator's "
                        "per-step importance factors stay near 1 and the "
                        "convergence plot is clean (traffic nb cells 20-22)")
    p.add_argument("--gnn-baseline", action="store_true",
                   help="also train the GCN regression baseline")
    p.add_argument("--force-cpu", action="store_true",
                   help="pin the JAX platform to CPU (see cli/bo.py)")
    p.add_argument("--results-dir", default="artifacts/results")
    args, _cfg = parse_with_config(p, argv)

    import jax

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from .. import WalkConfig, pack_laplacian
    from ..kernels import features_for_adjacency
    from ..data import synthetic
    from ..features import DenseFeatures
    from ..gp import exact
    from ..gp import params as P
    from ..utils.io import print_summary, save_results
    from ..walker import sample_dense_step_matrices

    if args.pems_npz:
        from ..data.database import _load_csr_npz

        adj_pems, node_ids, y_pems = _load_csr_npz(args.pems_npz)
        data = {"adjacency": adj_pems, "node_ids": node_ids,
                "y_observed": np.asarray(y_pems, np.float32)}
        print(f"PEMS graph: {adj_pems.shape[0]} sensors from {args.pems_npz}")
    elif args.graph_type in synthetic.GENERATORS:
        data = synthetic.generate(args.graph_type, args.n_nodes, seed=0)
    else:
        from ..data.database import GraphDataLoader

        data = GraphDataLoader()(args.graph_type)

    n = data["y_observed"].shape[0]
    if args.gp_field is not None:
        adj_d = np.asarray(
            data["adjacency"].toarray()
            if hasattr(data["adjacency"], "toarray")
            else data["adjacency"],
            np.float64,
        )
        deg = adj_d.sum(axis=1)
        dinv = np.where(deg > 0, 1.0 / np.sqrt(np.where(deg > 0, deg, 1.0)), 0.0)
        lap_d = np.eye(n) - adj_d * dinv[:, None] * dinv[None, :]
        ev, evec = np.linalg.eigh(lap_d)
        k_field = (evec * np.exp(-args.gp_field * ev)) @ evec.T
        rng_f = np.random.default_rng(7)
        data = dict(data)
        data["y_observed"] = (
            np.linalg.cholesky(k_field + 1e-8 * np.eye(n))
            @ rng_f.normal(size=n)
        ).astype(np.float32)
    y_all = jnp.asarray(
        (data["y_observed"] - data["y_observed"].mean())
        / (data["y_observed"].std() + 1e-12),
        jnp.float32,
    )  # normalized targets (reference traffic nb normalizes, cell 3)

    records: List[Dict] = []
    adj = data["adjacency"]

    # --- exact-diffusion baseline: trainable β/σ_f over the eigenbasis
    # (reference GraphDiffusionKernel, gpflow_kernels/diffusion_kernel_exact.py)
    from ..gp import spectral

    eig = spectral.eigenbasis(adj)
    # --- PoFM deterministic baseline features (exact L^l powers)
    from ..kernels import pofm_features

    pofm = DenseFeatures(pofm_features(adj, max_expansion=args.max_walk_length))

    # Traffic protocol: observations live only at sensor nodes (the spliced
    # degree-2 nodes); intersections/road nodes are latent (reference
    # load_PEMS trains on 250 of 325 sensors). Synthetic grids observe all.
    candidates = np.asarray(data.get("sensor_nodes", np.arange(n)), np.int64)

    for seed in range(args.seeds):
        rng = np.random.default_rng(seed)
        perm = candidates[rng.permutation(candidates.size)]
        tr = jnp.asarray(np.sort(perm[: args.num_train]), jnp.int32)
        te = jnp.asarray(np.sort(perm[args.num_train :]), jnp.int32)
        yv = y_all
        if args.obs_noise > 0 and "sensor_nodes" not in data:
            yv = y_all + args.obs_noise * jnp.asarray(
                rng.normal(size=n), jnp.float32
            )

        sres = spectral.fit(eig, tr, yv[tr], num_steps=args.train_steps)
        spost = spectral.predict(eig, sres.params, tr, yv[tr], te)
        from ..gp import params as P

        var = spost.var + P.noise_variance(sres.params)
        rec = {
            "seed": seed, "kernel": "exact_diffusion", "walks_per_node": 0,
            "lml": -float(sres.losses[-1]),
            "rmse": float(jnp.sqrt(jnp.mean((spost.mean - yv[te]) ** 2))),
            "nlpd": float(jnp.mean(0.5 * (
                jnp.log(2 * jnp.pi * var) + (yv[te] - spost.mean) ** 2 / var
            ))),
            "beta": float(jax.nn.softplus(sres.params["raw_beta"])),
        }
        records.append(rec)
        print(
            f"seed={seed} exact_diffusion: lml={rec['lml']:.1f} "
            f"rmse={rec['rmse']:.4f} nlpd={rec['nlpd']:.4f} (beta={rec['beta']:.2f})"
        )

        def fit_restarts(feats_, kind):
            """L-BFGS (reference dense stack's Scipy optimizer, traffic nb
            cell 4; SURVEY §3.5) with kind-aware restarts, keeping the best
            final loss. 'free' restarts redraw the random modulator init
            from different keys; 'diffusion' restarts sweep the β init
            instead — the key doesn't enter the (β, σ_f) init at all, so
            key-based restarts were a no-op there, and a single β₀=1 start
            collapses to the noise-only basin on some splits (observed:
            pofm_diffusion lml=-5068, σ_f≈0, which poisoned every
            transplant-arm row downstream with constant prior-mean
            predictions)."""
            if kind == "diffusion":
                kwargs = [
                    {"init": P.init_params(
                        kind, feats_.max_walk_length,
                        jax.random.PRNGKey(0), beta=b0,
                    )}
                    for b0 in (1.0, 4.0)
                ]
            else:
                kwargs = [
                    {"key": jax.random.PRNGKey(k)}
                    for k in (seed, 1000 + seed)
                ]
            best = None
            for kw in kwargs:
                r = exact.fit(
                    feats_, tr, yv[tr], kind=kind,
                    num_steps=args.train_steps, optimizer="lbfgs", **kw
                )
                if best is None or float(r.losses[-1]) < float(
                    best.losses[-1]
                ):
                    best = r
            return best

        # PoFM arms: same GP stack over exact power features
        pofm_params = {}
        for kind in ("diffusion", "free"):
            pres = fit_restarts(pofm, kind)
            pofm_params[kind] = pres.params
            ppost = exact.predict(pofm, pres.params, tr, yv[tr], te, kind=kind)
            rec = {
                "seed": seed, "kernel": f"pofm_{kind}", "walks_per_node": 0,
                "lml": -float(pres.losses[-1]),
                "rmse": float(exact.rmse(ppost, yv[te])),
                "nlpd": float(exact.nlpd(ppost, pres.params, yv[te])),
            }
            records.append(rec)
            print(
                f"seed={seed} pofm_{kind}: lml={rec['lml']:.1f} "
                f"rmse={rec['rmse']:.4f} nlpd={rec['nlpd']:.4f}"
            )

        # GNN baseline (reference traffic_regression_GNN.ipynb)
        if args.gnn_baseline:
            from ..baselines import fit_gcn

            gres = fit_gcn(
                adj, tr, yv[tr], num_steps=args.train_steps * 2,
                key=jax.random.PRNGKey(seed),
            )
            g_rmse = float(
                jnp.sqrt(jnp.mean((gres.predictions[te] - yv[te]) ** 2))
            )
            records.append(
                {"seed": seed, "kernel": "gcn", "walks_per_node": 0,
                 "lml": float("nan"), "rmse": g_rmse, "nlpd": float("nan")}
            )
            print(f"seed={seed} gcn: rmse={g_rmse:.4f}")

        # --- GRF sweeps ---
        # features_for_adjacency: auto-dispatches to the fused Pallas walker
        # on TPU in this dense regime, and guards large graphs by switching
        # to the blocked pipeline (kernels.features_for_adjacency).
        for wpn in args.walks:
            feats = features_for_adjacency(
                adj, jax.random.PRNGKey(42 + seed),
                walks_per_node=wpn, p_halt=args.p_halt,
                max_walk_length=args.max_walk_length,
            )
            # Transplant arm — the reference's actual diffusion-GRF sweep
            # protocol (traffic nb cell 20): NO per-wpn refit; the
            # PoFM-diffusion fit's (β, σ_f, noise) are transplanted and the
            # GRF kernel is evaluated as-is. As wpn → ∞ the GRF kernel
            # equals the PoFM kernel exactly (K̂ = Φ̂Φ̂ᵀ → K_f K_fᵀ), so
            # this arm's RMSE converges to the pofm_diffusion floor by
            # construction — the convergence claim, isolated from fit
            # stability (per-wpn refits at large learned β amplify
            # high-order Taylor-coefficient MC noise; see README).
            tpost = exact.predict(
                feats, pofm_params["diffusion"], tr, yv[tr], te,
                kind="diffusion",
            )
            rec = {
                "seed": seed,
                "kernel": "grf_diffusion_transplant",
                "walks_per_node": wpn,
                "lml": float("nan"),
                "rmse": float(exact.rmse(tpost, yv[te])),
                "nlpd": float(
                    exact.nlpd(tpost, pofm_params["diffusion"], yv[te])
                ),
            }
            records.append(rec)
            print(
                f"seed={seed} grf_diffusion_transplant wpn={wpn}: "
                f"rmse={rec['rmse']:.4f} nlpd={rec['nlpd']:.4f}"
            )
            for kind in ("diffusion", "free"):
                # restart policy: see fit_restarts (a single L-BFGS run
                # occasionally lands in a degenerate basin — observed one
                # wpn=256 seed with NLPD ~1.7e5)
                res = fit_restarts(feats, kind)
                post = exact.predict(
                    feats, res.params, tr, yv[tr], te, kind=kind
                )
                rec = {
                    "seed": seed,
                    "kernel": f"grf_{kind}",
                    "walks_per_node": wpn,
                    "lml": -float(res.losses[-1]),
                    "rmse": float(exact.rmse(post, yv[te])),
                    "nlpd": float(exact.nlpd(post, res.params, yv[te])),
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
