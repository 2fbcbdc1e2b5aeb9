"""Multiclass node classification with SVGP on GRF kernels (Cora protocol).

Re-design of the reference Cora study (experiments/dense/cora/
classification_multiple_GRF.ipynb cell 7: SVGP, MultiClass likelihood,
inducing points = half the train node indices, whiten, Adam lr=0.003 ×1000,
5 seeds; GRF wpn=4096, L=5, p_halt=0.1; full 80/20 and "small" 140-train
splits; exact-diffusion kernel variant for comparison).

Runs on the real Cora files when present (--cora-dir with cora.cites /
cora.content) or on a synthetic community-structured graph otherwise.

Usage:
    python -m graphgp_tpu.cli.classification --n-nodes 400 --num-classes 4
"""
from __future__ import annotations

import argparse
from typing import Dict, List

import numpy as np


def synthetic_community_graph(n_nodes, num_classes, seed, p_in=0.05, p_out=0.002):
    """Stochastic block model with class labels = community ids."""
    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    labels = rng.integers(0, num_classes, size=n_nodes).astype(np.int32)
    rows, cols = [], []
    # sample block-wise to stay O(E)
    for c in range(num_classes):
        members = np.flatnonzero(labels == c)
        m = members.size
        n_in = rng.binomial(m * (m - 1) // 2, p_in)
        if n_in and m > 1:
            a = members[rng.integers(0, m, n_in)]
            b = members[rng.integers(0, m, n_in)]
            rows.extend(a.tolist())
            cols.extend(b.tolist())
    n_out = rng.binomial(n_nodes * (n_nodes - 1) // 2, p_out)
    a = rng.integers(0, n_nodes, n_out)
    b = rng.integers(0, n_nodes, n_out)
    rows.extend(a.tolist())
    cols.extend(b.tolist())
    rows, cols = np.asarray(rows), np.asarray(cols)
    keep = rows != cols
    adj = sp.csr_matrix(
        (np.ones(keep.sum()), (rows[keep], cols[keep])), shape=(n_nodes, n_nodes)
    )
    adj = adj + adj.T
    adj.data[:] = 1.0
    return adj.tocsr(), labels


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    from ..utils.config import add_config_flag, parse_with_config

    add_config_flag(p)
    p.add_argument("--cora-dir", default=None,
                   help="directory with cora.cites/cora.content (real protocol)")
    p.add_argument("--n-nodes", type=int, default=400)
    p.add_argument("--num-classes", type=int, default=4)
    p.add_argument("--train-frac", type=float, default=0.8)
    p.add_argument("--small-train", type=int, default=0,
                   help="if >0, use this many train nodes (the 140-train 'small' split)")
    p.add_argument("--num-test", type=int, default=0,
                   help="if >0, test on this many non-train nodes (the "
                        "reference small/diff protocols test on 1000)")
    p.add_argument("--num-inducing", type=int, default=0,
                   help="inducing point count (default: train/2; the "
                        "reference small/diff protocols use M=50)")
    p.add_argument("--walks-per-node", type=int, default=1024)
    p.add_argument("--p-halt", type=float, default=0.1)
    p.add_argument("--max-walk-length", type=int, default=5)
    p.add_argument("--kernel-kind", default="free",
                   choices=["free", "diffusion", "exact_diffusion"],
                   help="free/diffusion = GRF features; exact_diffusion = "
                        "the reference's exact sigma_f^2 expm(-beta L) SVGP "
                        "variant (classification_multiple_diff.ipynb) via "
                        "the spectral adapter")
    p.add_argument("--likelihood", default="robustmax",
                   choices=["robustmax", "softmax"],
                   help="robustmax = the reference's MultiClass/RobustMax "
                        "likelihood with analytic GH-quadrature expected "
                        "log-lik (classification notebooks cell 7/8); "
                        "softmax = MC softmax ELBO")
    p.add_argument("--learning-rate", type=float, default=3e-3)
    p.add_argument("--num-steps", type=int, default=1000)
    p.add_argument("--seeds", type=int, default=5)
    p.add_argument("--resplit-per-seed", action="store_true",
                   help="draw a fresh train/test split per seed (default: "
                        "one fixed split shared by all seeds, the reference "
                        "protocol — np.random.seed(1) before the split, "
                        "cell 4 of every classification notebook)")
    p.add_argument("--force-cpu", action="store_true",
                   help="pin the JAX platform to CPU (must be set before "
                        "backend init; the axon sitecustomize overrides the "
                        "JAX_PLATFORMS env var)")
    p.add_argument("--results-dir", default="artifacts/results")
    args, _cfg = parse_with_config(p, argv)

    import jax

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from .. import WalkConfig, pack_laplacian
    from ..kernels import features_for_adjacency
    from ..features import DenseFeatures
    from ..gp import svgp
    from ..utils.io import print_summary, save_results
    from ..walker import sample_dense_step_matrices

    records: List[Dict] = []
    for seed in range(args.seeds):
        split_seed = seed if args.resplit_per_seed else 1
        if args.cora_dir:
            from ..data.database import load_cora

            # Split sizes go to the loader so the train subset is a RANDOM
            # num_train of the permutation (reference load_cora,
            # cora_utils/preprocessing.py:63-65). Truncating the loader's
            # SORTED default-split array instead would take the 140
            # lowest node ids — which in cora.cites order are 86% one class
            # (121/140 class 1) and collapse the small-split protocol.
            adj, labels, tr_np, te_np = load_cora(
                args.cora_dir,
                num_train=args.small_train or 1988,
                num_test=args.num_test or 497,
                seed=split_seed,
            )
            n = adj.shape[0]
            num_classes = int(labels.max()) + 1
        else:
            adj, labels = synthetic_community_graph(
                args.n_nodes, args.num_classes, seed
            )
            n = args.n_nodes
            num_classes = args.num_classes
            rng = np.random.default_rng(seed)
            perm = rng.permutation(n)
            n_tr = args.small_train or int(n * args.train_frac)
            tr_np = np.sort(perm[:n_tr])
            te_np = np.sort(perm[n_tr:])

        if args.num_test and not args.cora_dir:
            # synthetic path only — the cora loader already returns the
            # requested num_test random non-train nodes
            pool = np.setdiff1d(np.arange(n), tr_np)
            rng_te = np.random.default_rng(1000 + split_seed)
            te_np = np.sort(
                rng_te.choice(pool, min(args.num_test, pool.size), replace=False)
            )
        tr = jnp.asarray(tr_np, jnp.int32)
        te = jnp.asarray(te_np, jnp.int32)
        y = jnp.asarray(labels, jnp.int32)
        # Inducing points: a per-seed random subset of the TRAIN nodes, the
        # reference's Z = x_train[np.random.choice(train_num, M)] under
        # np.random.seed(seed) (cell 5+7) — M = train/2 on the full split,
        # M=50 on the small split (--num-inducing). The inducing draw is the
        # main seed-to-seed variation in the reference protocol (kernel walk
        # seed and modulator init are both fixed at 42).
        m_ind = args.num_inducing or max(1, tr_np.size // 2)
        rng_ind = np.random.default_rng(seed)
        inducing = jnp.asarray(
            np.sort(rng_ind.choice(tr_np, min(m_ind, tr_np.size), replace=False)),
            jnp.int32,
        )

        if args.kernel_kind == "exact_diffusion":
            # exact-kernel arm: one eigh per seed-independent graph; rebuilt
            # per seed only when the graph changes (Cora graph is fixed, but
            # the synthetic fallback resamples per seed)
            from ..gp import spectral

            feats = spectral.SpectralDiffusionFeatures(spectral.eigenbasis(adj))
        else:
            # auto Pallas dispatch in the dense regime; blocked pipeline above
            # the HBM guardrail (kernels.features_for_adjacency)
            feats = features_for_adjacency(
                adj, jax.random.PRNGKey(42 + seed),
                walks_per_node=args.walks_per_node, p_halt=args.p_halt,
                max_walk_length=args.max_walk_length,
            )

        # Two-restart fit (init keys 42 and 1000+seed), keep the better
        # final ELBO: free-modulator inits occasionally land in a bad basin
        # (measured 0.31 accuracy on one seed with a single random init;
        # a single FIXED key is no safer — key 42 collapses every seed).
        res = None
        for init_key in (42, 1000 + seed):
            r = svgp.fit(
                feats, inducing, tr, y[tr],
                num_latent=num_classes, kind=args.kernel_kind,
                likelihood=args.likelihood,
                key=jax.random.PRNGKey(init_key),
                learning_rate=args.learning_rate, num_steps=args.num_steps,
            )
            if res is None or float(r.losses[-1]) < float(res.losses[-1]):
                res = r
        probs = svgp.predict_class_probs(
            feats, res.params, inducing, te, jax.random.PRNGKey(seed),
            kind=args.kernel_kind, likelihood=args.likelihood,
        )
        # deterministic predictions (reference predict_y argmax;
        # see svgp.predict_class)
        pred = svgp.predict_class(
            feats, res.params, inducing, te, kind=args.kernel_kind,
            likelihood=args.likelihood,
        )
        acc = float(jnp.mean((pred == y[te]).astype(jnp.float32)))
        true_probs = np.asarray(probs)[np.arange(te.shape[0]), np.asarray(y[te])]
        nll = float(-np.log(np.maximum(true_probs, 1e-12)).mean())
        rec = {
            "seed": seed, "accuracy": acc, "test_nll": nll,
            "final_elbo": -float(res.losses[-1]),
            "n_train": int(tr.shape[0]), "n_test": int(te.shape[0]),
            "kernel": args.kernel_kind, "likelihood": args.likelihood,
            "num_inducing": int(inducing.shape[0]),
        }
        records.append(rec)
        print(
            f"seed={seed}: accuracy={acc:.4f} nll={nll:.4f} "
            f"elbo={rec['final_elbo']:.1f}"
        )

    path = save_results(records, args.results_dir, "classification", config=vars(args))
    print_summary(records, ["kernel"], ["accuracy", "test_nll"])
    print(f"results -> {path}")
    return records


if __name__ == "__main__":
    main()
