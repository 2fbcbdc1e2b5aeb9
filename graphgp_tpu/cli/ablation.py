"""Ablation study: principled GRF load update vs ad-hoc ``load = weight``.

Re-design of reference ``ablation_study.py`` (experiments/dense/ablation/
ablation_study.py:22-245): 30×30 mesh, field sampled from the exact diffusion
kernel (β=10, noise 0.5), GP regression with exact MLL fitting, sweep
walks_per_node × seeds × {principled, ablation}, NLPD/RMSE per cell → CSV.
(The reference runs each seed in a subprocess to contain TF memory leaks —
unnecessary under JAX, SURVEY §2.4 P4.)

Usage:
    python -m graphgp_tpu.cli.ablation --walks 10 100 --seeds 2
"""
from __future__ import annotations

import argparse
from typing import Dict, List

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    from ..utils.config import add_config_flag, parse_with_config

    add_config_flag(p)
    p.add_argument("--mesh-side", type=int, default=30)
    p.add_argument("--beta", type=float, default=10.0)
    p.add_argument("--amplitude", type=float, default=10.0,
                   help="true-kernel amplitude: K_true = amplitude * expm(-beta L) "
                        "(reference generate_dataset, ablation_study.py:102)")
    p.add_argument("--noise-std", type=float, default=0.5)
    p.add_argument("--walks", type=int, nargs="+", default=[1, 10, 100, 1000])
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument("--p-halt", type=float, default=0.01)
    p.add_argument("--max-walk-length", type=int, default=10)
    p.add_argument("--train-steps", type=int, default=1000)
    p.add_argument("--train-frac", type=float, default=0.3)
    p.add_argument("--results-dir", default="artifacts/results")
    args, _cfg = parse_with_config(p, argv)

    import jax
    import jax.numpy as jnp

    from .. import WalkConfig, diffusion_kernel, pack_laplacian
    from ..kernels import features_for_adjacency
    from ..data.synthetic import _grid_adjacency
    from ..features import DenseFeatures
    from ..gp import exact
    from ..graphs import pack_dense
    from ..utils.io import print_summary, save_results
    from ..walker import sample_dense_step_matrices

    n = args.mesh_side**2
    adj = _grid_adjacency(args.mesh_side).toarray()
    # Ground-truth field synthesis in float64 on host: at beta=10 the heat
    # kernel's spectrum spans ~e^-20, and f32 eigh noise makes K indefinite.
    deg = adj.sum(axis=1)
    dinv = np.where(deg > 0, 1.0 / np.sqrt(np.where(deg > 0, deg, 1.0)), 0.0)
    lap = np.eye(n) - adj * dinv[:, None] * dinv[None, :]
    evals, evecs = np.linalg.eigh(lap)
    # K_true = amplitude · exp(−βL) — the reference samples from
    # 10 * diffusion_kernel(A, 10) (ablation_study.py:102); without the ×10
    # the latent std (~0.12) sits far below the 0.5 observation noise and
    # the estimator comparison degenerates into noise fitting.
    k_true = args.amplitude * ((evecs * np.exp(-args.beta * evals)) @ evecs.T)
    records: List[Dict] = []

    for seed in [100 + i for i in range(args.seeds)]:
        rng = np.random.default_rng(seed)
        chol = np.linalg.cholesky(k_true + 1e-6 * np.eye(n))
        f_true = chol @ rng.normal(size=n)
        y_all = (f_true + args.noise_std * rng.normal(size=n)).astype(np.float32)
        perm = rng.permutation(n)
        n_tr = int(n * args.train_frac)
        tr = jnp.asarray(np.sort(perm[:n_tr]), jnp.int32)
        te = jnp.asarray(np.sort(perm[n_tr:]), jnp.int32)
        y = jnp.asarray(y_all)

        # Exact-diffusion GP floor: the quality both estimators approach as
        # wpn → ∞ (trainable β/σ_f over the eigenbasis, gp/spectral.py) —
        # context row the reference's figure carries as its horizontal line.
        from ..gp import spectral

        eig = spectral.eigenbasis(adj)
        sres = spectral.fit(eig, tr, y[tr], num_steps=args.train_steps)
        spost = spectral.predict(eig, sres.params, tr, y[tr], te)
        from ..gp import params as PP

        # Observation-space metrics against the NOISY test targets, matching
        # the reference's eval_model (ablation_study.py:124-140: predict_y
        # vs Y_noisy[test_idx]); latent-space RMSE kept as an extra column.
        svar = spost.var + PP.noise_variance(sres.params)
        records.append({
            "seed": seed, "walks_per_node": 0, "mode": "exact_diffusion",
            "rmse": float(jnp.sqrt(jnp.mean((spost.mean - y[te]) ** 2))),
            "rmse_latent": float(
                jnp.sqrt(jnp.mean((spost.mean - jnp.asarray(f_true)[te]) ** 2))
            ),
            "nlpd": float(jnp.mean(0.5 * (
                jnp.log(2 * jnp.pi * svar)
                + (y[te] - spost.mean) ** 2 / svar
            ))),
            "learned_noise_var": float(PP.noise_variance(sres.params)),
            "final_loss": float(sres.losses[-1]),
        })
        print(
            f"seed={seed} exact_diffusion: rmse={records[-1]['rmse']:.4f} "
            f"nlpd={records[-1]['nlpd']:.4f}"
        )

        for wpn in args.walks:
            for ablation in (False, True):
                cfg = WalkConfig(
                    walks_per_node=wpn,
                    p_halt=args.p_halt,
                    max_walk_length=args.max_walk_length,
                    ablation=ablation,
                )
                # auto Pallas dispatch (kernels.features_for_adjacency);
                # ablation=True walks the raw adjacency with ad-hoc loads
                feats = features_for_adjacency(
                    adj, jax.random.PRNGKey(42 + seed),
                    walks_per_node=wpn, p_halt=args.p_halt,
                    max_walk_length=args.max_walk_length, ablation=ablation,
                )
                # Kernel-space estimator quality, free of GP-fit effects:
                # relative Frobenius error of K̂ = ΦΦᵀ under the TRUE
                # diffusion modulator vs amplitude·expm(-βL) (reference
                # compute_fro, utils.py:32-38). The principled estimator is
                # unbiased for this target (error ↓ with wpn); the ad-hoc
                # load/adjacency walk estimates a different matrix family
                # entirely (error plateaus) — the paper's actual claim,
                # which regression RMSE can mask (a well-optimized ad-hoc
                # model is still a competitive smoother, and the reference's
                # published ad-hoc RMSE 0.5726 ≈ its predict-zero baseline
                # 0.5862 — a degenerate fit, not an estimator measurement).
                # Evaluated at β=1 (NOT the data β=10): the order-(L−1)
                # Taylor truncation of exp(−βλ/2) diverges on the Laplacian
                # spectrum for large β (partial sums ~2.7e3 at β=10, λ=2),
                # which would swamp the estimator error being measured; at
                # β=1 truncation error is ~1e-10 and the metric isolates
                # walk-estimator bias/variance.
                from ..modulators import diffusion_modulator

                beta_fro = 1.0
                f_mod = np.asarray(
                    diffusion_modulator(args.max_walk_length, beta_fro)
                )
                phi_hat = np.asarray(
                    feats.rows(jnp.asarray(f_mod, jnp.float32),
                               jnp.arange(n, dtype=jnp.int32))
                )
                k_hat = phi_hat @ phi_hat.T
                k_fro_target = (evecs * np.exp(-beta_fro * evals)) @ evecs.T
                fro_rel = float(
                    np.linalg.norm(k_hat - k_fro_target)
                    / np.linalg.norm(k_fro_target)
                )

                # Protocol parity (reference gp_inference, ablation_study.py:
                # 59-81): L-BFGS to convergence, noise variance initialized at
                # the true value with a weak LogNormal prior around it.
                from ..gp import params as P

                init = P.init_params(
                    "free", args.max_walk_length, jax.random.PRNGKey(seed),
                    noise=args.noise_std,
                )
                res = exact.fit(
                    feats, tr, y[tr], kind="free", init=init,
                    num_steps=args.train_steps, optimizer="lbfgs",
                    noise_prior_lognormal=(
                        float(np.log(args.noise_std**2)), 0.5
                    ),
                )
                post = exact.predict(feats, res.params, tr, y[tr], te, kind="free")
                rec = {
                    "seed": seed,
                    "walks_per_node": wpn,
                    "mode": "ablation" if ablation else "principled",
                    "rmse": float(exact.rmse(post, y[te])),
                    "rmse_latent": float(exact.rmse(post, jnp.asarray(f_true)[te])),
                    "nlpd": float(exact.nlpd(post, res.params, y[te])),
                    "learned_noise_var": float(P.noise_variance(res.params)),
                    "kernel_fro_rel": fro_rel,
                    "final_loss": float(res.losses[-1]),
                }
                records.append(rec)
                print(
                    f"seed={seed} wpn={wpn} {rec['mode']:>10}: "
                    f"rmse={rec['rmse']:.4f} nlpd={rec['nlpd']:.4f} "
                    f"kfro={rec['kernel_fro_rel']:.3f}"
                )

    path = save_results(records, args.results_dir, "ablation", config=vars(args))
    print_summary(records, ["mode", "walks_per_node"], ["rmse", "nlpd"])
    print(f"results -> {path}")
    return records


if __name__ == "__main__":
    main()
