"""HMC over GRF-GP hyperparameter posteriors — new capability (no MCMC
exists in the reference; SURVEY §0 end note).

Samples the posterior over kernel hyperparameters (β, σ_f, noise for the
diffusion kernel, or the full modulator vector for the free kernel) with
vmapped HMC chains and dual-averaging warmup, then reports posterior
summaries and posterior-predictive metrics vs the ML-II point estimate.

Usage:
    python -m graphgp_tpu.cli.hmc --graph-type grid --n-nodes 400 --kind diffusion
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
    p.add_argument("--n-nodes", type=int, default=400)
    p.add_argument("--kind", default="diffusion", choices=["diffusion", "free"])
    p.add_argument("--walks-per-node", type=int, default=500)
    p.add_argument("--p-halt", type=float, default=0.1)
    p.add_argument("--max-walk-length", type=int, default=5)
    p.add_argument("--num-chains", type=int, default=4)
    p.add_argument(
        "--mesh-devices", type=int, default=0,
        help="shard chains over this many devices (0 = all available if >1)",
    )
    p.add_argument("--num-warmup", type=int, default=200)
    p.add_argument("--num-samples", type=int, default=300)
    p.add_argument("--num-leapfrog", type=int, default=48)
    p.add_argument("--initial-step-size", type=float, default=0.1)
    p.add_argument("--prior-std", type=float, default=2.0)
    p.add_argument("--train-frac", type=float, default=0.5)
    p.add_argument("--results-dir", default="artifacts/results")
    args, _cfg = parse_with_config(p, argv)

    import jax

    # HMC needs a low-noise energy: TPU matmuls default to bf16-accumulated
    # MXU passes, and the resulting O(0.1+) nat jitter in the Cholesky MLL
    # rejects ~20% of trajectories at ANY step size — dual averaging then
    # collapses ε (measured 2e-4..0.04 on chip vs 0.7 on CPU with identical
    # code). Full f32 matmuls make ΔH noise ≪ 1 nat; the dense HMC problem
    # is small so the MXU throughput loss is irrelevant.
    jax.config.update("jax_default_matmul_precision", "highest")

    import jax.numpy as jnp

    from .. import WalkConfig, pack_laplacian
    from ..kernels import features_for_adjacency
    from ..data import synthetic
    from ..features import DenseFeatures
    from ..gp import exact, hmc
    from ..gp import params as P
    from ..utils.io import save_results
    from ..walker import sample_dense_step_matrices

    data = synthetic.generate(args.graph_type, args.n_nodes, seed=0)
    n = data["y_observed"].shape[0]
    rng = np.random.default_rng(0)
    perm = rng.permutation(n)
    n_tr = int(n * args.train_frac)
    tr = jnp.asarray(np.sort(perm[:n_tr]), jnp.int32)
    te = jnp.asarray(np.sort(perm[n_tr:]), jnp.int32)
    y = jnp.asarray(data["y_observed"], jnp.float32)

    # auto Pallas dispatch in the dense regime (kernels.features_for_adjacency)
    feats = features_for_adjacency(
        data["adjacency"], jax.random.PRNGKey(42),
        walks_per_node=args.walks_per_node, p_halt=args.p_halt,
        max_walk_length=args.max_walk_length,
    )

    # ML-II point estimate as the chain init + comparison
    fit = exact.fit(feats, tr, y[tr], kind=args.kind, num_steps=200)
    point_post = exact.predict(feats, fit.params, tr, y[tr], te, kind=args.kind)
    point_rmse = float(exact.rmse(point_post, y[te]))
    point_nlpd = float(exact.nlpd(point_post, fit.params, y[te]))
    print(f"ML-II point estimate: rmse={point_rmse:.4f} nlpd={point_nlpd:.4f}")

    # Weak noise anchor at the ML-II value (reference-style prior on the
    # likelihood variance): removes the raw_noise → −∞ likelihood plateau
    # that freezes chains (see hmc.make_gp_log_posterior). std 0.5 in raw
    # space is far weaker than the likelihood's own pinning of the noise.
    anchors = {"raw_noise": (float(fit.params["raw_noise"]), 0.5)}
    log_post = hmc.make_gp_log_posterior(
        lambda q: exact.mll(feats, q, tr, y[tr], kind=args.kind),
        prior_std=args.prior_std,
        anchors=anchors,
    )

    # Polish the mode of the ACTUAL log posterior with L-BFGS before Laplace
    # whitening (gp/hmc.refine_mode — the round-3 run skipped this and the
    # stale-mode Hessian collapsed ε to 2e-4, leaving R̂(raw_noise)=50).
    mode_params, refine_losses = hmc.refine_mode(log_post, fit.params)
    print(
        f"mode refine (L-BFGS on log posterior): -logp "
        f"{float(refine_losses[0]):.4f} -> {float(refine_losses[-1]):.4f}"
    )
    mesh = None
    n_dev = len(jax.devices())
    mesh_devices = args.mesh_devices or (n_dev if n_dev > 1 else 0)
    if mesh_devices > 1:
        from ..shard import make_mesh

        mesh = make_mesh(mesh_devices, axis_name="chains")
        print(f"sharding {args.num_chains} chains over {mesh_devices} devices")

    # Laplace-whitened HMC around the ML-II mode: one step size serves every
    # direction of the (anisotropic) raw-coordinate posterior (gp/hmc.py
    # sample_laplace — raw HMC measured split-R-hat ≈ 23 on raw_noise here).
    res = hmc.sample_laplace(
        log_post, mode_params, jax.random.PRNGKey(0),
        config=hmc.HMCConfig(
            num_warmup=args.num_warmup, num_samples=args.num_samples,
            num_leapfrog=args.num_leapfrog,
            initial_step_size=args.initial_step_size,
        ),
        num_chains=args.num_chains,
        mesh=mesh,
    )
    acc = np.asarray(res.accept_rate)
    print(f"accept rates: {acc.round(3)}  adapted step sizes: "
          f"{np.asarray(res.step_size).round(4)}")

    # convergence diagnostics: split-chain R-hat on the log prob AND on every
    # parameter element (the per-parameter view catches mixing failures the
    # scalar log-prob summary can hide)
    rhat = float(hmc.split_rhat(res.log_probs))
    print(f"split-chain R-hat (log prob): {rhat:.3f}")
    rhat_tree = hmc.split_rhat_tree(res.samples)
    param_rhats = {
        name: float(np.max(np.asarray(r)))
        for name, r in rhat_tree.items()
    }
    for name, r in sorted(param_rhats.items()):
        print(f"split-chain R-hat ({name}): {r:.3f}")

    records: List[Dict] = [
        {"quantity": "point_rmse", "value": point_rmse},
        {"quantity": "point_nlpd", "value": point_nlpd},
        {"quantity": "rhat_logprob", "value": rhat},
    ]
    records += [
        {"quantity": f"rhat_{name}", "value": r} for name, r in param_rhats.items()
    ]
    for c in range(args.num_chains):
        records.append({"quantity": f"accept_chain{c}", "value": float(acc[c])})

    # posterior-averaged prediction over thinned samples
    thin = max(1, args.num_samples // 32)
    sampled = jax.tree_util.tree_map(lambda x: x[:, ::thin], res.samples)
    n_kept = jax.tree_util.tree_leaves(sampled)[0].shape[1]

    def predict_one(params_one):
        post = exact.predict(feats, params_one, tr, y[tr], te, kind=args.kind)
        return post.mean, post.var + P.noise_variance(params_one)

    means, variances = [], []
    for c in range(args.num_chains):
        one_chain = jax.tree_util.tree_map(lambda x: x[c], sampled)
        m, v = jax.vmap(predict_one)(one_chain)
        means.append(np.asarray(m))
        variances.append(np.asarray(v))
    means = np.concatenate(means)  # (S, n_te)
    variances = np.concatenate(variances)
    mix_mean = means.mean(0)
    mix_var = variances.mean(0) + means.var(0)
    y_te = np.asarray(y[te])
    bayes_rmse = float(np.sqrt(np.mean((mix_mean - y_te) ** 2)))
    bayes_nlpd = float(
        np.mean(0.5 * (np.log(2 * np.pi * mix_var) + (y_te - mix_mean) ** 2 / mix_var))
    )
    print(
        f"posterior-averaged ({n_kept * args.num_chains} samples): "
        f"rmse={bayes_rmse:.4f} nlpd={bayes_nlpd:.4f}"
    )
    records += [
        {"quantity": "bayes_rmse", "value": bayes_rmse},
        {"quantity": "bayes_nlpd", "value": bayes_nlpd},
    ]

    if args.kind == "diffusion":
        import jax.nn

        betas = np.asarray(jax.nn.softplus(res.samples["raw_beta"])).ravel()
        print(f"beta posterior: {betas.mean():.3f} ± {betas.std():.3f}")
        records.append({"quantity": "beta_mean", "value": float(betas.mean())})
        records.append({"quantity": "beta_std", "value": float(betas.std())})

    path = save_results(records, args.results_dir, "hmc", config=vars(args))
    print(f"results -> {path}")
    return records


if __name__ == "__main__":
    main()
