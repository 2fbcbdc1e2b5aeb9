"""End-to-end GP tests: exact vs iterative consistency, pathwise prediction,
SVGP classification, HMC sanity — the CG-vs-Cholesky cross-checks the
reference never had (SURVEY §4 implication)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphgp_tpu import WalkConfig, pack_laplacian
from graphgp_tpu.features import (
    DenseFeatures,
    EllFeatures,
    LogFeatures,
    consolidate,
    suggest_row_capacity,
)
from graphgp_tpu.gp import CGSettings, exact, hmc, iterative, svgp
from graphgp_tpu.gp import params as P
from graphgp_tpu.kernels import diffusion_kernel
from graphgp_tpu.walker import sample_dense_step_matrices, sample_walk_log


@pytest.fixture(scope="module")
def problem():
    """Synthetic regression on a 60-node ring: sample from the exact
    diffusion-kernel GP, observe half the nodes."""
    n = 60
    adj = np.zeros((n, n))
    idx = np.arange(n)
    adj[idx, (idx + 1) % n] = 1.0
    adj[(idx + 1) % n, idx] = 1.0

    k_true = np.asarray(diffusion_kernel(adj, beta=2.0))
    rng = np.random.default_rng(0)
    chol = np.linalg.cholesky(k_true + 1e-6 * np.eye(n))
    f_true = chol @ rng.normal(size=n)
    y_all = f_true + 0.1 * rng.normal(size=n)

    train_idx = jnp.asarray(np.arange(0, n, 2), jnp.int32)
    test_idx = jnp.asarray(np.arange(1, n, 2), jnp.int32)

    graph = pack_laplacian(adj)
    cfg = WalkConfig(walks_per_node=500, p_halt=0.1, max_walk_length=6)
    log = sample_walk_log(graph, jax.random.PRNGKey(1), cfg)
    mats = sample_dense_step_matrices(graph, jax.random.PRNGKey(1), cfg)
    return dict(
        adj=adj,
        log=log,
        cfg=cfg,
        feats=DenseFeatures(mats),
        y_all=jnp.asarray(y_all, jnp.float32),
        f_true=jnp.asarray(f_true, jnp.float32),
        train_idx=train_idx,
        test_idx=test_idx,
    )


def test_exact_fit_and_predict(problem):
    p = problem
    y_tr = p["y_all"][p["train_idx"]]
    res = exact.fit(
        p["feats"], p["train_idx"], y_tr, kind="diffusion", num_steps=200,
        learning_rate=0.05,
    )
    assert np.isfinite(np.asarray(res.losses)).all()
    assert res.losses[-1] < res.losses[0]
    post = exact.predict(
        p["feats"], res.params, p["train_idx"], y_tr, p["test_idx"], kind="diffusion"
    )
    err = exact.rmse(post, p["f_true"][p["test_idx"]])
    # predictive error should beat the observation noise floor context:
    # predicting f at held-out nodes better than the prior std (~1)
    assert float(err) < 0.5
    n = exact.nlpd(post, res.params, p["y_all"][p["test_idx"]])
    assert np.isfinite(float(n))


def test_mll_cg_matches_cholesky(problem):
    """CG+SLQ marginal likelihood ≈ exact Cholesky MLL (tight solver)."""
    p = problem
    y_tr = p["y_all"][p["train_idx"]]
    params = P.init_params("diffusion", p["feats"].max_walk_length, jax.random.PRNGKey(0))
    exact_val = exact.mll(p["feats"], params, p["train_idx"], y_tr, kind="diffusion")
    settings = CGSettings(cg_tol=1e-6, cg_max_iters=400, num_probes=64, num_lanczos_iters=25)
    vals = [
        iterative.mll_cg(
            p["feats"], params, p["train_idx"], y_tr, jax.random.PRNGKey(s),
            kind="diffusion", settings=settings,
        )
        for s in range(3)
    ]
    approx = float(np.mean([float(v) for v in vals]))
    # SLQ is stochastic: within a few percent of the exact value
    assert abs(approx - float(exact_val)) / abs(float(exact_val)) < 0.05


def test_mll_cg_gradients_match(problem):
    """Custom-VJP gradients of the CG MLL ≈ autodiff gradients of the exact
    MLL (the property GPyTorch relies on, verified explicitly here)."""
    p = problem
    y_tr = p["y_all"][p["train_idx"]]
    params = P.init_params("diffusion", p["feats"].max_walk_length, jax.random.PRNGKey(0))
    g_exact = jax.grad(
        lambda q: exact.mll(p["feats"], q, p["train_idx"], y_tr, kind="diffusion")
    )(params)
    settings = CGSettings(cg_tol=1e-6, cg_max_iters=400, num_probes=128, num_lanczos_iters=25)
    g_cg = jax.grad(
        lambda q: iterative.mll_cg(
            p["feats"], q, p["train_idx"], y_tr, jax.random.PRNGKey(7),
            kind="diffusion", settings=settings,
        )
    )(params)
    for k in g_exact:
        ge, gc = np.asarray(g_exact[k]), np.asarray(g_cg[k])
        np.testing.assert_allclose(gc, ge, rtol=0.15, atol=0.3)


def test_pathwise_predict_matches_exact_posterior(problem):
    """Matheron samples' mean/var ≈ exact GP posterior (many samples)."""
    p = problem
    y_tr = p["y_all"][p["train_idx"]]
    params = P.init_params(
        "diffusion", p["feats"].max_walk_length, jax.random.PRNGKey(0), noise=0.3
    )
    post = exact.predict(
        p["feats"], params, p["train_idx"], y_tr, p["test_idx"], kind="diffusion"
    )
    samples = iterative.pathwise_predict(
        p["feats"], params, p["train_idx"], y_tr, p["test_idx"],
        jax.random.PRNGKey(3), kind="diffusion", num_samples=512,
        settings=CGSettings(cg_tol=1e-6, cg_max_iters=400),
    )
    summ = iterative.summarize_samples(samples)
    np.testing.assert_allclose(
        np.asarray(summ.mean), np.asarray(post.mean), atol=0.25
    )
    np.testing.assert_allclose(np.asarray(summ.var), np.asarray(post.var), atol=0.3)


def test_full_space_solver_matches_compact(problem):
    """The full-node-space masked Gram operator (zero per-iteration
    gathers/scatters; gp/iterative.make_gram_matvec_bm_full) must agree with
    the compact train-space path: pathwise samples bitwise-near (same draws,
    exact CG), MLL within SLQ probe noise, and both within a tight band of
    the exact Cholesky MLL."""
    p = problem
    y_tr = p["y_all"][p["train_idx"]]
    params = P.init_params(
        "diffusion", p["feats"].max_walk_length, jax.random.PRNGKey(0), noise=0.3
    )
    st = CGSettings(cg_tol=1e-8, cg_max_iters=400, num_probes=64,
                    num_lanczos_iters=25)
    s_c = iterative.pathwise_predict(
        p["feats"], params, p["train_idx"], y_tr, p["test_idx"],
        jax.random.PRNGKey(3), kind="diffusion", num_samples=32, settings=st,
    )
    s_f = iterative.pathwise_predict(
        p["feats"], params, p["train_idx"], y_tr, p["test_idx"],
        jax.random.PRNGKey(3), kind="diffusion", num_samples=32, settings=st,
        full_space=True,
    )
    np.testing.assert_allclose(np.asarray(s_c), np.asarray(s_f), atol=1e-4)

    exact_val = float(
        exact.mll(p["feats"], params, p["train_idx"], y_tr, kind="diffusion")
    )
    m_f = float(np.mean([
        float(iterative.mll_cg(
            p["feats"], params, p["train_idx"], y_tr, jax.random.PRNGKey(s),
            kind="diffusion", settings=st, full_space=True,
        )) for s in range(3)
    ]))
    assert abs(m_f - exact_val) / abs(exact_val) < 0.05

    # gradients flow through the contracted carry back to the params
    g_c = jax.grad(lambda q: iterative.mll_cg(
        p["feats"], q, p["train_idx"], y_tr, jax.random.PRNGKey(7),
        kind="diffusion", settings=st))(params)
    g_f = jax.grad(lambda q: iterative.mll_cg(
        p["feats"], q, p["train_idx"], y_tr, jax.random.PRNGKey(7),
        kind="diffusion", settings=st, full_space=True))(params)
    for k in g_c:
        np.testing.assert_allclose(
            np.asarray(g_f[k]), np.asarray(g_c[k]), rtol=0.2, atol=0.3
        )


def test_full_space_masked_padded_buffer(problem):
    """full_space with a padded fixed-capacity observation buffer (masked
    slots duplicate node 0 with y=0) must match the compact masked path."""
    p = problem
    y_tr = p["y_all"][p["train_idx"]]
    n_real = y_tr.shape[0]
    cap = n_real + 6
    tr_pad = jnp.concatenate(
        [p["train_idx"], jnp.zeros((cap - n_real,), jnp.int32)]
    )
    y_pad = jnp.concatenate([y_tr, jnp.zeros((cap - n_real,), jnp.float32)])
    mask = jnp.concatenate(
        [jnp.ones((n_real,), jnp.float32), jnp.zeros((cap - n_real,), jnp.float32)]
    )
    params = P.init_params(
        "diffusion", p["feats"].max_walk_length, jax.random.PRNGKey(0), noise=0.3
    )
    st = CGSettings(cg_tol=1e-8, cg_max_iters=400, num_probes=64,
                    num_lanczos_iters=25)
    s_c = iterative.pathwise_predict(
        p["feats"], params, tr_pad, y_pad, p["test_idx"],
        jax.random.PRNGKey(3), kind="diffusion", num_samples=32, settings=st,
        mask=mask,
    )
    s_f = iterative.pathwise_predict(
        p["feats"], params, tr_pad, y_pad, p["test_idx"],
        jax.random.PRNGKey(3), kind="diffusion", num_samples=32, settings=st,
        mask=mask, full_space=True,
    )
    np.testing.assert_allclose(np.asarray(s_c), np.asarray(s_f), atol=1e-4)


def test_iterative_fit_on_ell_features(problem):
    """Train the CG path on consolidated ELL features (the large-N layout)."""
    p = problem
    y_tr = p["y_all"][p["train_idx"]]
    cap = suggest_row_capacity(p["log"])
    feats = EllFeatures(consolidate(p["log"], cap, walks_per_node=p["cfg"].walks_per_node))
    res = iterative.fit(
        feats, p["train_idx"], y_tr, kind="diffusion", num_steps=25,
        settings=CGSettings(cg_tol=1e-3, cg_max_iters=150, num_probes=8),
    )
    assert np.isfinite(np.asarray(res.losses)).all()
    assert res.losses[-1] < res.losses[0]
    samples = iterative.pathwise_predict(
        feats, res.params, p["train_idx"], y_tr, p["test_idx"],
        jax.random.PRNGKey(5), kind="diffusion", num_samples=64,
        settings=CGSettings(cg_tol=1e-4, cg_max_iters=200),
    )
    summ = iterative.summarize_samples(samples)
    err = float(jnp.sqrt(jnp.mean((summ.mean - p["f_true"][p["test_idx"]]) ** 2)))
    assert err < 0.6


def test_log_features_pathwise(problem):
    """LogFeatures (raw walk-log) path works for prediction too."""
    p = problem
    y_tr = p["y_all"][p["train_idx"]]
    feats = LogFeatures(p["log"], num_target_nodes=p["log"].num_nodes)
    params = P.init_params(
        "diffusion", feats.max_walk_length, jax.random.PRNGKey(0), noise=0.3
    )
    samples = iterative.pathwise_predict(
        feats, params, p["train_idx"], y_tr, p["test_idx"],
        jax.random.PRNGKey(4), kind="diffusion", num_samples=32,
    )
    assert samples.shape == (32, p["test_idx"].shape[0])
    assert np.isfinite(np.asarray(samples)).all()


def test_svgp_classification(problem):
    """SVGP separates a simple 2-class node labeling."""
    p = problem
    n = p["feats"].num_nodes
    labels = jnp.asarray((np.arange(n) % 60 < 30).astype(np.int32))
    # Random split: an even/odd split on a ring is adversarial for GRF
    # kernels (train nodes all even distances apart leave the odd-distance
    # sign structure unconstrained — sublattice aliasing).
    perm = np.random.default_rng(0).permutation(n)
    train_idx = jnp.asarray(np.sort(perm[: n // 2]), jnp.int32)
    test_idx = jnp.asarray(np.sort(perm[n // 2 :]), jnp.int32)
    inducing_idx = train_idx[::2]
    res = svgp.fit(
        p["feats"], inducing_idx, train_idx, labels[train_idx],
        num_latent=2, kind="diffusion", num_steps=300, learning_rate=0.02,
    )
    assert np.isfinite(np.asarray(res.losses)).all()
    probs = svgp.predict_class_probs(
        p["feats"], res.params, inducing_idx, test_idx, jax.random.PRNGKey(0),
        kind="diffusion",
    )
    acc = float(jnp.mean((jnp.argmax(probs, -1) == labels[test_idx]).astype(jnp.float32)))
    assert acc > 0.8


def test_hmc_gp_posterior(problem):
    """HMC over (β, σ_f, noise) posterior: finite, reasonable acceptance."""
    p = problem
    y_tr = p["y_all"][p["train_idx"]]
    init = P.init_params("diffusion", p["feats"].max_walk_length, jax.random.PRNGKey(0))
    log_post = hmc.make_gp_log_posterior(
        lambda q: exact.mll(p["feats"], q, p["train_idx"], y_tr, kind="diffusion")
    )
    res = hmc.sample(
        log_post, init, jax.random.PRNGKey(0),
        config=hmc.HMCConfig(num_warmup=80, num_samples=80, num_leapfrog=8),
        num_chains=2,
    )
    acc = np.asarray(res.accept_rate)
    assert np.all(acc > 0.4), acc
    assert np.isfinite(np.asarray(res.log_probs)).all()
    # posterior over beta should not collapse to init
    betas = np.asarray(jax.nn.softplus(res.samples["raw_beta"]))
    assert betas.std() > 0.0


def test_hmc_laplace_mixes(problem):
    """Laplace-whitened HMC around a refined mode must actually mix: all
    per-parameter split-R̂ ≤ 1.1 (regression for the round-3 published run
    where a stale mode + absolute eigenvalue clip left R̂(raw_noise)=50)."""
    p = problem
    y_tr = p["y_all"][p["train_idx"]]
    fitres = exact.fit(
        p["feats"], p["train_idx"], y_tr, kind="diffusion", num_steps=150
    )
    log_post = hmc.make_gp_log_posterior(
        lambda q: exact.mll(p["feats"], q, p["train_idx"], y_tr, kind="diffusion")
    )
    mode, losses = hmc.refine_mode(log_post, fitres.params)
    assert float(losses[-1]) <= float(losses[0]) + 1e-3
    res = hmc.sample_laplace(
        log_post, mode, jax.random.PRNGKey(1),
        config=hmc.HMCConfig(
            num_warmup=150, num_samples=300, num_leapfrog=12,
            initial_step_size=0.2,
        ),
        num_chains=4,
    )
    # healthy whitened step sizes — not the 2e-4 collapse signature
    assert np.all(np.asarray(res.step_size) > 0.01), res.step_size
    rhats = hmc.split_rhat_tree(res.samples)
    for name, r in rhats.items():
        assert float(np.max(np.asarray(r))) < 1.1, (name, np.asarray(r))


def test_batch_major_products_match_column_major(problem):
    """matvec_bm/rmatvec_bm must equal the transposed column-major products
    on every feature layout (the TPU batch-major fast path is a layout
    change, never a semantics change)."""
    p = problem
    cfg = p["cfg"]
    log = p["log"]
    n = log.num_nodes
    cap = suggest_row_capacity(log)
    layouts = [
        p["feats"],
        EllFeatures(consolidate(log, cap, walks_per_node=cfg.walks_per_node)),
        LogFeatures(log, n),
    ]
    f = jnp.linspace(1.0, -0.5, cfg.max_walk_length)
    v = jax.random.normal(jax.random.PRNGKey(3), (n, 5))
    for feats in layouts:
        np.testing.assert_allclose(
            np.asarray(feats.matvec_bm(f, v.T)),
            np.asarray(feats.matvec(f, v)).T,
            atol=1e-4, rtol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(feats.rmatvec_bm(f, v.T)),
            np.asarray(feats.rmatvec(f, v)).T,
            atol=1e-4, rtol=1e-4,
        )


def test_batched_cg_batch_major_matches(problem):
    """batch_axis=0 CG must agree with the column-major solve."""
    from graphgp_tpu.gp.iterative import make_ktt_matvec, make_ktt_matvec_bm
    from graphgp_tpu.linalg import batched_cg

    p = problem
    feats = p["feats"]
    params = P.init_params("diffusion", feats.max_walk_length,
                           jax.random.PRNGKey(0), noise=0.3)
    tr = p["train_idx"]
    b = jax.random.normal(jax.random.PRNGKey(4), (tr.shape[0], 3))
    col = batched_cg(
        make_ktt_matvec("diffusion"), (params, feats, tr), b,
        tol=1e-8, max_iters=200,
    ).x
    row = batched_cg(
        make_ktt_matvec_bm("diffusion"), (params, feats, tr), b.T,
        tol=1e-8, max_iters=200, batch_axis=0,
    ).x
    np.testing.assert_allclose(np.asarray(row), np.asarray(col).T,
                               atol=1e-3, rtol=1e-3)


def test_svgp_exact_diffusion_kind(problem):
    """The exact-kernel SVGP arm (SpectralDiffusionFeatures +
    kind='exact_diffusion') classifies the same toy labeling: K = ΦΦᵀ =
    σ_f² expm(-βL) exactly, β/σ_f trainable through the ELBO (reference
    classification_multiple_diff.ipynb variant)."""
    from graphgp_tpu.gp import spectral

    p = problem
    feats = spectral.SpectralDiffusionFeatures(spectral.eigenbasis(p["adj"]))
    n = feats.num_nodes
    # exactness: Φ Φᵀ == σ_f² expm(-βL) for the init params
    params = P.init_params("exact_diffusion", 2, jax.random.PRNGKey(0))
    f = P.modulator("exact_diffusion", params, 2)
    phi = feats.rows(f, jnp.arange(n, dtype=jnp.int32))
    k = np.asarray(phi @ phi.T)
    beta = float(jax.nn.softplus(params["raw_beta"]))
    sf = float(jax.nn.softplus(params["raw_sigma_f"]))
    k_true = sf**2 * np.asarray(diffusion_kernel(p["adj"], beta=beta))
    np.testing.assert_allclose(k, k_true, atol=5e-4)

    labels = jnp.asarray((np.arange(n) % 60 < 30).astype(np.int32))
    train_idx = jnp.asarray(np.arange(0, n, 2), jnp.int32)
    test_idx = jnp.asarray(np.arange(1, n, 2), jnp.int32)
    inducing_idx = train_idx[::2]
    res = svgp.fit(
        feats, inducing_idx, train_idx, labels[train_idx],
        num_latent=2, kind="exact_diffusion", num_steps=300,
        learning_rate=0.02,
    )
    probs = svgp.predict_class_probs(
        feats, res.params, inducing_idx, test_idx, jax.random.PRNGKey(0),
        kind="exact_diffusion",
    )
    acc = float(
        jnp.mean((jnp.argmax(probs, -1) == labels[test_idx]).astype(jnp.float32))
    )
    assert acc > 0.8


def test_robustmax_prob_is_largest_matches_mc():
    """GH-quadrature P(argmax f = c) vs a Monte-Carlo estimate on random
    factorized Gaussians (the reference's RobustMax.prob_is_largest engine)."""
    import numpy as np

    rng = np.random.default_rng(0)
    n, c = 6, 5
    mean = jnp.asarray(rng.normal(size=(n, c)), jnp.float32)
    var = jnp.asarray(rng.uniform(0.2, 2.0, size=(n, c)), jnp.float32)
    post = svgp.LatentPosterior(mean=mean, var=var)
    sel = jnp.asarray(rng.integers(0, c, size=n), jnp.int32)
    p_gh = np.asarray(svgp._prob_is_largest(post, sel, num_gh=30))

    draws = rng.normal(size=(200_000, n, c)) * np.sqrt(np.asarray(var)) + np.asarray(mean)
    p_mc = (draws.argmax(-1) == np.asarray(sel)[None, :]).mean(0)
    np.testing.assert_allclose(p_gh, p_mc, atol=5e-3)

    # predictive class probs: rows sum to ~1 (up to the epsilon smoothing)
    probs = np.asarray(svgp.robustmax_class_probs(post))
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=2e-3)


def test_robustmax_elbo_trains(problem):
    """RobustMax ELBO improves and separates the 2-class ring labeling."""
    p = problem
    n = p["feats"].num_nodes
    labels = jnp.asarray((np.arange(n) % 60 < 30).astype(np.int32))
    perm = np.random.default_rng(0).permutation(n)
    train_idx = jnp.asarray(np.sort(perm[: n // 2]), jnp.int32)
    test_idx = jnp.asarray(np.sort(perm[n // 2 :]), jnp.int32)
    inducing_idx = train_idx[::2]
    res = svgp.fit(
        p["feats"], inducing_idx, train_idx, labels[train_idx],
        num_latent=2, kind="diffusion", likelihood="robustmax",
        num_steps=300, learning_rate=0.02,
    )
    assert float(res.losses[-1]) < float(res.losses[0])
    pred = svgp.predict_class(
        p["feats"], res.params, inducing_idx, test_idx,
        kind="diffusion", likelihood="robustmax",
    )
    acc = float(jnp.mean((pred == labels[test_idx]).astype(jnp.float32)))
    assert acc > 0.8
