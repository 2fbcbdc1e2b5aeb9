"""Sparse variational GP (SVGP) with inducing node indices.

Replaces the reference's GPflow SVGP usage for Cora multiclass
classification (reference experiments/dense/cora/classification_multiple_GRF.ipynb
cell 7: gpflow.models.SVGP with MultiClass likelihood, inducing points =
half the train node indices, whitened representation, Adam lr=0.003 ×1000).

Design: whitened q(u) = N(m, L Lᵀ) per latent GP (one per class). Three
likelihoods: **robustmax** (the protocol default — analytic Gauss–Hermite
variational expectations for the RobustMax MultiClass likelihood, GPflow's
default and the recipe behind the reference's Cora numbers), softmax
(Monte-Carlo reparameterized ELBO), and gaussian (closed form). All node
covariances come from the shared GRF feature matrix Φ via gathers — no N×N
materialization.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..features import Features
from ..linalg import safe_cholesky
from . import params as P


def init_variational(
    key: jax.Array,
    kind: str,
    max_walk_length: int,
    num_inducing: int,
    num_latent: int,
) -> Dict:
    """Kernel hyperparameters + whitened variational parameters."""
    params = P.init_params(kind, max_walk_length, key)
    params["q_mu"] = jnp.zeros((num_inducing, num_latent), jnp.float32)
    # q_sqrt stored as (num_latent, M, M) lower triangles, init = identity.
    eye = jnp.eye(num_inducing, dtype=jnp.float32)
    params["q_sqrt"] = jnp.tile(eye[None], (num_latent, 1, 1))
    return params


class LatentPosterior(NamedTuple):
    mean: jnp.ndarray  # (n, C)
    var: jnp.ndarray  # (n, C)


def _latent_posterior(
    feats: Features,
    params: Dict,
    inducing_idx: jnp.ndarray,
    x_idx: jnp.ndarray,
    kind: str,
) -> LatentPosterior:
    """q(f(x)) marginals under whitened q(u). Standard SVGP algebra:
    mean = A m, var = diag(K_xx − A Aᵀ + A S Aᵀ)... with A = K_xz L_zz^{-T}
    in the whitened parameterization."""
    f = P.modulator(kind, params, feats.max_walk_length)
    phi_z = feats.rows(f, inducing_idx)  # (M, Nt)
    phi_x = feats.rows(f, x_idx)  # (n, Nt)
    k_zz = phi_z @ phi_z.T
    l_zz = safe_cholesky(k_zz, jitter=1e-5)
    k_xz = phi_x @ phi_z.T
    # A = K_xz L^{-T}  (n, M): solve L a = k_zx for a, then A = aᵀ
    a = jax.scipy.linalg.solve_triangular(l_zz, k_xz.T, lower=True)  # (M, n)
    mean = a.T @ params["q_mu"]  # (n, C)
    k_diag = jnp.sum(phi_x * phi_x, axis=-1)  # (n,)
    var_prior = k_diag[:, None] - jnp.sum(a * a, axis=0)[:, None]  # (n, 1)
    # A S Aᵀ diag per latent: S = q_sqrt q_sqrtᵀ
    sa = jnp.einsum("cmk,mn->ckn", params["q_sqrt"], a)  # (C, M, n)
    var_q = jnp.sum(sa * sa, axis=1).T  # (n, C)
    var = jnp.maximum(var_prior + var_q, 1e-10)
    return LatentPosterior(mean=mean, var=var)


def _kl_whitened(params: Dict) -> jnp.ndarray:
    """KL(q(u) || N(0, I)) for whitened q per latent, summed."""
    q_mu = params["q_mu"]  # (M, C)
    q_sqrt = params["q_sqrt"]  # (C, M, M)
    m = q_mu.shape[0]
    mahal = jnp.sum(q_mu**2)
    trace = jnp.sum(q_sqrt**2)
    diag = jnp.abs(jnp.diagonal(q_sqrt, axis1=-2, axis2=-1)) + 1e-12
    logdet = 2.0 * jnp.sum(jnp.log(diag))
    c = q_sqrt.shape[0]
    return 0.5 * (mahal + trace - c * m - logdet)


def softmax_expected_loglik(
    key: jax.Array,
    post: LatentPosterior,
    labels: jnp.ndarray,
    num_samples: int = 8,
) -> jnp.ndarray:
    """MC estimate of Σ_n E_q[log softmax(f_n)[y_n]] via reparameterization."""
    eps = jax.random.normal(key, (num_samples, *post.mean.shape), jnp.float32)
    f = post.mean[None] + jnp.sqrt(post.var)[None] * eps  # (S, n, C)
    logp = jax.nn.log_softmax(f, axis=-1)
    picked = jnp.take_along_axis(logp, labels[None, :, None], axis=-1)[..., 0]
    return jnp.sum(jnp.mean(picked, axis=0))


def _gh_nodes(num_gh: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    import numpy as np

    gh_x, gh_w = np.polynomial.hermite.hermgauss(num_gh)
    return jnp.asarray(gh_x, jnp.float32), jnp.asarray(gh_w, jnp.float32)


def _prob_is_largest(
    post: LatentPosterior, sel: jnp.ndarray, num_gh: int
) -> jnp.ndarray:
    """P(f_sel(n) = max_c f_c(n)) under factorized Gaussians q(f_n).

    1-D Gauss–Hermite quadrature over the selected latent; the competitors
    enter through their Normal CDFs (the reference's GPflow
    ``RobustMax.prob_is_largest``, the engine of its MultiClass likelihood).
    ``sel``: (n,) int class indices. Returns (n,) probabilities.
    """
    gh_x, gh_w = _gh_nodes(num_gh)
    n_idx = jnp.arange(post.mean.shape[0])
    mu_sel = post.mean[n_idx, sel]  # (n,)
    var_sel = post.var[n_idx, sel]
    # quadrature grid over the selected latent: (n, P)
    grid = mu_sel[:, None] + gh_x[None, :] * jnp.sqrt(
        jnp.clip(2.0 * var_sel, 1e-10, None)
    )[:, None]
    # CDF of each competitor at the grid: (n, C, P)
    dist = (grid[:, None, :] - post.mean[:, :, None]) / jnp.sqrt(
        jnp.clip(post.var, 1e-10, None)
    )[:, :, None]
    cdfs = jax.scipy.special.ndtr(dist)
    # squash to (1e-4, 1-1e-4) to keep log-gradients finite (GPflow does the
    # same squash before the product)
    cdfs = cdfs * (1.0 - 2e-4) + 1e-4
    oh_on = jax.nn.one_hot(sel, post.mean.shape[1], dtype=cdfs.dtype)
    cdfs = cdfs * (1.0 - oh_on[:, :, None]) + oh_on[:, :, None]
    return (jnp.prod(cdfs, axis=1) @ gh_w) / jnp.sqrt(jnp.pi)


def robustmax_expected_loglik(
    post: LatentPosterior,
    labels: jnp.ndarray,
    epsilon: float = 1e-3,
    num_gh: int = 20,
) -> jnp.ndarray:
    """Analytic Σ_n E_q[log p(y_n | f_n)] for the RobustMax likelihood.

    p(y=c|f) = 1−ε if argmax f = c else ε/(C−1), so the expectation is
    exactly ``P·log(1−ε) + (1−P)·log(ε/(C−1))`` with P from GH quadrature —
    no MC sampling, no softmax saturation (reference MultiClass likelihood,
    classification notebooks cell 7/8)."""
    p = _prob_is_largest(post, labels, num_gh)
    num_classes = post.mean.shape[1]
    ve = p * jnp.log(1.0 - epsilon) + (1.0 - p) * jnp.log(
        epsilon / (num_classes - 1)
    )
    return jnp.sum(ve)


def robustmax_class_probs(
    post: LatentPosterior, epsilon: float = 1e-3, num_gh: int = 20
) -> jnp.ndarray:
    """Predictive class probabilities (n, C): (1−ε)·P_c + (1−P_c)·ε/(C−1)
    (the reference's ``predict_y`` for MultiClass)."""
    n, c = post.mean.shape
    p = jax.vmap(
        lambda cls: _prob_is_largest(
            post, jnp.full((n,), cls, jnp.int32), num_gh
        )
    )(jnp.arange(c)).T  # (n, C)
    return (1.0 - epsilon) * p + (1.0 - p) * epsilon / (c - 1)


def gaussian_expected_loglik(
    post: LatentPosterior, y: jnp.ndarray, noise_var: jnp.ndarray
) -> jnp.ndarray:
    """Closed-form Σ_n E_q[log N(y_n | f_n, σ²)]."""
    lognorm = -0.5 * (jnp.log(2 * jnp.pi * noise_var))
    quad = -0.5 * ((y - post.mean[:, 0]) ** 2 + post.var[:, 0]) / noise_var
    return jnp.sum(lognorm + quad)


@partial(jax.jit, static_argnames=("kind", "likelihood", "num_mc_samples"))
def elbo(
    feats: Features,
    params: Dict,
    inducing_idx: jnp.ndarray,
    train_idx: jnp.ndarray,
    y: jnp.ndarray,
    key: jax.Array,
    kind: str = "free",
    likelihood: str = "softmax",
    num_mc_samples: int = 8,
) -> jnp.ndarray:
    post = _latent_posterior(feats, params, inducing_idx, train_idx, kind)
    if likelihood == "softmax":
        ell = softmax_expected_loglik(key, post, y, num_mc_samples)
    elif likelihood == "robustmax":
        ell = robustmax_expected_loglik(post, y)
    elif likelihood == "gaussian":
        ell = gaussian_expected_loglik(post, y, P.noise_variance(params))
    else:
        raise ValueError(f"unknown likelihood {likelihood!r}")
    return ell - _kl_whitened(params)


@partial(jax.jit, static_argnames=("kind",))
def predict_latent(
    feats: Features,
    params: Dict,
    inducing_idx: jnp.ndarray,
    test_idx: jnp.ndarray,
    kind: str = "free",
) -> LatentPosterior:
    return _latent_posterior(feats, params, inducing_idx, test_idx, kind)


@partial(jax.jit, static_argnames=("kind", "num_samples", "likelihood"))
def predict_class_probs(
    feats: Features,
    params: Dict,
    inducing_idx: jnp.ndarray,
    test_idx: jnp.ndarray,
    key: jax.Array,
    kind: str = "free",
    num_samples: int = 64,
    likelihood: str = "softmax",
) -> jnp.ndarray:
    """Predictive class probabilities (n_test, C).

    softmax: posterior-averaged softmax by MC; robustmax: analytic GH
    probabilities (the reference's ``predict_y``)."""
    post = _latent_posterior(feats, params, inducing_idx, test_idx, kind)
    if likelihood == "robustmax":
        return robustmax_class_probs(post)
    eps = jax.random.normal(key, (num_samples, *post.mean.shape), jnp.float32)
    f = post.mean[None] + jnp.sqrt(post.var)[None] * eps
    return jnp.mean(jax.nn.softmax(f, axis=-1), axis=0)


@partial(jax.jit, static_argnames=("kind", "likelihood"))
def predict_class(
    feats: Features,
    params: Dict,
    inducing_idx: jnp.ndarray,
    test_idx: jnp.ndarray,
    kind: str = "free",
    likelihood: str = "softmax",
) -> jnp.ndarray:
    """Hard class predictions.

    robustmax: argmax of the analytic GH class probabilities — exactly the
    reference's ``argmax(predict_y)`` (classification notebooks cell 7/8).

    softmax: argmax of the latent posterior MEANS.

    Deterministic, like the reference's argmax of GPflow ``predict_y``
    (classification notebooks cell 7/8): when q(u) is lightly trained the
    class ordering lives in mean differences far below the posterior std,
    and the Monte-Carlo probability average buries it in sampling noise
    (measured: MC-argmax 0.14 vs mean-argmax parity on the 140-train
    protocol, where the reference trains the diff variant for 5 steps)."""
    post = _latent_posterior(feats, params, inducing_idx, test_idx, kind)
    if likelihood == "robustmax":
        return jnp.argmax(robustmax_class_probs(post), axis=-1)
    return jnp.argmax(post.mean, axis=-1)


@dataclasses.dataclass
class FitResult:
    params: Dict
    losses: jnp.ndarray


def fit(
    feats: Features,
    inducing_idx: jnp.ndarray,
    train_idx: jnp.ndarray,
    y: jnp.ndarray,
    *,
    num_latent: int,
    kind: str = "free",
    likelihood: str = "softmax",
    key: Optional[jax.Array] = None,
    learning_rate: float = 3e-3,
    num_steps: int = 1000,
    num_mc_samples: int = 8,
) -> FitResult:
    """Adam on the negative ELBO (reference Cora protocol: Adam lr=0.003
    ×1000 steps, whiten=True)."""
    if key is None:
        key = jax.random.PRNGKey(42)
    k_init, k_loop = jax.random.split(key)
    params = init_variational(
        k_init, kind, feats.max_walk_length, int(inducing_idx.shape[0]), num_latent
    )
    opt = optax.adam(learning_rate)

    @jax.jit
    def run(p0):
        def step(carry, step_key):
            p, state = carry
            loss, grads = jax.value_and_grad(
                lambda q: -elbo(
                    feats,
                    q,
                    inducing_idx,
                    train_idx,
                    y,
                    step_key,
                    kind=kind,
                    likelihood=likelihood,
                    num_mc_samples=num_mc_samples,
                )
            )(p)
            updates, state = opt.update(grads, state, p)
            p = optax.apply_updates(p, updates)
            return (p, state), loss

        keys = jax.random.split(k_loop, num_steps)
        (p, _), losses = jax.lax.scan(step, (p0, opt.init(p0)), keys)
        return p, losses

    trained, losses = run(params)
    return FitResult(params=trained, losses=losses)
