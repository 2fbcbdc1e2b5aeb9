"""Exact GP regression on graph nodes (Cholesky, small/medium N).

Replaces the reference's GPflow GPR usage (reference call stack SURVEY §3.5:
gpflow.models.GPR + Scipy/L-BFGS over GraphGeneralFastGRFKernel /
GraphDiffusionFastGRFKernel). One functional core: step matrices are sampled
once, the marginal likelihood is a differentiable contraction + Cholesky, and
hyperparameters are trained with optax (Adam or L-BFGS).

Inputs are node indices (``X`` in the reference is a column of node ids cast
to int and gathered — general_kernel_fast_grf.py:61-67); here indices are
explicit int arrays.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..features import DenseFeatures
from ..linalg import cholesky_solve, safe_cholesky
from . import params as P

_LOG2PI = 1.8378770664093453


@partial(jax.jit, static_argnames=("kind",))
def mll(
    feats: DenseFeatures,
    params: Dict,
    train_idx: jnp.ndarray,
    y: jnp.ndarray,
    kind: str = "free",
) -> jnp.ndarray:
    """Log marginal likelihood ``log N(y | 0, K_tt + σ²I)`` (natural units)."""
    f = P.modulator(kind, params, feats.max_walk_length)
    phi_t = feats.rows(f, train_idx)  # (n, Nt)
    k_tt = phi_t @ phi_t.T
    n = y.shape[0]
    a = k_tt + P.noise_variance(params) * jnp.eye(n, dtype=k_tt.dtype)
    chol = safe_cholesky(a, jitter=1e-6)
    alpha = cholesky_solve(chol, y)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
    return -0.5 * (y @ alpha + logdet + n * _LOG2PI)


class Posterior(NamedTuple):
    mean: jnp.ndarray
    var: jnp.ndarray  # latent variance (add noise for predictive y-variance)


@partial(jax.jit, static_argnames=("kind",))
def predict(
    feats: DenseFeatures,
    params: Dict,
    train_idx: jnp.ndarray,
    y: jnp.ndarray,
    test_idx: jnp.ndarray,
    kind: str = "free",
) -> Posterior:
    """Exact posterior mean/var at test node indices."""
    f = P.modulator(kind, params, feats.max_walk_length)
    phi_tr = feats.rows(f, train_idx)
    phi_te = feats.rows(f, test_idx)
    k_tt = phi_tr @ phi_tr.T
    k_st = phi_te @ phi_tr.T
    n = train_idx.shape[0]
    a = k_tt + P.noise_variance(params) * jnp.eye(n, dtype=k_tt.dtype)
    chol = safe_cholesky(a, jitter=1e-6)
    alpha = cholesky_solve(chol, y)
    mean = k_st @ alpha
    v = jax.scipy.linalg.solve_triangular(chol, k_st.T, lower=True)
    diag_test = jnp.sum(phi_te * phi_te, axis=-1)
    var = jnp.maximum(diag_test - jnp.sum(v * v, axis=0), 1e-12)
    return Posterior(mean=mean, var=var)


@dataclasses.dataclass
class FitResult:
    params: Dict
    losses: jnp.ndarray


def fit(
    feats: DenseFeatures,
    train_idx: jnp.ndarray,
    y: jnp.ndarray,
    *,
    kind: str = "free",
    key: Optional[jax.Array] = None,
    init: Optional[Dict] = None,
    learning_rate: float = 0.05,
    num_steps: int = 300,
    optimizer: str = "adam",
    noise_prior_lognormal: Optional[Tuple[float, float]] = None,
) -> FitResult:
    """Maximize the marginal likelihood over kernel + noise hyperparameters.

    optimizer='adam' (reference sparse stack: Adam lr=0.1 ×50,
    run_scaling_experiment.py:606-611) or 'lbfgs' (reference dense stack:
    gpflow Scipy/L-BFGS, SURVEY §3.5) — both via optax, fully jitted.

    ``noise_prior_lognormal=(loc, scale)`` adds a LogNormal log-density on
    the noise variance to the objective (MAP), mirroring the reference
    ablation's weak prior on likelihood variance
    (ablation_study.py:66-74: LogNormal(log σ_true², 0.5)).
    """
    if init is None:
        if key is None:
            key = jax.random.PRNGKey(42)
        init = P.init_params(kind, feats.max_walk_length, key)

    if noise_prior_lognormal is None:
        loss_fn = lambda p: -mll(feats, p, train_idx, y, kind=kind)
    else:
        loc, scale = noise_prior_lognormal

        def loss_fn(p):
            nv = P.noise_variance(p)
            # LogNormal(loc, scale) log-pdf up to an additive constant
            z = (jnp.log(nv) - loc) / scale
            log_prior = -0.5 * z * z - jnp.log(nv)
            return -mll(feats, p, train_idx, y, kind=kind) - log_prior

    if optimizer == "lbfgs":
        opt = optax.lbfgs()

        @jax.jit
        def run(p0):
            value_and_grad = optax.value_and_grad_from_state(loss_fn)

            def step(carry, _):
                p, state = carry
                loss, grads = value_and_grad(p, state=state)
                updates, state = opt.update(
                    grads, state, p, value=loss, grad=grads, value_fn=loss_fn
                )
                p = optax.apply_updates(p, updates)
                return (p, state), loss

            (p, _), losses = jax.lax.scan(
                step, (p0, opt.init(p0)), None, length=num_steps
            )
            return p, losses

    else:
        opt = optax.adam(learning_rate)

        @jax.jit
        def run(p0):
            def step(carry, _):
                p, state = carry
                loss, grads = jax.value_and_grad(loss_fn)(p)
                updates, state = opt.update(grads, state, p)
                p = optax.apply_updates(p, updates)
                return (p, state), loss

            (p, _), losses = jax.lax.scan(
                step, (p0, opt.init(p0)), None, length=num_steps
            )
            return p, losses

    trained, losses = run(init)
    return FitResult(params=trained, losses=losses)


def nlpd(post: Posterior, params: Dict, y_test: jnp.ndarray) -> jnp.ndarray:
    """Observation-space negative log predictive density (reference
    ablation_study.py:45-53, wind_experiment.py:314-324)."""
    var = post.var + P.noise_variance(params)
    return jnp.mean(
        0.5 * (_LOG2PI + jnp.log(var) + (y_test - post.mean) ** 2 / var)
    )


def rmse(post: Posterior, y_test: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.mean((y_test - post.mean) ** 2))
