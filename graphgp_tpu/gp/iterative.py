"""Large-N GP inference: CG marginal likelihood + pathwise conditioning.

TPU-native replacement for the reference's GPyTorch stack in CG-only mode
(reference experiments/sparse/scalable_bo/bo_utils/config.py:6-15:
max_cholesky_size=0, cg tolerance 1e-2, Lanczos-quadrature logdet; prediction
via Matheron's rule with batched linear_cg at
efficient_graph_gp_sparse/models/sparse_grf_model.py:21-45).

Everything operates through the Features protocol (Dense/Ell/Log layouts) so
the same code serves consolidated sparse step matrices and raw walk logs. The
train-block Gram matvec is composed from full-graph Φ products:

    K_tt v = (Φ (Φᵀ scatter(v)))[train]      — two sparse ops, no N×N matrix.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..features import Features
from ..linalg import batched_cg, cg_solve, rademacher_probes, slq_logdet
from . import params as P

_LOG2PI = 1.8378770664093453


@dataclasses.dataclass(frozen=True)
class CGSettings:
    """Solver knobs. Defaults mirror the reference parity configuration
    (bo_utils/config.py:6-15): loose tolerance, few probes. Tighten for
    quality runs."""

    cg_tol: float = 1e-2
    cg_max_iters: int = 100
    num_probes: int = 16
    num_lanczos_iters: int = 15


def _expand(v: jnp.ndarray, idx: jnp.ndarray, n: int) -> jnp.ndarray:
    """Scatter rows of v (|idx|, ...) into a zero (n, ...) array."""
    if v.ndim == 1:
        return jnp.zeros((n,), v.dtype).at[idx].set(v)
    return jnp.zeros((n, v.shape[1]), v.dtype).at[idx].set(v)


def make_ktt_matvec(kind: str):
    """Returns ``matvec(carry, v)`` computing ``(K_tt + σ²I) v``.

    The carry is the pytree ``(params, feats, train_idx)`` — every traced
    value rides inside it so the function itself is closure-free w.r.t.
    tracers, as required by the custom-VJP solvers in ..linalg (their
    backward passes differentiate through this carry).
    """

    def matvec(carry, v):
        params, feats, train_idx = carry
        f = P.modulator(kind, params, feats.max_walk_length)
        u = feats.rmatvec(f, _expand(v, train_idx, feats.num_nodes))
        kv = feats.matvec(f, u)[train_idx]
        return kv + P.noise_variance(params) * v

    return matvec


@partial(jax.jit, static_argnames=("kind", "settings"))
def mll_cg(
    feats: Features,
    params: Dict,
    train_idx: jnp.ndarray,
    y: jnp.ndarray,
    key: jax.Array,
    kind: str = "free",
    settings: CGSettings = CGSettings(),
) -> jnp.ndarray:
    """Stochastic estimate of the log marginal likelihood for big N.

    ``-0.5 (yᵀA⁻¹y + logdet A + n log 2π)`` with the quadratic term via a
    differentiable CG solve (implicit-diff VJP) and the logdet via SLQ with
    Rademacher probes (gradient = probe-averaged trace identity). This is the
    estimator GPyTorch's ExactMarginalLogLikelihood computes under forced-CG
    settings (SURVEY §3.2), as two explicit JAX primitives.
    """
    matvec = make_ktt_matvec(kind)
    carry = (params, jax.lax.stop_gradient(feats), train_idx)
    n = y.shape[0]
    alpha = cg_solve(matvec, carry, y, settings.cg_tol, settings.cg_max_iters)
    quad = y @ alpha
    probes = rademacher_probes(key, n, settings.num_probes)
    logdet = slq_logdet(
        matvec,
        carry,
        probes,
        settings.num_lanczos_iters,
        settings.cg_tol,
        settings.cg_max_iters,
    )
    return -0.5 * (quad + logdet + n * _LOG2PI)


@partial(jax.jit, static_argnames=("kind", "num_samples", "settings"))
def pathwise_predict(
    feats: Features,
    params: Dict,
    train_idx: jnp.ndarray,
    y: jnp.ndarray,
    test_idx: jnp.ndarray,
    key: jax.Array,
    kind: str = "free",
    num_samples: int = 64,
    settings: CGSettings = CGSettings(),
) -> jnp.ndarray:
    """Matheron-rule posterior samples at test nodes → (num_samples, n_test).

    Mirrors reference SparseGraphGP.predict (sparse_grf_model.py:21-45):
        f_post(x*) = f_prior(x*) + K*,t (K_tt + σ²I)⁻¹ (y − f_prior(t) − ε)
    with prior function samples f_prior = ε₁ Φᵀ and one batched CG solve for
    all sample paths at once.
    """
    f = P.modulator(kind, params, feats.max_walk_length)
    n = feats.num_nodes
    nt = feats.num_target_nodes
    noise_var = P.noise_variance(params)
    noise_std = jnp.sqrt(noise_var)
    k1, k2 = jax.random.split(key)

    eps1 = jax.random.normal(k1, (nt, num_samples), dtype=jnp.float32)
    prior_all = feats.matvec(f, eps1)  # (N, S) — prior sample paths Φ ε₁
    f_train_prior = prior_all[train_idx]  # (n, S)
    f_test_prior = prior_all[test_idx]  # (n_te, S)
    eps2 = noise_std * jax.random.normal(
        k2, (train_idx.shape[0], num_samples), dtype=jnp.float32
    )

    b = y[:, None] - (f_train_prior + eps2)  # (n, S)
    matvec = make_ktt_matvec(kind)
    v = batched_cg(
        matvec,
        (params, feats, train_idx),
        b,
        tol=settings.cg_tol,
        max_iters=settings.cg_max_iters,
    ).x  # (n, S)

    # K_test,train v = Φ_te Φ_trᵀ v, assembled from full-graph products.
    u = feats.rmatvec(f, _expand(v, train_idx, n))  # (Nt, S)
    correction = feats.matvec(f, u)[test_idx]  # (n_te, S)
    return (f_test_prior + correction).T


class PosteriorSummary(NamedTuple):
    mean: jnp.ndarray
    var: jnp.ndarray


def summarize_samples(samples: jnp.ndarray) -> PosteriorSummary:
    """Mean/variance across pathwise sample axis (reference
    wind_experiment.py:300-309 reduces 200 samples the same way)."""
    return PosteriorSummary(
        mean=jnp.mean(samples, axis=0), var=jnp.maximum(jnp.var(samples, axis=0), 1e-12)
    )


@dataclasses.dataclass
class FitResult:
    params: Dict
    losses: jnp.ndarray


def fit(
    feats: Features,
    train_idx: jnp.ndarray,
    y: jnp.ndarray,
    *,
    kind: str = "free",
    key: Optional[jax.Array] = None,
    init: Optional[Dict] = None,
    learning_rate: float = 0.1,
    num_steps: int = 50,
    settings: CGSettings = CGSettings(),
) -> FitResult:
    """Adam ascent of the CG marginal likelihood (reference protocol: Adam
    lr=0.1, 50 epochs — run_scaling_experiment.py:606-611)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    k_init, k_loop = jax.random.split(key)
    if init is None:
        init = P.init_params(kind, feats.max_walk_length, k_init)
    opt = optax.adam(learning_rate)

    @jax.jit
    def run(p0):
        def step(carry, step_key):
            p, state = carry
            loss, grads = jax.value_and_grad(
                lambda q: -mll_cg(
                    feats, q, train_idx, y, step_key, kind=kind, settings=settings
                )
            )(p)
            updates, state = opt.update(grads, state, p)
            p = optax.apply_updates(p, updates)
            return (p, state), loss

        keys = jax.random.split(k_loop, num_steps)
        (p, _), losses = jax.lax.scan(step, (p0, opt.init(p0)), keys)
        return p, losses

    trained, losses = run(init)
    return FitResult(params=trained, losses=losses)
