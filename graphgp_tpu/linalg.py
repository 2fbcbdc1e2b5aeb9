"""Iterative linear algebra for large-N GP inference.

TPU-native replacement for the GPyTorch/linear_operator stack the reference
leans on (reference: experiments/sparse/scalable_bo/bo_utils/config.py:6-15
forces max_cholesky_size=0 so *everything* is conjugate gradients + stochastic
Lanczos quadrature; prediction solves use linear_cg at
efficient_graph_gp_sparse/models/sparse_grf_model.py:43).

Everything here is a pure function over a user-supplied
``matvec(params, v)`` closure-free callable, with:
  * batched CG under ``lax.while_loop`` (static max iters, tolerance mask),
  * Lanczos tridiagonalization under ``lax.scan`` (full reorthogonalization
    optional — m is small),
  * SLQ logdet with Rademacher probes,
  * custom VJPs so that CG solves and SLQ logdets are differentiable w.r.t.
    kernel hyperparameters *without* unrolling the iteration through autodiff
    (adjoint solves instead — the same trick GPyTorch implements in torch).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

Matvec = Callable[[Any, jnp.ndarray], jnp.ndarray]


class CGResult(NamedTuple):
    x: jnp.ndarray
    iterations: jnp.ndarray
    residual_norm: jnp.ndarray


def batched_cg(
    matvec: Matvec,
    params: Any,
    b: jnp.ndarray,
    *,
    tol: float = 1e-2,
    max_iters: int = 100,
    precond: Optional[Matvec] = None,
    x0: Optional[jnp.ndarray] = None,
) -> CGResult:
    """Batched preconditioned conjugate gradients.

    b: (N,) or (N, B) — each column solved independently but in lockstep
    (one fused matvec per iteration; this is what makes pathwise-conditioning
    prediction with 64+ samples cheap, reference sparse_grf_model.py:42-43).

    The loop is a ``lax.while_loop`` with a static ``max_iters`` bound; columns
    that have converged are frozen via masks so late columns don't pollute
    early ones.
    """
    single = b.ndim == 1
    if single:
        b = b[:, None]
    x = jnp.zeros_like(b) if x0 is None else (x0[:, None] if single else x0)
    r = b - matvec(params, x)
    z = r if precond is None else precond(params, r)
    p = z
    rz = jnp.sum(r * z, axis=0)  # (B,)
    b_norm = jnp.maximum(jnp.linalg.norm(b, axis=0), 1e-30)

    def cond(state):
        x, r, z, p, rz, it = state
        res = jnp.linalg.norm(r, axis=0) / b_norm
        return (it < max_iters) & jnp.any(res > tol)

    def body(state):
        x, r, z, p, rz, it = state
        ap = matvec(params, p)
        denom = jnp.sum(p * ap, axis=0)
        alpha = jnp.where(denom != 0, rz / jnp.where(denom != 0, denom, 1.0), 0.0)
        active = (jnp.linalg.norm(r, axis=0) / b_norm) > tol
        alpha = jnp.where(active, alpha, 0.0)
        x = x + alpha[None, :] * p
        r = r - alpha[None, :] * ap
        z_new = r if precond is None else precond(params, r)
        rz_new = jnp.sum(r * z_new, axis=0)
        beta = jnp.where(rz != 0, rz_new / jnp.where(rz != 0, rz, 1.0), 0.0)
        p = z_new + beta[None, :] * p
        return (x, r, z_new, p, rz_new, it + 1)

    x, r, _, _, _, it = jax.lax.while_loop(cond, body, (x, r, z, p, rz, 0))
    res = jnp.linalg.norm(r, axis=0) / b_norm
    if single:
        return CGResult(x[:, 0], it, res[0])
    return CGResult(x, it, res)


# ---------------------------------------------------------------------------
# Differentiable CG solve: implicit-function-theorem VJP.
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(0, 3, 4))
def cg_solve(
    matvec: Matvec,
    params: Any,
    b: jnp.ndarray,
    tol: float = 1e-4,
    max_iters: int = 200,
) -> jnp.ndarray:
    """``x = A(params)^{-1} b`` with adjoint-solve gradients.

    VJP: given cotangent g, solve ``u = A^{-1} g`` (A symmetric), then
    ``d params = -vjp_of_matvec_at_x(u)`` and ``d b = u``.
    """
    return batched_cg(matvec, params, b, tol=tol, max_iters=max_iters).x


def _cg_solve_fwd(matvec, params, b, tol, max_iters):
    x = batched_cg(matvec, params, b, tol=tol, max_iters=max_iters).x
    return x, (params, x)


def _cg_solve_bwd(matvec, tol, max_iters, residuals, g):
    params, x = residuals
    u = batched_cg(matvec, params, g, tol=tol, max_iters=max_iters).x
    # dL/dparams = -u^T (dA/dparams) x  via vjp of v ↦ matvec(params, v) at x
    _, vjp_fn = jax.vjp(lambda p: matvec(p, x), params)
    (dparams,) = vjp_fn(-u)
    return dparams, u


cg_solve.defvjp(_cg_solve_fwd, _cg_solve_bwd)


# ---------------------------------------------------------------------------
# Lanczos + stochastic Lanczos quadrature logdet.
# ---------------------------------------------------------------------------


def lanczos(
    matvec: Matvec,
    params: Any,
    v0: jnp.ndarray,
    num_iters: int,
    *,
    reorthogonalize: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lanczos tridiagonalization of symmetric A from start vector v0.

    v0: (N,) or (N, B) batch of start vectors (independent Krylov spaces,
    lockstep matvecs). Returns (alphas (m[, B]), betas (m-1[, B])).
    """
    single = v0.ndim == 1
    if single:
        v0 = v0[:, None]
    n, b = v0.shape
    q = v0 / jnp.maximum(jnp.linalg.norm(v0, axis=0, keepdims=True), 1e-30)

    def step(carry, _):
        q_prev, q_cur, beta_prev, basis, k = carry
        w = matvec(params, q_cur)
        alpha = jnp.sum(q_cur * w, axis=0)
        w = w - alpha[None, :] * q_cur - beta_prev[None, :] * q_prev
        if reorthogonalize:
            # full reorthogonalization against stored basis (m is small)
            proj = jnp.einsum("mnb,nb->mb", basis, w)
            w = w - jnp.einsum("mnb,mb->nb", basis, proj)
        beta = jnp.linalg.norm(w, axis=0)
        q_next = w / jnp.maximum(beta[None, :], 1e-30)
        basis = basis.at[k].set(q_cur)
        return (q_cur, q_next, beta, basis, k + 1), (alpha, beta)

    basis0 = jnp.zeros((num_iters, n, b), dtype=v0.dtype)
    init = (jnp.zeros_like(q), q, jnp.zeros((b,), v0.dtype), basis0, 0)
    _, (alphas, betas) = jax.lax.scan(step, init, None, length=num_iters)
    if single:
        return alphas[:, 0], betas[:-1, 0]
    return alphas, betas[:-1]


def _slq_from_tridiag(alphas, betas, norms_sq, n_probes):
    """Quadrature: logdet ≈ mean_p ||z_p||² · Σ_i w_i log λ_i(T_p)."""
    m = alphas.shape[0]

    def one(alpha, beta, nsq):
        t = (
            jnp.diag(alpha)
            + jnp.diag(beta, 1)
            + jnp.diag(beta, -1)
        )
        evals, evecs = jnp.linalg.eigh(t)
        weights = evecs[0, :] ** 2
        evals = jnp.maximum(evals, 1e-10)
        return nsq * jnp.sum(weights * jnp.log(evals))

    vals = jax.vmap(one, in_axes=(1, 1, 0))(alphas, betas, norms_sq)
    return jnp.mean(vals)


def _slq_forward(matvec, params, probes, num_lanczos_iters):
    alphas, betas = lanczos(matvec, params, probes, num_lanczos_iters)
    norms_sq = jnp.sum(probes * probes, axis=0)
    return _slq_from_tridiag(alphas, betas, norms_sq, probes.shape[1])


@partial(jax.custom_vjp, nondiff_argnums=(0, 3, 4, 5))
def slq_logdet(
    matvec: Matvec,
    params: Any,
    probes: jnp.ndarray,
    num_lanczos_iters: int = 20,
    solver_tol: float = 1e-3,
    solver_max_iters: int = 200,
) -> jnp.ndarray:
    """Stochastic Lanczos quadrature estimate of ``logdet A(params)``.

    probes: (N, P) Rademacher (±1) probe vectors.
    Gradient: ``d logdet = E_z[z^T A^{-1} (dA) z]`` — backward runs CG solves
    of the probes (GPyTorch's strategy, done here with a JAX custom VJP).
    """
    return _slq_forward(matvec, params, probes, num_lanczos_iters)


def _slq_fwd(matvec, params, probes, num_lanczos_iters, solver_tol, solver_max_iters):
    # NB: custom_vjp fwd receives args in their ORIGINAL positions (nondiff
    # included); only the bwd gets nondiff args as leading arguments.
    val = _slq_forward(matvec, params, probes, num_lanczos_iters)
    return val, (params, probes)


def _slq_bwd(matvec, num_lanczos_iters, solver_tol, solver_max_iters, residuals, g):
    params, probes = residuals
    solves = batched_cg(
        matvec, params, probes, tol=solver_tol, max_iters=solver_max_iters
    ).x  # (N, P)
    p = probes.shape[1]

    # d logdet/d params = (1/P) Σ_p (A^{-1} z_p)^T (dA/dparams) z_p
    def quad(pp):
        av = matvec(pp, probes)  # (N, P)
        return jnp.sum(solves * av) / p

    # jax.vjp (not jax.grad): params may contain integer leaves (e.g. node
    # index arrays riding in the matvec carry) which get float0 cotangents.
    _, vjp_fn = jax.vjp(quad, params)
    (dparams,) = vjp_fn(g)
    dprobes = jnp.zeros_like(probes)
    return dparams, dprobes


slq_logdet.defvjp(_slq_fwd, _slq_bwd)


def rademacher_probes(key: jax.Array, n: int, num_probes: int) -> jnp.ndarray:
    return jax.random.rademacher(key, (n, num_probes), dtype=jnp.float32)


# ---------------------------------------------------------------------------
# Small-N dense helpers.
# ---------------------------------------------------------------------------


def cholesky_solve(chol: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve ``A x = b`` given lower Cholesky of A."""
    y = jax.scipy.linalg.solve_triangular(chol, b, lower=True)
    return jax.scipy.linalg.solve_triangular(chol.T, y, lower=False)


def safe_cholesky(a: jnp.ndarray, jitter: float = 1e-6) -> jnp.ndarray:
    n = a.shape[0]
    return jnp.linalg.cholesky(a + jitter * jnp.eye(n, dtype=a.dtype))
