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

# Pytree node types whose array leaves are structurally NON-differentiable
# (fixed MC-sampled step matrices). The adjoint rules below take an inner
# jax.vjp through the full matvec carry; stopping these nodes first (a)
# avoids tripping the feature ops' loud perturbation check (features.py
# _assert_unperturbed) and (b) documents that their cotangents are discarded
# by design. features.py registers its layout dataclasses on import.
_NONDIFF_TYPES: tuple = ()


def register_nondiff_type(cls) -> None:
    global _NONDIFF_TYPES
    if cls not in _NONDIFF_TYPES:
        _NONDIFF_TYPES = _NONDIFF_TYPES + (cls,)


def _stop_nondiff(tree):
    if not _NONDIFF_TYPES:
        return tree

    def visit(node):
        if isinstance(node, _NONDIFF_TYPES):
            return jax.tree_util.tree_map(jax.lax.stop_gradient, node)
        return node

    return jax.tree_util.tree_map(
        visit, tree, is_leaf=lambda x: isinstance(x, _NONDIFF_TYPES)
    )


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
    batch_axis: int = 1,
) -> CGResult:
    """Batched preconditioned conjugate gradients.

    b: (N,), (N, B) with ``batch_axis=1`` (column-major, the historical
    convention) or (B, N) with ``batch_axis=0`` (batch-major). Each system is
    solved independently but in lockstep — one fused matvec per iteration;
    this is what makes pathwise-conditioning prediction with 64+ samples
    cheap (reference sparse_grf_model.py:42-43). ``matvec`` must follow the
    same convention as ``b``.

    Prefer ``batch_axis=0`` on TPU for small batches: the minor dimension is
    padded to the 128-lane vector width, so (N, 8) column-major state
    physically occupies 16× its logical bytes and every loop op pays that
    (measured 40× end-to-end on the N=1e6 stencil CG).

    The loop is a ``lax.while_loop`` with a static ``max_iters`` bound;
    systems that have converged are frozen via masks so late ones don't
    pollute early ones.
    """
    single = b.ndim == 1
    if single:
        # Honor batch_axis for the internal layout: a (1, N) row keeps the
        # long axis on the 128 lanes; a (N, 1) column pads 1 → 128.
        expand = (lambda v: v[None, :]) if batch_axis == 0 else (lambda v: v[:, None])
        b = expand(b)
    red = 1 - batch_axis  # the N axis
    bcast = (lambda s: s[None, :]) if batch_axis == 1 else (lambda s: s[:, None])
    x = jnp.zeros_like(b) if x0 is None else (expand(x0) if single else x0)
    r = b - matvec(params, x)
    z = r if precond is None else precond(params, r)
    p = z
    rz = jnp.sum(r * z, axis=red)  # (B,)
    # ‖r‖² carried in state: with no preconditioner it equals rz (free); the
    # preconditioned path pays one extra reduction per body. cond() reads the
    # carried value — recomputing the norm in BOTH cond and body cost two
    # full (B, N) HBM passes per iteration at the 1e6-node flagship.
    rr = rz if precond is None else jnp.sum(r * r, axis=red)
    b_norm = jnp.maximum(jnp.linalg.norm(b, axis=red), 1e-30)

    def res_of(rr):
        return jnp.sqrt(jnp.maximum(rr, 0.0)) / b_norm

    def cond(state):
        x, r, z, p, rz, rr, it = state
        return (it < max_iters) & jnp.any(res_of(rr) > tol)

    def body(state):
        x, r, z, p, rz, rr, it = state
        ap = matvec(params, p)
        denom = jnp.sum(p * ap, axis=red)
        alpha = jnp.where(denom != 0, rz / jnp.where(denom != 0, denom, 1.0), 0.0)
        active = res_of(rr) > tol
        alpha = jnp.where(active, alpha, 0.0)
        x = x + bcast(alpha) * p
        r = r - bcast(alpha) * ap
        z_new = r if precond is None else precond(params, r)
        rz_new = jnp.sum(r * z_new, axis=red)
        rr_new = rz_new if precond is None else jnp.sum(r * r, axis=red)
        beta = jnp.where(rz != 0, rz_new / jnp.where(rz != 0, rz, 1.0), 0.0)
        p = z_new + bcast(beta) * p
        return (x, r, z_new, p, rz_new, rr_new, it + 1)

    x, r, _, _, _, rr, it = jax.lax.while_loop(
        cond, body, (x, r, z, p, rz, rr, 0)
    )
    res = res_of(rr)
    if single:
        return CGResult(x[0] if batch_axis == 0 else x[:, 0], it, res[0])
    return CGResult(x, it, res)


# ---------------------------------------------------------------------------
# Differentiable CG solve: implicit-function-theorem VJP.
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(0, 3, 4, 5))
def cg_solve(
    matvec: Matvec,
    params: Any,
    b: jnp.ndarray,
    tol: float = 1e-4,
    max_iters: int = 200,
    batch_axis: int = 1,
) -> jnp.ndarray:
    """``x = A(params)^{-1} b`` with adjoint-solve gradients.

    ``batch_axis`` selects the matvec/layout convention (see batched_cg);
    single vectors are solved internally in that layout too.

    VJP: given cotangent g, solve ``u = A^{-1} g`` (A symmetric), then
    ``d params = -vjp_of_matvec_at_x(u)`` and ``d b = u``.
    """
    return batched_cg(
        matvec, params, b, tol=tol, max_iters=max_iters, batch_axis=batch_axis
    ).x


def _cg_solve_fwd(matvec, params, b, tol, max_iters, batch_axis):
    x = batched_cg(
        matvec, params, b, tol=tol, max_iters=max_iters, batch_axis=batch_axis
    ).x
    return x, (params, x)


def _cg_solve_bwd(matvec, tol, max_iters, batch_axis, residuals, g):
    params, x = residuals
    u = batched_cg(
        matvec, params, g, tol=tol, max_iters=max_iters, batch_axis=batch_axis
    ).x
    # dL/dparams = -u^T (dA/dparams) x  via vjp of v ↦ matvec(params, v) at x
    _, vjp_fn = jax.vjp(lambda p: matvec(_stop_nondiff(p), x), params)
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
    batch_axis: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lanczos tridiagonalization of symmetric A from start vector v0.

    v0: (N,), (N, B) with ``batch_axis=1``, or (B, N) with ``batch_axis=0``
    (independent Krylov spaces, lockstep matvecs; see batched_cg for why
    batch-major wins on TPU — the stored basis is (m, B, N) there instead of
    a 16×-padded (m, N, B)). Returns (alphas (m[, B]), betas (m-1[, B])).
    """
    single = v0.ndim == 1
    if single:
        v0 = v0[:, None]
        batch_axis = 1
    red = 1 - batch_axis
    bcast = (lambda s: s[None, :]) if batch_axis == 1 else (lambda s: s[:, None])
    b = v0.shape[batch_axis]
    q = v0 / jnp.maximum(jnp.linalg.norm(v0, axis=red, keepdims=True), 1e-30)
    proj_in, proj_out = (
        ("mnb,nb->mb", "mnb,mb->nb") if batch_axis == 1 else ("mbn,bn->mb", "mbn,mb->bn")
    )

    def step(carry, _):
        q_prev, q_cur, beta_prev, basis, k = carry
        w = matvec(params, q_cur)
        alpha = jnp.sum(q_cur * w, axis=red)
        w = w - bcast(alpha) * q_cur - bcast(beta_prev) * q_prev
        if reorthogonalize:
            # full reorthogonalization against stored basis (m is small)
            proj = jnp.einsum(proj_in, basis, w)
            w = w - jnp.einsum(proj_out, basis, proj)
        beta = jnp.linalg.norm(w, axis=red)
        q_next = w / jnp.maximum(bcast(beta), 1e-30)
        basis = basis.at[k].set(q_cur)
        return (q_cur, q_next, beta, basis, k + 1), (alpha, beta)

    basis0 = jnp.zeros((num_iters,) + v0.shape, dtype=v0.dtype)
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


def _slq_forward(matvec, params, probes, num_lanczos_iters, batch_axis):
    alphas, betas = lanczos(
        matvec, params, probes, num_lanczos_iters, batch_axis=batch_axis
    )
    norms_sq = jnp.sum(probes * probes, axis=1 - batch_axis)
    return _slq_from_tridiag(alphas, betas, norms_sq, probes.shape[batch_axis])


@partial(jax.custom_vjp, nondiff_argnums=(0, 3, 4, 5, 6))
def slq_logdet(
    matvec: Matvec,
    params: Any,
    probes: jnp.ndarray,
    num_lanczos_iters: int = 20,
    solver_tol: float = 1e-3,
    solver_max_iters: int = 200,
    batch_axis: int = 1,
) -> jnp.ndarray:
    """Stochastic Lanczos quadrature estimate of ``logdet A(params)``.

    probes: Rademacher (±1) probe vectors — (N, P) with ``batch_axis=1``,
    (P, N) with ``batch_axis=0`` (batch-major; the TPU-preferred layout,
    see batched_cg). ``matvec`` must follow the same convention.
    Gradient: ``d logdet = E_z[z^T A^{-1} (dA) z]`` — backward runs CG solves
    of the probes (GPyTorch's strategy, done here with a JAX custom VJP).
    """
    return _slq_forward(matvec, params, probes, num_lanczos_iters, batch_axis)


def _slq_fwd(
    matvec, params, probes, num_lanczos_iters, solver_tol, solver_max_iters,
    batch_axis,
):
    # NB: custom_vjp fwd receives args in their ORIGINAL positions (nondiff
    # included); only the bwd gets nondiff args as leading arguments.
    val = _slq_forward(matvec, params, probes, num_lanczos_iters, batch_axis)
    return val, (params, probes)


def _slq_bwd(
    matvec, num_lanczos_iters, solver_tol, solver_max_iters, batch_axis,
    residuals, g,
):
    params, probes = residuals
    solves = batched_cg(
        matvec, params, probes, tol=solver_tol, max_iters=solver_max_iters,
        batch_axis=batch_axis,
    ).x
    p = probes.shape[batch_axis]

    # d logdet/d params = (1/P) Σ_p (A^{-1} z_p)^T (dA/dparams) z_p
    def quad(pp):
        av = matvec(_stop_nondiff(pp), probes)  # (N, P)
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
