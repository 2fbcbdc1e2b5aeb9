"""Exact spectral diffusion-kernel GP (trainable β, σ_f over the eigenbasis).

Equivalent of the reference's exact-kernel GPflow adapter
(gpflow_kernels/diffusion_kernel_exact.py:6-46: ``σ_f² expm(-βL)`` with
learnable positive β, σ_f, node-index gathers) — TPU-first: one eigh of L up
front, then every MLL evaluation is ``K = Q diag(σ_f² e^{-βλ}) Qᵀ`` — a
differentiable elementwise-exp + two matmuls, no expm, no re-decomposition.

Spectral features Φ = Q diag(σ_f e^{-βλ/2}) satisfy K = ΦΦᵀ exactly, so this
is the zero-variance limit of the GRF feature stack.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..graphs import normalized_laplacian
from ..linalg import cholesky_solve, safe_cholesky
from ..modulators import inv_softplus
from . import params as P
from .exact import Posterior, _LOG2PI


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Eigenbasis:
    evals: jnp.ndarray  # (N,)
    evecs: jnp.ndarray  # (N, N) columns are eigenvectors


def eigenbasis(adj) -> Eigenbasis:
    """Eigendecomposition of the normalized Laplacian (float32 eigh)."""
    import scipy.sparse as sp
    import numpy as np

    adj_dense = adj.toarray() if sp.issparse(adj) else np.asarray(adj)
    lap = normalized_laplacian(jnp.asarray(adj_dense, jnp.float32))
    evals, evecs = jnp.linalg.eigh(lap)
    return Eigenbasis(evals=evals, evecs=evecs)


def init_params(noise: float = 0.1, beta: float = 1.0, sigma_f: float = 1.0) -> Dict:
    return {
        "raw_noise": inv_softplus(jnp.asarray(noise, jnp.float32) ** 2),
        "raw_beta": inv_softplus(jnp.asarray(beta, jnp.float32)),
        "raw_sigma_f": inv_softplus(jnp.asarray(sigma_f, jnp.float32)),
    }


def _spectral_phi(eig: Eigenbasis, params: Dict) -> jnp.ndarray:
    beta = jax.nn.softplus(params["raw_beta"])
    sigma_f = jax.nn.softplus(params["raw_sigma_f"])
    return eig.evecs * (sigma_f * jnp.exp(-0.5 * beta * eig.evals))[None, :]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SpectralDiffusionFeatures:
    """Features-protocol adapter for the EXACT diffusion kernel: Φ(β,σ_f) =
    Q diag(σ_f e^{-βλ/2}), so K = ΦΦᵀ = σ_f² expm(-βL) exactly with β, σ_f
    trainable. Lets the SVGP stack (gp/svgp.py) run the reference's
    exact-kernel Cora variant (classification_multiple_diff.ipynb /
    gpflow_kernels/diffusion_kernel_exact.py:6-46): use with
    ``kind='exact_diffusion'``, whose "modulator" is the (β, σ_f) pair
    (gp/params.modulator) applied here on the eigenvalues — no Taylor
    truncation anywhere."""

    eig: Eigenbasis

    @property
    def num_nodes(self) -> int:
        return self.eig.evecs.shape[0]

    @property
    def num_target_nodes(self) -> int:
        return self.eig.evecs.shape[0]

    @property
    def max_walk_length(self) -> int:
        # length of the (β, σ_f) "modulator" vector for this kind
        return 2

    def _phi(self, f: jnp.ndarray) -> jnp.ndarray:
        beta, sigma_f = f[0], f[1]
        return self.eig.evecs * (
            sigma_f * jnp.exp(-0.5 * beta * self.eig.evals)
        )[None, :]

    def rows(self, f, idx):
        return self._phi(f)[idx]

    def matvec(self, f, v):
        return self._phi(f) @ v

    def rmatvec(self, f, v):
        return self._phi(f).T @ v

    def matvec_bm(self, f, v):
        return v @ self._phi(f).T

    def rmatvec_bm(self, f, v):
        return v @ self._phi(f)


@jax.jit
def mll(eig: Eigenbasis, params: Dict, train_idx: jnp.ndarray, y: jnp.ndarray):
    phi_t = _spectral_phi(eig, params)[train_idx]
    k_tt = phi_t @ phi_t.T
    n = y.shape[0]
    a = k_tt + P.noise_variance(params) * jnp.eye(n, dtype=k_tt.dtype)
    chol = safe_cholesky(a, jitter=1e-6)
    alpha = cholesky_solve(chol, y)
    return -0.5 * (
        y @ alpha + 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol))) + n * _LOG2PI
    )


@jax.jit
def predict(
    eig: Eigenbasis,
    params: Dict,
    train_idx: jnp.ndarray,
    y: jnp.ndarray,
    test_idx: jnp.ndarray,
) -> Posterior:
    phi = _spectral_phi(eig, params)
    phi_tr, phi_te = phi[train_idx], phi[test_idx]
    k_tt = phi_tr @ phi_tr.T
    n = train_idx.shape[0]
    a = k_tt + P.noise_variance(params) * jnp.eye(n, dtype=k_tt.dtype)
    chol = safe_cholesky(a, jitter=1e-6)
    alpha = cholesky_solve(chol, y)
    k_st = phi_te @ phi_tr.T
    mean = k_st @ alpha
    v = jax.scipy.linalg.solve_triangular(chol, k_st.T, lower=True)
    var = jnp.maximum(jnp.sum(phi_te * phi_te, -1) - jnp.sum(v * v, 0), 1e-12)
    return Posterior(mean=mean, var=var)


@dataclasses.dataclass
class FitResult:
    params: Dict
    losses: jnp.ndarray


def fit(
    eig: Eigenbasis,
    train_idx: jnp.ndarray,
    y: jnp.ndarray,
    *,
    init: Optional[Dict] = None,
    learning_rate: float = 0.05,
    num_steps: int = 200,
) -> FitResult:
    params = init or init_params()
    opt = optax.adam(learning_rate)

    @jax.jit
    def run(p0):
        def step(carry, _):
            p, state = carry
            loss, grads = jax.value_and_grad(
                lambda q: -mll(eig, q, train_idx, y)
            )(p)
            updates, state = opt.update(grads, state, p)
            return (optax.apply_updates(p, updates), state), loss

        (p, _), losses = jax.lax.scan(step, (p0, opt.init(p0)), None, length=num_steps)
        return p, losses

    trained, losses = run(params)
    return FitResult(params=trained, losses=losses)
