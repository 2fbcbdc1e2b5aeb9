"""Hyperparameter pytrees & transforms for GRF graph-GP models.

One parameterization layer replaces the reference's four adapter stacks
(GPflow Parameter/positive transforms in gpflow_kernels/*, GPyTorch
raw_*/constraint pairs in gptorch_kernels_sparse/*):

  * ``kind='free'``: learnable modulator vector f directly (reference
    general_kernel_fast_grf.py:31-41, sparse_grf_kernel.py:13-22).
  * ``kind='diffusion'``: f = σ_f · Taylor(exp(-βL/2)) with β, σ_f > 0 via
    softplus (reference diffusion_kernel_fast_grf.py, sparse_diffusion_kernel.py).

Noise is always softplus-positive, floored for numerical safety.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..modulators import diffusion_modulator, inv_softplus

NOISE_FLOOR = 1e-6


def init_params(
    kind: str,
    max_walk_length: int,
    key: jax.Array,
    noise: float = 0.1,
    beta: float = 1.0,
    sigma_f: float = 1.0,
) -> Dict[str, jnp.ndarray]:
    """Initial parameter pytree. ``noise`` is the initial noise *std*."""
    params = {"raw_noise": inv_softplus(jnp.asarray(noise, jnp.float32) ** 2)}
    if kind == "free":
        params["modulator"] = jax.random.normal(
            key, (max_walk_length,), dtype=jnp.float32
        )
    elif kind in ("diffusion", "exact_diffusion"):
        params["raw_beta"] = inv_softplus(jnp.asarray(beta, jnp.float32))
        params["raw_sigma_f"] = inv_softplus(jnp.asarray(sigma_f, jnp.float32))
    else:
        raise ValueError(
            f"unknown kernel kind {kind!r} "
            "(want 'free'|'diffusion'|'exact_diffusion')"
        )
    return params


def modulator(kind: str, params: Dict[str, jnp.ndarray], max_walk_length: int):
    if kind == "free":
        return params["modulator"]
    if kind == "exact_diffusion":
        # Spectral layouts (gp.spectral.SpectralDiffusionFeatures) interpret
        # the "modulator" as the raw (β, σ_f) pair and apply exp(-βλ/2) on
        # the eigenvalues themselves — the exact kernel, no Taylor basis.
        return jnp.stack(
            [
                jax.nn.softplus(params["raw_beta"]),
                jax.nn.softplus(params["raw_sigma_f"]),
            ]
        )
    if kind != "diffusion":
        raise ValueError(
            f"unknown kernel kind {kind!r} "
            "(want 'free'|'diffusion'|'exact_diffusion')"
        )
    beta = jax.nn.softplus(params["raw_beta"])
    sigma_f = jax.nn.softplus(params["raw_sigma_f"])
    return sigma_f * diffusion_modulator(max_walk_length, beta)


def noise_variance(params: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    return jax.nn.softplus(params["raw_noise"]) + NOISE_FLOOR


def describe(kind: str, params, max_walk_length: int) -> dict:
    """Host-side readable summary (for result CSVs / logging)."""
    out = {"noise_variance": float(noise_variance(params))}
    if kind == "free":
        out["modulator_norm"] = float(jnp.linalg.norm(params["modulator"]))
    else:
        out["beta"] = float(jax.nn.softplus(params["raw_beta"]))
        out["sigma_f"] = float(jax.nn.softplus(params["raw_sigma_f"]))
    return out
