"""Modulator functions f_l weighting the step matrices.

The diffusion modulator is the Taylor series of ``exp(-βL/2)``:
``f_l = (-β)^l / (2^l · l!)`` so that ``ΦΦᵀ ≈ exp(-βL)`` (reference:
efficient_graph_gp/modulation_functions/diffusion_modulator.py:3-6 and the
lgamma variants diffusion_modulator_tf.py:3-9,
efficient_graph_gp_sparse/gptorch_kernels_sparse/sparse_diffusion_kernel.py:6-24).

All functions are jit/grad-friendly: β can be a traced scalar.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def diffusion_modulator(max_walk_length: int, beta: jnp.ndarray) -> jnp.ndarray:
    """``f_l = (-β)^l / (2^l l!)`` for l = 0..max_walk_length-1.

    Computed in log space (lgamma) with an explicit sign so gradients flow
    through β without overflow for long expansions.
    """
    l = jnp.arange(max_walk_length, dtype=jnp.float32)
    beta = jnp.asarray(beta, jnp.float32)
    log_mag = l * jnp.log(jnp.maximum(jnp.abs(beta), 1e-30)) - l * jnp.log(2.0) - jax.lax.lgamma(l + 1.0)
    sign = jnp.where(jnp.asarray(beta) >= 0, (-1.0) ** l, 1.0)
    return sign * jnp.exp(log_mag)


def free_modulator_init(key: jax.Array, max_walk_length: int) -> jnp.ndarray:
    """Random-normal init for a learnable modulator vector.

    Mirrors the reference's ``np.random.randn`` / ``torch.randn`` inits
    (gpflow_kernels/general_kernel_fast_grf.py:31-41,
    gptorch_kernels_sparse/sparse_grf_kernel.py:13-22) but keyed explicitly.
    """
    return jax.random.normal(key, (max_walk_length,), dtype=jnp.float32)


def geometric_modulator(max_walk_length: int, rho: jnp.ndarray) -> jnp.ndarray:
    """``f_l = rho^l`` — the geometric-series family (extra capability)."""
    l = jnp.arange(max_walk_length, dtype=jnp.float32)
    return jnp.asarray(rho, jnp.float32) ** l


def softplus(x):
    return jax.nn.softplus(x)


def inv_softplus(y):
    """Inverse of softplus for parameter initialization (y > 0)."""
    y = jnp.asarray(y, jnp.float32)
    return y + jnp.log(-jnp.expm1(-y))
