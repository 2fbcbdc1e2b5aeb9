"""Pallas stencil-product kernels vs the XLA roll chain (interpret mode on
the CPU test platform; the hardware path shares the same kernel body)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphgp_tpu.features import (
    StencilStepMatrices,
    stencil_phi_matvec_bm,
    stencil_phi_rmatvec_bm,
)
from graphgp_tpu.pallas_kernels import stencil as ps


def _random_stencil(n, s, l, seed=0, big_offsets=False):
    rng = np.random.default_rng(seed)
    if big_offsets:
        # include wraparound-style offsets (ring graph N-1 ≡ -1)
        offs = np.unique(
            np.concatenate([[0, 1, n - 1], rng.integers(0, n, s)])
        )[:s]
    else:
        offs = np.unique(rng.integers(-5, 6, s))
    vals = rng.normal(size=(l, offs.size, n)).astype(np.float32)
    return StencilStepMatrices(vals=jnp.asarray(vals), offsets=offs.astype(np.int64))


@pytest.mark.parametrize("big_offsets", [False, True])
def test_matvec_matches_roll_chain(big_offsets):
    n, b = 640, 4
    mats = _random_stencil(n, 9, 3, seed=1, big_offsets=big_offsets)
    f = jnp.asarray([1.0, -0.5, 0.25])
    w = jnp.einsum("l,lsn->sn", f, mats.vals)
    v = jnp.asarray(
        np.random.default_rng(2).normal(size=(b, n)).astype(np.float32)
    )
    ref = stencil_phi_matvec_bm(mats, f, v)
    assert ps.pallas_applicable(n, mats.num_offsets, mats.offsets)
    out = ps.matvec_bm(w, v, mats.offsets, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def _wshift(w, offsets, n):
    return ps.shifted_weights(w, ps.center_offsets(offsets, n))


@pytest.mark.parametrize("big_offsets", [False, True])
def test_rmatvec_matches_roll_chain(big_offsets):
    n, b = 640, 4
    mats = _random_stencil(n, 9, 3, seed=3, big_offsets=big_offsets)
    f = jnp.asarray([0.7, 0.3, -0.2])
    w = jnp.einsum("l,lsn->sn", f, mats.vals)
    v = jnp.asarray(
        np.random.default_rng(4).normal(size=(b, n)).astype(np.float32)
    )
    ref = stencil_phi_rmatvec_bm(mats, f, v)
    out = ps.rmatvec_bm(_wshift(w, mats.offsets, n), v, mats.offsets, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_nondivisible_n_and_batch_chunking():
    n = 515  # not a lane multiple; exercises the zero tail
    mats = _random_stencil(n, 7, 2, seed=5)
    f = jnp.asarray([1.0, 0.5])
    w = jnp.einsum("l,lsn->sn", f, mats.vals)
    b = ps._MAX_BATCH + 3  # forces the chunked launch
    v = jnp.asarray(
        np.random.default_rng(6).normal(size=(b, n)).astype(np.float32)
    )
    ref_m = stencil_phi_matvec_bm(mats, f, v)
    ref_r = stencil_phi_rmatvec_bm(mats, f, v)
    np.testing.assert_allclose(
        np.asarray(ps.matvec_bm(w, v, mats.offsets, interpret=True)),
        np.asarray(ref_m), atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(
            ps.rmatvec_bm(_wshift(w, mats.offsets, n), v, mats.offsets, interpret=True)
        ),
        np.asarray(ref_r), atol=1e-4,
    )


def test_gradients_match_roll_chain():
    """custom_vjp duals: grads w.r.t. w and v equal the XLA chain's."""
    n, b = 384, 3
    mats = _random_stencil(n, 6, 2, seed=7)
    f = jnp.asarray([0.9, -0.4])
    w0 = jnp.einsum("l,lsn->sn", f, mats.vals)
    v0 = jnp.asarray(
        np.random.default_rng(8).normal(size=(b, n)).astype(np.float32)
    )
    g_out = jnp.asarray(
        np.random.default_rng(9).normal(size=(b, n)).astype(np.float32)
    )

    def loss_pallas(w, v):
        m = ps.matvec_bm(w, v, mats.offsets, interpret=True)
        ws = _wshift(w, mats.offsets, m.shape[-1])
        r = ps.rmatvec_bm(ws, m, mats.offsets, interpret=True)
        return jnp.sum(r * g_out)

    def loss_roll(w, v):
        ww = StencilStepMatrices(vals=w[None], offsets=mats.offsets)
        one = jnp.ones((1,))
        m = stencil_phi_matvec_bm(ww, one, v)
        r = stencil_phi_rmatvec_bm(ww, one, m)
        return jnp.sum(r * g_out)

    gp = jax.grad(loss_pallas, argnums=(0, 1))(w0, v0)
    gr = jax.grad(loss_roll, argnums=(0, 1))(w0, v0)
    for a, c in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-3)


def test_applicability_gate():
    # halo larger than any legal block → not applicable
    n = 4096
    offs = np.asarray([0, n // 2 - 1])
    assert not ps.pallas_applicable(n, 2, offs) or ps.plan_blocks(
        n, 2, 8, n // 2 - 1
    ) >= n // 2 - 1
    # tiny graph → blocks can't reach lane width
    assert not ps.pallas_applicable(64, 5, np.asarray([0, 1, -1]))
