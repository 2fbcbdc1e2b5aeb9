"""Fused padded masked-Gram CG (pallas_kernels/gram.py) vs the generic
full-space path — bit-for-bit same operator, interpreter-mode kernels."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from graphgp_tpu import WalkConfig, pack_laplacian, sample_walk_log
from graphgp_tpu.features import (
    EllFeatures,
    StencilFeatures,
    consolidate,
    contract,
    ell_to_stencil,
    stencil_is_periodic,
    suggest_row_capacity,
)
from graphgp_tpu.gp.iterative import make_gram_matvec_bm_full
from graphgp_tpu.linalg import batched_cg
from graphgp_tpu.pallas_kernels import gram
from graphgp_tpu.pallas_kernels.stencil import center_offsets, shifted_weights


def _ring_csr(n):
    m = sp.diags([np.ones(n - 1), np.ones(n - 1)], [1, -1]).tolil()
    m[0, n - 1] = m[n - 1, 0] = 1
    return m.tocsr().astype(np.float32)


def _grid_csr(side):
    n = side * side
    rows, cols = [], []
    for i in range(side):
        for j in range(side):
            u = i * side + j
            if j + 1 < side:
                rows += [u, u + 1]
                cols += [u + 1, u]
            if i + 1 < side:
                rows += [u, u + side]
                cols += [u + side, u]
    return sp.csr_matrix(
        (np.ones(len(rows), np.float32), (rows, cols)), shape=(n, n)
    )


def _stencil_for(adj):
    graph = pack_laplacian(adj)
    cfg = WalkConfig(walks_per_node=32, p_halt=0.1, max_walk_length=3)
    log = sample_walk_log(graph, jax.random.PRNGKey(0), cfg)
    cap = suggest_row_capacity(log)
    ell = EllFeatures(consolidate(log, cap, walks_per_node=cfg.walks_per_node))
    stencil = ell_to_stencil(ell.mats)
    assert stencil is not None
    return stencil


@pytest.mark.parametrize(
    "make,periodic_expected",
    [
        (lambda: _ring_csr(256), True),
        (lambda: _grid_csr(16), False),
        # n=225 with c=128 → nonzero tail inside the last center block:
        # regression case for the periodic pad-refresh leaking mirrored
        # columns into the tail (ghost nonzeros in every CG dot)
        (lambda: _grid_csr(15), False),
    ],
    ids=["ring-periodic", "grid-aperiodic", "grid-tailed"],
)
def test_gram_cg_matches_reference_path(make, periodic_expected):
    adj = make()
    stencil = _stencil_for(adj)
    assert stencil_is_periodic(stencil) == periodic_expected

    n = stencil.vals.shape[2]
    f = jnp.asarray([1.0, 0.5, 0.25])
    phi = contract(StencilFeatures(stencil), f)
    w = phi.w
    offs = tuple(center_offsets(phi.offsets, n).tolist())
    phi_full = type(phi)(
        w=w, offsets=phi.offsets, w_shift=shifted_weights(w, np.asarray(offs))
    )

    rng = np.random.default_rng(0)
    mask = jnp.zeros((n,), jnp.float32).at[
        jnp.asarray(np.sort(rng.choice(n, n // 2, replace=False)))
    ].set(1.0)
    b = jnp.asarray(rng.normal(size=(4, n)), jnp.float32) * mask[None, :]
    noise = jnp.float32(0.25)

    ref = batched_cg(
        make_gram_matvec_bm_full(),
        (phi_full, noise, mask),
        b,
        tol=0.0,
        max_iters=25,
        batch_axis=0,
    ).x

    got = gram.gram_cg(
        phi_full, noise, mask, b,
        tol=0.0, max_iters=25,
        periodic=periodic_expected, interpret=True, c=128,
    )
    assert got is not None
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref), atol=2e-4)

    # treating an aperiodic stencil as periodic must also be exact (the
    # mirrored pads multiply zero wrap weights)
    if not periodic_expected:
        got_p = gram.gram_cg(
            phi_full, noise, mask, b,
            tol=0.0, max_iters=25, periodic=True, interpret=True, c=128,
        )
        np.testing.assert_allclose(
            np.asarray(got_p.x), np.asarray(got.x), atol=1e-6
        )


def test_stencil_mll_cg_gradient_nonzero():
    """mll_cg gradients w.r.t. kernel hyperparameters must be NONZERO on the
    stencil layout. Regression test: registering ContractedStencil as a
    linalg nondiff type silently zeroed the adjoint path through the
    modulator-folded weights — fits ran but trained nothing (flat 1e6-node
    BO regret, round 5)."""
    import jax

    from graphgp_tpu.gp import iterative, params as P

    adj = _grid_csr(16)
    stencil = _stencil_for(adj)
    feats = StencilFeatures(stencil)
    n = stencil.vals.shape[2]
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=n // 2), jnp.float32)
    tr = jnp.arange(0, n, 2, dtype=jnp.int32)
    params = P.init_params(
        "diffusion", feats.max_walk_length, jax.random.PRNGKey(0), noise=0.3
    )

    def loss(q):
        return -iterative.mll_cg(
            feats, q, tr, y, jax.random.PRNGKey(1), kind="diffusion",
        )

    grads = jax.grad(loss)(params)
    assert float(jnp.abs(grads["raw_beta"])) > 0.0
    assert float(jnp.abs(grads["raw_sigma_f"])) > 0.0
    assert float(jnp.abs(grads["raw_noise"])) > 0.0
