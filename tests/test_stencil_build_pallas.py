"""Pallas ELL→stencil conversion vs the XLA one-hot chunk path (interpret
mode on the CPU test platform)."""
import jax
import jax.numpy as jnp
import numpy as np

from graphgp_tpu import WalkConfig, pack_laplacian
from graphgp_tpu.features import (
    StencilFeatures,
    consolidate,
    ell_to_stencil,
    offset_vocabulary,
    suggest_row_capacity,
)
from graphgp_tpu.pallas_kernels.stencil_build import ell_to_stencil_pallas
from graphgp_tpu.walker import sample_walk_log


def _ring_mats(n=200, wpn=32, lmax=4):
    adj = np.zeros((n, n))
    ix = np.arange(n)
    adj[ix, (ix + 1) % n] = 1.0
    adj[(ix + 1) % n, ix] = 1.0
    graph = pack_laplacian(adj)
    log = sample_walk_log(
        graph, jax.random.PRNGKey(0), WalkConfig(wpn, 0.15, lmax)
    )
    return consolidate(log, suggest_row_capacity(log))


def test_pallas_build_matches_xla_chunks():
    mats = _ring_mats()
    ref = ell_to_stencil(mats)  # CPU → XLA chunk path
    assert ref is not None
    out = ell_to_stencil_pallas(
        mats.cols, mats.vals, tuple(int(o) for o in ref.offsets),
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref.vals), atol=1e-6
    )


def test_pallas_build_nonaligned_n():
    mats = _ring_mats(n=333)
    vocab = offset_vocabulary(mats)
    assert vocab is not None
    ref = ell_to_stencil(mats)
    out = ell_to_stencil_pallas(
        mats.cols, mats.vals, tuple(int(o) for o in vocab), interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref.vals), atol=1e-6
    )
