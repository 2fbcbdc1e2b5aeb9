"""Stencil step-matrix layout: exact equivalence with ELL on structured
graphs, rejection on unstructured ones, and preprocessor auto-routing.

The stencil form is the TPU fast path for every large-N reference protocol
(ring/grid/torus synthetic graphs — reference
experiments/sparse/scalable_bo/run_bo.py:29-50,
scaling_exp/run_scaling_experiment.py:154-198): matvecs become shifted
elementwise FMAs with zero gathers (features.StencilStepMatrices).
"""
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
    ell_to_stencil,
    suggest_row_capacity,
)


def ring_adj(n):
    rows = np.arange(n)
    cols = (rows + 1) % n
    a = sp.csr_matrix((np.ones(n), (rows, cols)), shape=(n, n))
    return a + a.T


def grid_adj(side):
    n = side * side
    idx = np.arange(n).reshape(side, side)
    rows = np.concatenate([idx[:-1].ravel(), idx[:, :-1].ravel()])
    cols = np.concatenate([idx[1:].ravel(), idx[:, 1:].ravel()])
    a = sp.csr_matrix((np.ones(rows.size), (rows, cols)), shape=(n, n))
    return a + a.T


def _features(adj, cfg, seed=0):
    graph = pack_laplacian(adj)
    log = sample_walk_log(graph, jax.random.PRNGKey(seed), cfg)
    cap = suggest_row_capacity(log)
    return EllFeatures(consolidate(log, cap, walks_per_node=cfg.walks_per_node))


@pytest.mark.parametrize("builder", [lambda: ring_adj(64), lambda: grid_adj(9)])
def test_stencil_matches_ell(builder):
    cfg = WalkConfig(walks_per_node=32, p_halt=0.15, max_walk_length=4)
    ell = _features(builder(), cfg)
    st = ell_to_stencil(ell.mats)
    assert st is not None
    feats = StencilFeatures(st)
    n = ell.num_nodes
    f = jnp.asarray([1.0, -0.5, 0.25, 0.1])
    v = jax.random.normal(jax.random.PRNGKey(1), (n,))
    vb = jax.random.normal(jax.random.PRNGKey(2), (n, 3))
    np.testing.assert_allclose(
        np.asarray(feats.matvec(f, v)), np.asarray(ell.matvec(f, v)),
        atol=1e-5, rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(feats.matvec(f, vb)), np.asarray(ell.matvec(f, vb)),
        atol=1e-5, rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(feats.rmatvec(f, v)), np.asarray(ell.rmatvec(f, v)),
        atol=1e-5, rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(feats.rmatvec(f, vb)), np.asarray(ell.rmatvec(f, vb)),
        atol=1e-5, rtol=1e-5,
    )
    # batch-major variants are a layout change, never a semantics change
    np.testing.assert_allclose(
        np.asarray(feats.matvec_bm(f, vb.T)), np.asarray(ell.matvec(f, vb)).T,
        atol=1e-5, rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(feats.rmatvec_bm(f, vb.T)), np.asarray(ell.rmatvec(f, vb)).T,
        atol=1e-5, rtol=1e-5,
    )
    idx = jnp.asarray([0, 3, n - 1], jnp.int32)
    np.testing.assert_allclose(
        np.asarray(feats.rows(f, idx)), np.asarray(ell.rows(f, idx)),
        atol=1e-5, rtol=1e-5,
    )


def test_stencil_rejects_unstructured(er_adj):
    """An Erdős–Rényi graph has ~O(N·R) distinct col-row differences —
    conversion must bail out rather than build a fat stencil."""
    cfg = WalkConfig(walks_per_node=16, p_halt=0.1, max_walk_length=3)
    ell = _features(er_adj, cfg)
    assert ell_to_stencil(ell.mats, max_offsets=8) is None


def test_preprocessor_auto_layout(tmp_path):
    from graphgp_tpu.preprocessor import preprocess_graph

    cfg = WalkConfig(walks_per_node=16, p_halt=0.15, max_walk_length=3)
    adj = ring_adj(48)
    feats = preprocess_graph(adj, cfg, seed=7, layout="auto")
    assert isinstance(feats, StencilFeatures)
    ell = preprocess_graph(adj, cfg, seed=7, layout="ell")
    f = jnp.asarray([1.0, 0.5, 0.25])
    v = jax.random.normal(jax.random.PRNGKey(0), (48,))
    np.testing.assert_allclose(
        np.asarray(feats.matvec(f, v)), np.asarray(ell.matvec(f, v)), atol=1e-5
    )


def test_preprocessor_auto_layout_survives_cache_hit(tmp_path):
    """The returned feature type must not depend on cache state: a warm
    (cache-hit) auto run must return the same StencilFeatures as the cold
    run, with identical values."""
    from graphgp_tpu.preprocessor import preprocess_graph

    cfg = WalkConfig(walks_per_node=16, p_halt=0.15, max_walk_length=3)
    adj = ring_adj(48)
    cold = preprocess_graph(
        adj, cfg, seed=7, layout="auto", cache_dir=str(tmp_path)
    )
    warm = preprocess_graph(
        adj, cfg, seed=7, layout="auto", cache_dir=str(tmp_path)
    )
    assert isinstance(cold, StencilFeatures)
    assert isinstance(warm, StencilFeatures)
    np.testing.assert_allclose(
        np.asarray(cold.mats.vals), np.asarray(warm.mats.vals), atol=1e-7
    )


def test_preprocessor_rejects_bad_layout_before_work():
    from graphgp_tpu.preprocessor import preprocess_graph

    cfg = WalkConfig(walks_per_node=16, p_halt=0.15, max_walk_length=3)
    with pytest.raises(ValueError, match="layout"):
        preprocess_graph(ring_adj(16), cfg, layout="stencil")


def test_consolidate_capacity_exceeding_walks(toy_cycle_adj):
    """capacity > walks_per_node must zero-pad, not raise (user-supplied
    lane-aligned capacities can exceed W on tiny graphs)."""
    cfg = WalkConfig(walks_per_node=4, p_halt=0.2, max_walk_length=3)
    graph = pack_laplacian(toy_cycle_adj)
    log = sample_walk_log(graph, jax.random.PRNGKey(0), cfg)
    small = consolidate(log, 4, walks_per_node=cfg.walks_per_node)
    wide = consolidate(log, 16, walks_per_node=cfg.walks_per_node)
    assert wide.row_capacity == 16
    np.testing.assert_allclose(
        np.asarray(wide.vals[..., :4]), np.asarray(small.vals), atol=1e-7
    )
    assert float(jnp.sum(jnp.abs(wide.vals[..., 4:]))) == 0.0
