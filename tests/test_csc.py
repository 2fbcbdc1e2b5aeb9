"""Column-sorted transpose (CscStepMatrices): exact equivalence with the
scatter-based ELL rmatvec on unstructured graphs.

This is the TPU answer to the reference's CSC→CSR torch transpose
(utils_sparse/sparse_lo.py:16-25): hub columns of social graphs make a
transposed ELL infeasible (per-column capacity explodes), so Φᵀ products run
gather → segmented prefix-sum → gather over column-sorted flat entries.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphgp_tpu import WalkConfig, pack_laplacian, sample_walk_log
from graphgp_tpu.features import (
    EllFeatures,
    consolidate,
    csc_phi_rmatvec,
    csc_phi_rmatvec_bm,
    segmented_sum_scan,
    suggest_row_capacity,
    transpose_ell,
    with_transpose,
)


def _ell(adj, cfg, seed=0):
    graph = pack_laplacian(adj)
    log = sample_walk_log(graph, jax.random.PRNGKey(seed), cfg)
    cap = suggest_row_capacity(log)
    return EllFeatures(consolidate(log, cap, walks_per_node=cfg.walks_per_node))


def test_segmented_sum_scan_basic():
    z = jnp.asarray([1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
    starts = jnp.asarray([True, False, True, False, False, True])
    out = np.asarray(segmented_sum_scan(z, starts))
    np.testing.assert_allclose(out, [1.0, 3.0, 3.0, 7.0, 12.0, 6.0])
    zb = jnp.stack([z, 2 * z])
    outb = np.asarray(segmented_sum_scan(zb, starts))
    np.testing.assert_allclose(outb[1], 2 * out)


def test_csc_rmatvec_matches_scatter(er_adj):
    """Gather/segmented-scan Φᵀ must equal the scatter-based Φᵀ exactly
    (same entries, different reduction association) on an unstructured
    Erdős–Rényi graph, including skewed in-columns."""
    cfg = WalkConfig(walks_per_node=24, p_halt=0.1, max_walk_length=4)
    ell = _ell(er_adj, cfg)
    csc = transpose_ell(ell.mats)
    n = ell.num_nodes
    f = jnp.asarray([1.0, -0.5, 0.3, 0.1])
    v = jax.random.normal(jax.random.PRNGKey(1), (n,))
    vb = jax.random.normal(jax.random.PRNGKey(2), (n, 5))
    ref = np.asarray(ell.rmatvec(f, v))
    np.testing.assert_allclose(
        np.asarray(csc_phi_rmatvec(csc, f, v)), ref, atol=1e-5, rtol=1e-5
    )
    refb = np.asarray(ell.rmatvec(f, vb))
    np.testing.assert_allclose(
        np.asarray(csc_phi_rmatvec_bm(csc, f, vb.T)).T, refb,
        atol=1e-5, rtol=1e-5,
    )


def test_with_transpose_dispatch(er_adj):
    """EllFeatures with csc attached must route rmatvec/rmatvec_bm through
    the transpose and agree with the plain layout."""
    cfg = WalkConfig(walks_per_node=16, p_halt=0.15, max_walk_length=3)
    plain = _ell(er_adj, cfg)
    fast = with_transpose(plain)
    assert fast.csc is not None
    assert with_transpose(fast) is fast
    n = plain.num_nodes
    f = jnp.asarray([1.0, 0.5, 0.25])
    vb = jax.random.normal(jax.random.PRNGKey(3), (n, 4))
    np.testing.assert_allclose(
        np.asarray(fast.rmatvec(f, vb)), np.asarray(plain.rmatvec(f, vb)),
        atol=1e-5, rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(fast.rmatvec_bm(f, vb.T)),
        np.asarray(plain.rmatvec_bm(f, vb.T)),
        atol=1e-5, rtol=1e-5,
    )
    # matvec unaffected
    np.testing.assert_allclose(
        np.asarray(fast.matvec(f, vb)), np.asarray(plain.matvec(f, vb)),
        atol=1e-6,
    )


def test_preprocessor_auto_attaches_transpose(er_adj):
    from graphgp_tpu.preprocessor import preprocess_graph

    cfg = WalkConfig(walks_per_node=16, p_halt=0.15, max_walk_length=3)
    feats = preprocess_graph(er_adj, cfg, seed=3, layout="auto")
    assert isinstance(feats, EllFeatures) and feats.csc is not None


def test_csc_rmatvec_bm_chunked_matches_monolithic(er_adj, monkeypatch):
    """The slab-chunked batched rmatvec (open-segment carry across slab
    boundaries) must be exact at ANY chunk size — regression for the
    facebook HBM OOM where the monolithic (B, E) scan buffers compiled at
    8× padded layout (features._CSC_CHUNK rationale)."""
    import graphgp_tpu.features as F

    cfg = WalkConfig(walks_per_node=24, p_halt=0.1, max_walk_length=4)
    ell = _ell(er_adj, cfg)
    csc = transpose_ell(ell.mats)
    n = ell.num_nodes
    f = jnp.asarray([1.0, -0.5, 0.3, 0.1])
    vb = jax.random.normal(jax.random.PRNGKey(7), (6, n))
    ref = np.asarray(csc_phi_rmatvec_bm(csc, f, vb))
    e = int(csc.rows.shape[1])
    # odd / misaligned chunk sizes so segments straddle every kind of slab
    # boundary (e//7+1 guarantees a non-divisor with several slabs)
    for chunk in (max(e // 7 + 1, 1), max(e // 3, 1), max(e // 2 + 13, 1), e):
        monkeypatch.setattr(F, "_CSC_CHUNK", chunk)
        out = np.asarray(csc_phi_rmatvec_bm(csc, f, vb))
        np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)
