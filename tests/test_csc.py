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


def test_csc_rmatvec_bm_chunked_matches_any_vrow_chunk(er_adj, monkeypatch):
    """The virtual-row transpose must give identical products at ANY chunk
    size — columns straddling chunk boundaries ride the open-segment carry
    (regression for the facebook failures: 8×-padded monolithic buffers,
    then an unrolled-chunk program the remote compile rejected)."""
    import graphgp_tpu.features as F

    cfg = WalkConfig(walks_per_node=24, p_halt=0.1, max_walk_length=4)
    ell = _ell(er_adj, cfg)
    n = ell.num_nodes
    f = jnp.asarray([1.0, -0.5, 0.3, 0.1])
    vb = jax.random.normal(jax.random.PRNGKey(7), (6, n))
    ref = np.asarray(ell.rmatvec(f, vb.T).T)  # scatter path ground truth
    for chunk in (1, 2, 8, 1 << 15):
        monkeypatch.setattr(F, "_CSC_VROW_CHUNK", chunk)
        csc = transpose_ell(ell.mats)
        assert csc.vrow_chunk <= max(chunk, 1)
        out = np.asarray(csc_phi_rmatvec_bm(csc, f, vb))
        np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_ell_product_custom_vjps_match_dense(er_adj):
    """The analytic custom VJPs of the batched ELL/CSC products must equal
    dense-Φ gradients in both arguments (f, v), with and without the CSC
    transpose attached — regression for the facebook RESOURCE_EXHAUSTED
    where AD transposed the chunked segmented scan."""
    from graphgp_tpu.features import ell_to_dense

    cfg = WalkConfig(walks_per_node=24, p_halt=0.1, max_walk_length=4)
    ell = _ell(er_adj, cfg)
    fast = with_transpose(ell)
    dense = jnp.asarray(ell_to_dense(ell.mats))  # (L, N, Nt)
    n = ell.num_nodes
    f0 = jnp.asarray([0.8, -0.4, 0.3, 0.1])
    vb = jax.random.normal(jax.random.PRNGKey(9), (3, n))
    g = jax.random.normal(jax.random.PRNGKey(10), (3, n))

    def loss_feats(feats, which):
        def go(f, v):
            out = feats.matvec_bm(f, v) if which == "m" else feats.rmatvec_bm(f, v)
            return jnp.sum(out * g)
        return go

    def loss_dense(which):
        def go(f, v):
            phi = jnp.einsum("l,lij->ij", f, dense)
            out = v @ phi.T if which == "m" else v @ phi
            return jnp.sum(out * g)
        return go

    for which in ("m", "r"):
        rf, rv = jax.grad(loss_dense(which), argnums=(0, 1))(f0, vb)
        for feats in (ell, fast):
            gf, gv = jax.grad(loss_feats(feats, which), argnums=(0, 1))(f0, vb)
            np.testing.assert_allclose(
                np.asarray(gf), np.asarray(rf), atol=2e-4, rtol=2e-4
            )
            np.testing.assert_allclose(
                np.asarray(gv), np.asarray(rv), atol=2e-4, rtol=2e-4
            )


def test_preprocessor_layout_sidecar_cache(er_adj, tmp_path):
    """Derived layouts (stencil / CSC) are cached as sidecar npz next to the
    ELL cache and reload identically — the conversions cost tens of seconds
    at large N and must not be paid on every driver start."""
    import glob

    from graphgp_tpu.features import StencilFeatures
    from graphgp_tpu.preprocessor import preprocess_graph

    cfg = WalkConfig(walks_per_node=16, p_halt=0.15, max_walk_length=3)
    f1 = preprocess_graph(er_adj, cfg, seed=3, cache_dir=str(tmp_path), layout="auto")
    assert glob.glob(str(tmp_path / "*.csc.npz")), "CSC sidecar not written"
    f2 = preprocess_graph(er_adj, cfg, seed=3, cache_dir=str(tmp_path), layout="auto")
    assert f2.csc is not None
    f = jnp.asarray([1.0, 0.5, 0.25])
    v = jax.random.normal(jax.random.PRNGKey(0), (2, f1.num_nodes))
    np.testing.assert_allclose(
        np.asarray(f1.rmatvec_bm(f, v)), np.asarray(f2.rmatvec_bm(f, v)),
        atol=1e-6,
    )

    # structured graph → stencil sidecar
    n = 24
    ring = np.zeros((n, n)); i = np.arange(n)
    ring[i, (i + 1) % n] = 1.0; ring[(i + 1) % n, i] = 1.0
    s1 = preprocess_graph(ring, cfg, seed=3, cache_dir=str(tmp_path), layout="auto")
    assert isinstance(s1, StencilFeatures)
    assert glob.glob(str(tmp_path / "*.stencil.npz")), "stencil sidecar not written"
    s2 = preprocess_graph(ring, cfg, seed=3, cache_dir=str(tmp_path), layout="auto")
    assert isinstance(s2, StencilFeatures)
    np.testing.assert_allclose(
        np.asarray(s1.mats.vals), np.asarray(s2.mats.vals), atol=0
    )
    assert (s1.mats.offsets == s2.mats.offsets).all()
