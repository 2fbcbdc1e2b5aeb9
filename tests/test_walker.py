"""Property tests for the vectorized walk engine.

Goes beyond the reference's smoke tests (reference tests/test_grf_dense.py):
unbiasedness of M_l against L^l, shard-invariant RNG, ELL/walk-log operator
consistency, and PSD of the GRF kernel.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphgp_tpu import (
    WalkConfig,
    fast_general_grf_kernel,
    normalized_laplacian,
    pack_laplacian,
    sample_dense_step_matrices,
    sample_walk_log,
)
from graphgp_tpu.features import (
    consolidate,
    ell_phi_matvec,
    ell_phi_rmatvec,
    ell_phi_rows,
    ell_to_dense,
    log_phi_matvec,
    log_phi_rmatvec,
    log_phi_rows,
    suggest_row_capacity,
)
from graphgp_tpu.walker import dense_step_matrices, fused_phi


def test_step_matrix_shapes_and_identity(toy_cycle_adj):
    graph = pack_laplacian(toy_cycle_adj)
    cfg = WalkConfig(walks_per_node=5, p_halt=0.2, max_walk_length=3)
    mats = sample_dense_step_matrices(graph, jax.random.PRNGKey(0), cfg)
    assert mats.shape == (3, 4, 4)
    # M_0 is exactly the identity: every walk counts its start with load 1.
    np.testing.assert_allclose(np.asarray(mats[0]), np.eye(4), atol=1e-6)


def test_step_matrices_unbiased(er_adj):
    """E[M_l] = L^l — the core estimator property (SURVEY §0.2)."""
    lap = np.asarray(normalized_laplacian(er_adj))
    graph = pack_laplacian(er_adj)
    cfg = WalkConfig(walks_per_node=4000, p_halt=0.1, max_walk_length=3)
    mats = np.asarray(
        sample_dense_step_matrices(graph, jax.random.PRNGKey(3), cfg)
    )
    # Monte-Carlo error at wpn=4000 on this graph: max-err ~0.11 for M1,
    # ~0.3-0.6 for M2 (empirically, 1/sqrt(wpn) scaling verified offline).
    np.testing.assert_allclose(mats[1], lap, atol=0.25)
    np.testing.assert_allclose(mats[2], lap @ lap, atol=0.8)
    assert np.abs(mats[1] - lap).mean() < 0.02
    assert np.abs(mats[2] - lap @ lap).mean() < 0.05


def test_rng_shard_invariance(er_adj):
    """A node-block walk with the right global offset reproduces the exact
    rows of the full-graph walk — the property the reference lacks (results
    change with n_processes; SURVEY §5.2). The mesh-level version of this
    property lives in tests/test_shard.py::test_sharded_walk_bit_identical."""
    graph = pack_laplacian(er_adj)
    cfg = WalkConfig(walks_per_node=7, p_halt=0.15, max_walk_length=4)
    key = jax.random.PRNGKey(11)
    full = sample_walk_log(graph, key, cfg)

    # determinism: identical key → identical log
    full2 = sample_walk_log(graph, key, cfg)
    np.testing.assert_array_equal(np.asarray(full.curs), np.asarray(full2.curs))

    # block [24, 48) walked standalone against the full gather tables must be
    # bit-identical to the corresponding rows of the full walk
    block = sample_walk_log(graph, key, cfg, node_offset=24, num_start_nodes=24)
    np.testing.assert_array_equal(
        np.asarray(block.curs), np.asarray(full.curs[:, 24:48, :])
    )
    np.testing.assert_array_equal(
        np.asarray(block.loads), np.asarray(full.loads[:, 24:48, :])
    )

    # and a wrong offset must NOT reproduce the full walk
    shifted = sample_walk_log(graph, key, cfg, node_offset=5)
    assert not np.array_equal(np.asarray(full.curs), np.asarray(shifted.curs))


def test_fast_general_grf_kernel_psd(toy_cycle_adj):
    k = fast_general_grf_kernel(
        toy_cycle_adj,
        [1.0, 0.5, 0.25],
        walks_per_node=10,
        p_halt=0.2,
    )
    k = np.asarray(k)
    assert k.shape == (4, 4)
    np.testing.assert_allclose(k, k.T, atol=1e-5)
    assert np.linalg.eigvalsh(k).min() >= -1e-5


def test_walklog_operators_match_dense(er_adj):
    graph = pack_laplacian(er_adj)
    cfg = WalkConfig(walks_per_node=20, p_halt=0.1, max_walk_length=4)
    key = jax.random.PRNGKey(5)
    log = sample_walk_log(graph, key, cfg)
    mats = dense_step_matrices(log, cfg)
    f = jnp.asarray([1.0, -0.5, 0.25, -0.125])
    phi = jnp.einsum("l,lij->ij", f, mats)

    n = graph.num_nodes
    v = jax.random.normal(jax.random.PRNGKey(9), (n,))
    np.testing.assert_allclose(
        np.asarray(log_phi_matvec(log, f, v)), np.asarray(phi @ v), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(log_phi_rmatvec(log, f, v, n)),
        np.asarray(phi.T @ v),
        rtol=1e-4,
        atol=1e-5,
    )
    rows = jnp.asarray([0, 3, 17], jnp.int32)
    np.testing.assert_allclose(
        np.asarray(log_phi_rows(log, f, rows, n)),
        np.asarray(phi[np.asarray(rows)]),
        rtol=1e-4,
        atol=1e-5,
    )
    # batched matvec
    vb = jax.random.normal(jax.random.PRNGKey(10), (n, 3))
    np.testing.assert_allclose(
        np.asarray(log_phi_matvec(log, f, vb)), np.asarray(phi @ vb), rtol=1e-4, atol=1e-5
    )


def test_ell_consolidation_lossless(er_adj):
    graph = pack_laplacian(er_adj)
    cfg = WalkConfig(walks_per_node=16, p_halt=0.2, max_walk_length=3)
    log = sample_walk_log(graph, jax.random.PRNGKey(2), cfg)
    dense = np.asarray(dense_step_matrices(log, cfg))
    cap = suggest_row_capacity(log)
    mats = consolidate(log, cap, walks_per_node=cfg.walks_per_node)
    np.testing.assert_allclose(np.asarray(ell_to_dense(mats)), dense, atol=1e-5)

    f = jnp.asarray([0.3, 0.6, -0.2])
    phi = jnp.einsum("l,lij->ij", f, jnp.asarray(dense))
    n = graph.num_nodes
    v = jax.random.normal(jax.random.PRNGKey(1), (n,))
    np.testing.assert_allclose(
        np.asarray(ell_phi_matvec(mats, f, v)), np.asarray(phi @ v), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ell_phi_rmatvec(mats, f, v)), np.asarray(phi.T @ v), rtol=1e-4, atol=1e-5
    )
    rows = jnp.asarray([1, 5], jnp.int32)
    np.testing.assert_allclose(
        np.asarray(ell_phi_rows(mats, f, rows)),
        np.asarray(phi[np.asarray(rows)]),
        rtol=1e-4,
        atol=1e-5,
    )


def test_fused_phi_matches_two_stage(toy_cycle_adj):
    graph = pack_laplacian(toy_cycle_adj)
    cfg = WalkConfig(walks_per_node=30, p_halt=0.2, max_walk_length=3)
    key = jax.random.PRNGKey(4)
    f = jnp.asarray([1.0, 0.5, 0.25])
    mats = sample_dense_step_matrices(graph, key, cfg)
    expected = jnp.einsum("l,lij->ij", f, mats)
    got = fused_phi(graph, key, f, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5)


def test_sparse_csr_input(toy_cycle_csr):
    graph = pack_laplacian(toy_cycle_csr)
    cfg = WalkConfig(walks_per_node=5, p_halt=0.2, max_walk_length=3)
    mats = sample_dense_step_matrices(graph, jax.random.PRNGKey(0), cfg)
    assert mats.shape == (3, 4, 4)
    np.testing.assert_allclose(np.asarray(mats[0]), np.eye(4), atol=1e-6)


def test_layouts_bit_identical(er_adj):
    """Flat-ELL, packed-ELL, and CSR walk layouts produce identical logs —
    the memory layout must never change results."""
    import scipy.sparse as sp

    from graphgp_tpu.graphs import csr_graph, normalized_laplacian_csr
    from graphgp_tpu.walker import _lookup_ell_flat, _make_lookup

    cfg = WalkConfig(walks_per_node=9, p_halt=0.15, max_walk_length=4)
    key = jax.random.PRNGKey(8)

    ell = pack_laplacian(er_adj)  # max_degree small → packed fast path
    assert ell.max_degree <= 16  # sanity: this exercises the packed lookup
    log_packed = sample_walk_log(ell, key, cfg)

    csr = csr_graph(normalized_laplacian_csr(sp.csr_matrix(er_adj)))
    log_csr = sample_walk_log(csr, key, cfg)
    np.testing.assert_array_equal(np.asarray(log_packed.curs), np.asarray(log_csr.curs))
    np.testing.assert_allclose(
        np.asarray(log_packed.loads), np.asarray(log_csr.loads), rtol=1e-6
    )


def test_auto_layout_picks_csr_for_skewed():
    """A star graph (one hub) must auto-select CSR, not ELL."""
    import scipy.sparse as sp

    from graphgp_tpu.graphs import CsrGraph

    n = 200
    rows = np.zeros(n - 1, dtype=int)
    cols = np.arange(1, n)
    adj = sp.csr_matrix((np.ones(n - 1), (rows, cols)), shape=(n, n))
    adj = adj + adj.T
    g = pack_laplacian(adj, layout="auto")
    assert isinstance(g, CsrGraph)
    cfg = WalkConfig(walks_per_node=5, p_halt=0.2, max_walk_length=3)
    log = sample_walk_log(g, jax.random.PRNGKey(0), cfg)
    mats = dense_step_matrices(log, cfg)
    np.testing.assert_allclose(np.asarray(mats[0]), np.eye(n), atol=1e-6)


def test_ablation_mode(toy_cycle_adj):
    """Ablation walks the raw adjacency with load = weight (reference
    sampler.py:180-183)."""
    from graphgp_tpu.graphs import pack_dense

    graph = pack_dense(toy_cycle_adj)
    cfg = WalkConfig(walks_per_node=2000, p_halt=0.2, max_walk_length=2, ablation=True)
    mats = np.asarray(
        sample_dense_step_matrices(graph, jax.random.PRNGKey(0), cfg)
    )
    # step 1: load replaced by edge weight (=1 on the cycle), landing mass
    # (1 - p_halt) split over the 2 neighbors
    row = mats[1][0]
    assert row[0] == 0.0
    np.testing.assert_allclose(row[1] + row[3], 1 - 0.2, atol=0.05)


def test_mxu_walker_matches_gather(er_adj):
    """The MXU one-hot walker is numerically equivalent to the gather walker
    (same RNG, same picks; f32 matmul accumulation differences only)."""
    from graphgp_tpu.walker import sample_dense_step_matrices_mxu

    graph = pack_laplacian(er_adj)
    cfg = WalkConfig(walks_per_node=16, p_halt=0.15, max_walk_length=4)
    key = jax.random.PRNGKey(12)
    m_gather = sample_dense_step_matrices(graph, key, cfg)
    for wb in (1, 4, 16):
        m_mxu = sample_dense_step_matrices_mxu(graph, key, cfg, walk_block=wb)
        np.testing.assert_allclose(
            np.asarray(m_mxu), np.asarray(m_gather), atol=1e-4
        )


def test_walk_rng_golden():
    """Golden values pin the counter-based RNG semantics: any change to the
    splitmix32 hash chain or the pick/halt arithmetic (which silently changes
    every downstream result) must consciously update these numbers.

    Pinned on the 4-cycle Laplacian (diag 1, off-diag -0.5, L-graph degree 3):
    per-transition load factors are 3·1/0.8 = 3.75 (self-loop) and
    3·(-0.5)/0.8 = -1.875 (neighbor). Values recorded 2026-08-19; both the
    packed-ELL and CSR layouts must reproduce them bit-exactly.
    """
    import scipy.sparse as sp

    from graphgp_tpu.graphs import csr_graph, normalized_laplacian_csr

    adj = np.zeros((4, 4))
    for u, v in [(0, 1), (1, 2), (2, 3), (3, 0)]:
        adj[u, v] = adj[v, u] = 1.0
    cfg = WalkConfig(walks_per_node=3, p_halt=0.2, max_walk_length=3)
    key = jax.random.PRNGKey(7)

    # non-trivial golden trace at steps 1-2 (step 0 is always starts/load 1)
    expected_curs1 = np.array(
        [[3, 0, 0], [0, 0, 2], [3, 3, 2], [2, 0, 0]], np.int32
    )
    expected_curs2 = np.array(
        [[3, 0, 0], [3, 1, 2], [0, 3, 2], [2, 1, 0]], np.int32
    )
    s, m = 3.75, -1.875  # self-loop / neighbor load factors
    expected_loads1 = np.array(
        [[m, 0, 0], [m, m, m], [m, m, 0], [m, m, m]], np.float32
    )
    expected_loads2 = np.array(
        [[0, 0, 0], [m * m, m * m, m * s], [m * m, 0, 0], [m * s, m * m, m * s]],
        np.float32,
    )

    for graph in (
        pack_laplacian(adj),
        csr_graph(normalized_laplacian_csr(sp.csr_matrix(adj))),
    ):
        log = sample_walk_log(graph, key, cfg)
        curs = np.asarray(log.curs)
        loads = np.asarray(log.loads)
        np.testing.assert_array_equal(
            curs[0], np.arange(4, dtype=np.int32)[:, None].repeat(3, 1)
        )
        np.testing.assert_allclose(loads[0], 1.0)
        np.testing.assert_array_equal(curs[1], expected_curs1)
        np.testing.assert_array_equal(curs[2], expected_curs2)
        np.testing.assert_allclose(loads[1], expected_loads1, rtol=1e-6)
        np.testing.assert_allclose(loads[2], expected_loads2, rtol=1e-6)


def test_walk_length_zero_returns_empty():
    """max_walk_length=0 yields an empty (0, N, W) log, not a peeled step."""
    adj = np.zeros((4, 4))
    for u, v in [(0, 1), (1, 2), (2, 3), (3, 0)]:
        adj[u, v] = adj[v, u] = 1.0
    graph = pack_laplacian(adj)
    cfg = WalkConfig(walks_per_node=3, p_halt=0.2, max_walk_length=0)
    log = sample_walk_log(graph, jax.random.PRNGKey(0), cfg)
    assert log.curs.shape == (0, 4, 3)
    assert log.loads.shape == (0, 4, 3)


def test_hop_lane_chunking_bit_identical(monkeypatch):
    """Forcing the hop lane-resolution into walk chunks must reproduce the
    one-shot results bit-exactly (chunking only changes evaluation order)."""
    import graphgp_tpu.walker as W

    n = 48
    adj = np.zeros((n, n))
    idx = np.arange(n)
    adj[idx, (idx + 1) % n] = 1.0
    adj[(idx + 1) % n, idx] = 1.0
    graph = pack_laplacian(adj)
    cfg = WalkConfig(walks_per_node=12, p_halt=0.1, max_walk_length=4)
    key = jax.random.PRNGKey(5)

    # sanity: the hop path is active at this shape (degree-3 ring)
    assert W._hop_lane_chunk(n, 12, 3, 7) == 12
    ref = sample_walk_log(graph, key, cfg)

    # shrink the one-shot budget so lanes split into chunks of ≤4
    monkeypatch.setattr(W, "HOP_ONESHOT_BYTES", 1)
    monkeypatch.setattr(W, "HOP_CHUNK_BYTES", n * 4 * max(3, 7) * 4)
    assert W._hop_lane_chunk(n, 12, 3, 7) < 12
    chunked = W.sample_walk_log.__wrapped__(graph, key, cfg)

    np.testing.assert_array_equal(np.asarray(ref.curs), np.asarray(chunked.curs))
    np.testing.assert_array_equal(
        np.asarray(ref.loads), np.asarray(chunked.loads)
    )
