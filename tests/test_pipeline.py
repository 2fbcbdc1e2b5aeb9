"""Blocked walk→consolidate pipeline tests: blocking must never change
results, overflow must self-heal, and dead-lane merging must shrink capacity.

This is the path that realizes the reference's million-node regime
(reference experiments/sparse/scalable_bo/run_bo.py:29-50) on one chip; here
it is validated at small N against the monolithic path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphgp_tpu import WalkConfig, blocked_ell_features, pack_laplacian, sample_walk_log
from graphgp_tpu.features import (
    consolidate,
    ell_to_dense,
    max_row_distinct,
    suggest_row_capacity,
)
from graphgp_tpu.walker import dense_step_matrices


@pytest.fixture
def cfg():
    return WalkConfig(walks_per_node=16, p_halt=0.15, max_walk_length=4)


def _dense_reference(adj, cfg, key):
    graph = pack_laplacian(adj)
    log = sample_walk_log(graph, key, cfg)
    return np.asarray(dense_step_matrices(log, cfg))


def test_blocked_matches_monolithic(er_adj, cfg):
    key = jax.random.PRNGKey(3)
    dense = _dense_reference(er_adj, cfg, key)
    graph = pack_laplacian(er_adj)
    # block size that does NOT divide n=48 → exercises tail padding
    feats = blocked_ell_features(graph, key, cfg, block_size=20)
    got = np.asarray(ell_to_dense(feats.mats))
    np.testing.assert_allclose(got, dense, atol=1e-5)
    assert feats.num_nodes == graph.num_nodes
    assert feats.num_target_nodes == graph.num_nodes


def test_blocked_block_size_invariance(er_adj, cfg):
    """Different blockings give identical features — the counter-based RNG
    keys on global node ids, so blocking is an implementation detail."""
    key = jax.random.PRNGKey(5)
    graph = pack_laplacian(er_adj)
    a = blocked_ell_features(graph, key, cfg, block_size=48)
    b = blocked_ell_features(graph, key, cfg, block_size=7)
    np.testing.assert_allclose(
        np.asarray(ell_to_dense(a.mats)), np.asarray(ell_to_dense(b.mats)), atol=1e-6
    )


def test_blocked_overflow_restart(er_adj, cfg):
    """A deliberately tiny initial capacity must self-heal via the overflow
    restart, still yielding lossless features."""
    key = jax.random.PRNGKey(3)
    dense = _dense_reference(er_adj, cfg, key)
    graph = pack_laplacian(er_adj)
    feats = blocked_ell_features(graph, key, cfg, block_size=16, capacity=1)
    np.testing.assert_allclose(np.asarray(ell_to_dense(feats.mats)), dense, atol=1e-5)
    assert feats.mats.row_capacity > 1


def test_dead_lane_merging_shrinks_capacity(er_adj):
    """With heavy halting, the live-only capacity must be well below the raw
    distinct-position count, and consolidation at that capacity is lossless."""
    cfg = WalkConfig(walks_per_node=64, p_halt=0.5, max_walk_length=6)
    graph = pack_laplacian(er_adj)
    log = sample_walk_log(graph, jax.random.PRNGKey(1), cfg)

    # raw distinct positions (incl. frozen dead lanes) — the old bound
    curs = np.asarray(log.curs)
    l, n, w = curs.shape
    flat = np.sort(curs.reshape(l * n, w), axis=-1)
    raw = int((1 + (flat[:, 1:] != flat[:, :-1]).sum(axis=-1)).max())

    live = int(max_row_distinct(log))
    assert live < raw  # dead merging must actually buy capacity at p_halt=0.5

    cap = suggest_row_capacity(log)
    mats = consolidate(log, cap, walks_per_node=cfg.walks_per_node)
    np.testing.assert_allclose(
        np.asarray(ell_to_dense(mats)),
        np.asarray(dense_step_matrices(log, cfg)),
        atol=1e-5,
    )


def test_preprocessor_blocked_route(er_adj, cfg, tmp_path):
    """preprocess_graph must route big logs through the blocked pipeline and
    produce features identical to the monolithic route."""
    from graphgp_tpu.preprocessor import preprocess_graph

    mono = preprocess_graph(er_adj, cfg, seed=9)
    # budget of 1 byte forces blocking for any graph
    blocked = preprocess_graph(er_adj, cfg, seed=9, log_budget_bytes=1)
    np.testing.assert_allclose(
        np.asarray(ell_to_dense(mono.mats)),
        np.asarray(ell_to_dense(blocked.mats)),
        atol=1e-6,
    )
