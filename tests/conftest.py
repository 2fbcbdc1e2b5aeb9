"""Test fixtures. Forces an 8-device virtual CPU platform so multi-chip
sharding paths are exercised without TPU hardware (the fake-backend story the
reference lacks — SURVEY §4)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The container's sitecustomize registers the "axon" TPU backend and sets
# jax_platforms="axon,cpu" through jax.config, which overrides the env var —
# force CPU here (before any backend is initialized) so tests run on the
# 8-device virtual CPU platform, not the tunneled TPU.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu", jax.devices()
    assert len(jax.devices()) == 8, jax.devices()


@pytest.fixture
def toy_cycle_adj() -> np.ndarray:
    """Undirected 4-node cycle adjacency (dense) — mirrors reference
    tests/conftest.py."""
    adj = np.zeros((4, 4))
    for u, v in [(0, 1), (1, 2), (2, 3), (3, 0)]:
        adj[u, v] = 1.0
        adj[v, u] = 1.0
    return adj


@pytest.fixture
def toy_cycle_csr(toy_cycle_adj):
    import scipy.sparse as sp

    return sp.csr_matrix(toy_cycle_adj)


@pytest.fixture
def ring_adj():
    """64-node ring graph — big enough for Monte-Carlo property tests."""
    n = 64
    adj = np.zeros((n, n))
    for i in range(n):
        adj[i, (i + 1) % n] = 1.0
        adj[(i + 1) % n, i] = 1.0
    return adj


@pytest.fixture
def er_adj():
    """Erdős–Rényi-ish random graph, 48 nodes, symmetric, no self-loops."""
    rng = np.random.default_rng(7)
    n = 48
    adj = (rng.random((n, n)) < 0.12).astype(float)
    adj = np.triu(adj, 1)
    adj = adj + adj.T
    # ensure no isolated nodes for cleaner Laplacian tests
    for i in range(n):
        if adj[i].sum() == 0:
            j = (i + 1) % n
            adj[i, j] = adj[j, i] = 1.0
    return adj
