"""Graph representations and Laplacian construction, TPU-first.

The walk engine operates on a *packed neighbor table* (ELL layout): fixed-width
``neighbors``/``weights`` arrays padded to the max row degree. This is the
TPU-native replacement for the reference's dense ``np.flatnonzero`` neighbor
lookups (reference: efficient_graph_gp/random_walk_samplers/sampler.py:24-30)
and raw-CSR pointer chasing (reference:
efficient_graph_gp_sparse/random_walk_samplers_sparse/sparse_sampler.py:44-55).
Fixed shapes mean every walk step is a pair of vectorized gathers that XLA can
tile; there is no data-dependent control flow.

Laplacian semantics mirror the reference exactly (reference:
efficient_graph_gp/graph_kernels/utils.py:6-28,
efficient_graph_gp_sparse/utils_sparse/graph_utils.py:5-30):
``L = I - D^{-1/2} A D^{-1/2}`` with zero-degree guards. Walks run on L
treated as a weighted graph, so the neighbor table of L includes the unit
self-loops and signed off-diagonal weights.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def normalized_laplacian(adj: jnp.ndarray) -> jnp.ndarray:
    """Dense symmetric-normalized Laplacian ``I - D^{-1/2} A D^{-1/2}``.

    Zero-degree rows get a zero inverse-sqrt degree (guard mirrors reference
    graph_kernels/utils.py:17-26), leaving an isolated unit self-loop.
    """
    adj = jnp.asarray(adj, dtype=jnp.float32)
    deg = jnp.sum(adj, axis=1)
    inv_sqrt = jnp.where(deg > 0, jax.lax.rsqrt(jnp.where(deg > 0, deg, 1.0)), 0.0)
    norm = adj * inv_sqrt[:, None] * inv_sqrt[None, :]
    return jnp.eye(adj.shape[0], dtype=adj.dtype) - norm


def laplacian(adj: jnp.ndarray) -> jnp.ndarray:
    """Unnormalized Laplacian ``D - A`` (reference preprocessing/laplacian_np.py)."""
    adj = jnp.asarray(adj, dtype=jnp.float32)
    return jnp.diag(jnp.sum(adj, axis=1)) - adj


def normalized_laplacian_csr(adj_csr) -> "Any":
    """Sparse (scipy CSR) normalized Laplacian, host-side.

    Used by the large-N path before packing into :class:`PackedGraph`
    (reference utils_sparse/graph_utils.py:5-30).
    """
    import scipy.sparse as sp

    adj_csr = adj_csr.tocsr()
    deg = np.asarray(adj_csr.sum(axis=1)).ravel()
    inv_sqrt = np.where(deg > 0, 1.0 / np.sqrt(np.where(deg > 0, deg, 1.0)), 0.0)
    d = sp.diags(inv_sqrt)
    lap = sp.eye(adj_csr.shape[0], format="csr") - d @ adj_csr @ d
    lap.eliminate_zeros()
    return lap.tocsr()


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PackedGraph:
    """ELL-packed weighted graph: the walk engine's native input.

    Attributes:
        neighbors: int32[N, D] — column ids of the nonzeros of row i, padded
            with ``i`` itself (self-index) so gathers stay in-bounds.
        weights: float32[N, D] — matching edge weights, padded with 0.
        degree: int32[N] — true nonzero count of each row.
        num_nodes: static int N.
        max_degree: static int D.
    """

    neighbors: jnp.ndarray
    weights: jnp.ndarray
    degree: jnp.ndarray
    num_nodes: int = dataclasses.field(metadata=dict(static=True))
    max_degree: int = dataclasses.field(metadata=dict(static=True))

    @property
    def dtype(self):
        return self.weights.dtype


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CsrGraph:
    """CSR-packed weighted graph for skewed-degree distributions.

    ELL pads every row to the max degree — catastrophic for social graphs
    (a single 28k-degree hub would inflate the table 1000×). CSR stores
    exactly nnz edges; the walker does two fused row gathers per step:

    node_table: int32[N, 2] — [row_start, degree] per node.
    edge_table: float32[nnz, 2] — [neighbor (as f32, exact < 2^24), weight].
    """

    node_table: jnp.ndarray
    edge_table: jnp.ndarray
    num_nodes: int = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))

    @property
    def degree(self):
        return self.node_table[:, 1]


def csr_graph(csr) -> CsrGraph:
    """Build a CsrGraph from a scipy CSR matrix (host-side)."""
    csr = csr.tocsr()
    csr.eliminate_zeros()
    n = csr.shape[0]
    if n >= (1 << 24):
        raise ValueError(
            "CsrGraph stores neighbor ids as f32 (exact below 2^24); "
            f"got {n} nodes — shard the graph or extend the edge table dtype."
        )
    indptr = np.asarray(csr.indptr)
    deg = np.diff(indptr).astype(np.int32)
    node_table = np.stack([indptr[:-1].astype(np.int32), deg], axis=1)
    edge_table = np.stack(
        [csr.indices.astype(np.float32), csr.data.astype(np.float32)], axis=1
    )
    return CsrGraph(
        node_table=jnp.asarray(node_table),
        edge_table=jnp.asarray(edge_table),
        num_nodes=n,
        nnz=int(csr.indices.size),
    )


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pack_dense(matrix: np.ndarray, pad_degree_to: int = 1) -> PackedGraph:
    """Pack a dense weighted matrix (typically L) into ELL layout (host-side)."""
    matrix = np.asarray(matrix)
    n = matrix.shape[0]
    mask = matrix != 0
    deg = mask.sum(axis=1).astype(np.int32)
    dmax = max(int(deg.max(initial=0)), pad_degree_to)
    neighbors = np.tile(np.arange(n, dtype=np.int32)[:, None], (1, dmax))
    weights = np.zeros((n, dmax), dtype=np.float32)
    for i in range(n):
        cols = np.flatnonzero(mask[i])
        neighbors[i, : cols.size] = cols
        weights[i, : cols.size] = matrix[i, cols]
    return PackedGraph(
        neighbors=jnp.asarray(neighbors),
        weights=jnp.asarray(weights),
        degree=jnp.asarray(deg),
        num_nodes=n,
        max_degree=dmax,
    )


def pack_csr(csr, pad_degree_to: int = 1) -> PackedGraph:
    """Pack a scipy CSR matrix into ELL layout (host-side, vectorized)."""
    csr = csr.tocsr()
    csr.eliminate_zeros()
    n = csr.shape[0]
    indptr = np.asarray(csr.indptr)
    deg = np.diff(indptr).astype(np.int32)
    dmax = max(int(deg.max(initial=0)), pad_degree_to)
    neighbors = np.tile(np.arange(n, dtype=np.int32)[:, None], (1, dmax))
    weights = np.zeros((n, dmax), dtype=np.float32)
    # Vectorized ELL fill: position of each nnz within its row.
    nnz = csr.indices.size
    if nnz:
        rows = np.repeat(np.arange(n), deg)
        pos = np.arange(nnz) - np.repeat(indptr[:-1], deg)
        neighbors[rows, pos] = csr.indices.astype(np.int32)
        weights[rows, pos] = csr.data.astype(np.float32)
    return PackedGraph(
        neighbors=jnp.asarray(neighbors),
        weights=jnp.asarray(weights),
        degree=jnp.asarray(deg),
        num_nodes=n,
        max_degree=dmax,
    )


def pack_laplacian(adj, pad_degree_to: int = 1, layout: str = "auto"):
    """Normalized Laplacian of ``adj`` packed for walking (dense or CSR input).

    layout: 'ell' (fixed-width rows), 'csr' (exact nnz, for skewed degrees),
    or 'auto' — CSR when ELL padding would waste >4x the edge memory.
    """
    import scipy.sparse as sp

    if sp.issparse(adj):
        lap_csr = normalized_laplacian_csr(adj)
        if layout == "csr":
            return csr_graph(lap_csr)
        if layout == "auto":
            deg = np.diff(lap_csr.indptr)
            dmax = int(deg.max(initial=1))
            padding_waste = dmax * lap_csr.shape[0] / max(lap_csr.nnz, 1)
            if padding_waste > 4 and lap_csr.shape[0] < (1 << 24):
                return csr_graph(lap_csr)
        return pack_csr(lap_csr, pad_degree_to=pad_degree_to)
    lap = np.array(normalized_laplacian(np.asarray(adj)))
    # Snap numerically-tiny entries to zero so the neighbor structure matches
    # the exact sparsity of L.
    lap[np.abs(lap) < 1e-12] = 0.0
    if layout == "csr":
        return csr_graph(sp.csr_matrix(lap))
    return pack_dense(lap, pad_degree_to=pad_degree_to)


def packed_to_dense(g: PackedGraph) -> jnp.ndarray:
    """Reconstruct the dense matrix from ELL layout (for tests / small N)."""
    n, d = g.num_nodes, g.max_degree
    rows = jnp.repeat(jnp.arange(n, dtype=jnp.int32), d)
    cols = g.neighbors.reshape(-1)
    vals = jnp.where(
        jnp.arange(d, dtype=jnp.int32)[None, :] < g.degree[:, None], g.weights, 0.0
    ).reshape(-1)
    return jnp.zeros((n, n), dtype=g.weights.dtype).at[rows, cols].add(vals)


def generate_noisy_samples(
    key: jax.Array, kernel: jnp.ndarray, noise_std: float = 0.1
) -> jnp.ndarray:
    """Draw one GP sample from ``N(0, K)`` plus iid observation noise.

    TPU-native re-design of reference graph_kernels/utils.py:30-47 (which uses
    np.random.seed + Cholesky); here keyed by an explicit PRNG key.
    """
    n = kernel.shape[0]
    chol = jnp.linalg.cholesky(kernel + 1e-6 * jnp.eye(n, dtype=kernel.dtype))
    k1, k2 = jax.random.split(key)
    f = chol @ jax.random.normal(k1, (n, 1), dtype=kernel.dtype)
    return f + noise_std * jax.random.normal(k2, (n, 1), dtype=kernel.dtype)
