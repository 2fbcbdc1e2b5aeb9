"""Synthetic graph + field generators for scaling and BO experiments.

Functional ports of the reference's generator semantics (not code): ring
graphs from the scaling experiment (reference
experiments/sparse/scaling_exp/run_scaling_experiment.py:154-198) and the
five BO surfaces (reference experiments/sparse/scalable_bo/bo_utils/
data_utils.py:20-262: grid central-bump, periodic torus, staircase, circle,
grid multimodal). All return
``{'adjacency': scipy CSR, 'y_true': (N,), 'y_observed': (N,), 'node_ids': (N,)}``.
"""
from __future__ import annotations

from typing import Dict

import numpy as np
import scipy.sparse as sp


def _grid_adjacency(s: int) -> sp.csr_matrix:
    """4-neighbor s×s grid via Kronecker products (reference
    data_utils.py:56-60)."""
    e = np.ones(s)
    t = sp.diags([e[:-1], e[:-1]], offsets=[-1, 1], shape=(s, s), format="csr")
    eye = sp.eye(s, format="csr")
    return (sp.kron(eye, t, format="csr") + sp.kron(t, eye, format="csr")).tocsr()


def _require_square(n_nodes: int) -> int:
    s = int(np.sqrt(n_nodes))
    if s * s != n_nodes:
        raise ValueError(f"n_nodes must be a perfect square (got {n_nodes})")
    return s


def _pack(adjacency, y_true, y_observed) -> Dict:
    n = y_true.shape[0]
    return {
        "adjacency": adjacency,
        "y_true": y_true.astype(np.float32),
        "y_observed": y_observed.astype(np.float32),
        "node_ids": np.arange(n, dtype=np.int32),
    }


def generate_ring_data(
    n_nodes: int, noise_std: float = 0.1, seed: int = 42
) -> Dict:
    """Ring graph with a smooth two-frequency field (reference scaling
    experiment's ring data, run_scaling_experiment.py:154-198)."""
    rng = np.random.default_rng(seed)
    rows = np.arange(n_nodes)
    cols = (rows + 1) % n_nodes
    adj = sp.csr_matrix((np.ones(n_nodes), (rows, cols)), shape=(n_nodes, n_nodes))
    adj = (adj + adj.T).tocsr()
    angles = 2 * np.pi * np.arange(n_nodes) / n_nodes
    y_true = np.sin(2 * angles) + 0.5 * np.cos(5 * angles)
    return _pack(adj, y_true, y_true + rng.normal(0, noise_std, n_nodes))


def generate_grid_data(
    n_nodes: int, beta_sample: float = 1.0, noise_std: float = 0.1, seed: int = 42
) -> Dict:
    """Central-maximum surface on an s×s grid (reference data_utils.py:20-75)."""
    s = _require_square(n_nodes)
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 1, s)
    xg, yg = np.meshgrid(x, x)
    base = 1.2 * np.sin(2 * np.pi * xg) + 0.6 * np.cos(3 * np.pi * yg)
    bump = 3 * np.exp(-0.5 * (((xg - 0.5) / 0.06) ** 2 + ((yg - 0.5) / 0.06) ** 2))
    y_true = (beta_sample * (base + bump)).reshape(-1)
    return _pack(
        _grid_adjacency(s), y_true, y_true + rng.normal(0, noise_std, n_nodes)
    )


def generate_periodic_grid_data(
    n_nodes: int, beta_sample: float = 1.0, noise_std: float = 0.1, seed: int = 42
) -> Dict:
    """Torus grid with a periodic multi-mode field (reference
    data_utils.py:77-131)."""
    s = _require_square(n_nodes)
    rng = np.random.default_rng(seed)
    i, j = np.meshgrid(np.arange(s), np.arange(s), indexing="ij")
    node = (i * s + j).ravel()
    right = (i * s + (j + 1) % s).ravel()
    down = (((i + 1) % s) * s + j).ravel()
    rows = np.concatenate([node, right, node, down])
    cols = np.concatenate([right, node, down, node])
    adj = sp.coo_matrix(
        (np.ones(rows.size), (rows, cols)), shape=(n_nodes, n_nodes)
    ).tocsr()
    x = np.linspace(0, 2 * np.pi, s, endpoint=False)
    xg, yg = np.meshgrid(x, x)
    z = beta_sample * (
        np.sin(xg) * np.cos(yg)
        + 0.5 * np.sin(2 * xg) * np.sin(2 * yg)
        + 0.3 * np.cos(3 * xg + yg)
    )
    y_true = z.reshape(-1)
    return _pack(adj, y_true, y_true + rng.normal(0, noise_std, n_nodes))


def generate_staircase_grid_data(
    n_nodes: int,
    beta_sample: float = 1.0,
    noise_std: float = 0.1,
    seed: int = 42,
    n_levels: int = 5,
) -> Dict:
    """Diagonal staircase/plateau field on a grid (reference
    data_utils.py:133-187)."""
    s = _require_square(n_nodes)
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 1, s)
    xg, yg = np.meshgrid(x, x)
    diag = xg + yg
    level_width = 2.0 / n_levels
    z = np.zeros_like(xg)
    for level in range(n_levels):
        mask = (diag >= level * level_width) & (diag < (level + 1) * level_width)
        z[mask] = level + rng.uniform(-0.2, 0.2)
    z = beta_sample * (z + 0.3 * np.sin(2 * np.pi * xg) * np.cos(2 * np.pi * yg))
    y_true = z.reshape(-1)
    return _pack(
        _grid_adjacency(s), y_true, y_true + rng.normal(0, noise_std, n_nodes)
    )


def generate_circle_graph_data(
    n_nodes: int, beta_sample: float = 1.0, noise_std: float = 0.1, seed: int = 42
) -> Dict:
    """Cycle graph with a sinusoidal field (reference data_utils.py:189-210)."""
    rng = np.random.default_rng(seed)
    rows = np.arange(n_nodes)
    cols = (rows + 1) % n_nodes
    adj = sp.csr_matrix((np.ones(n_nodes), (rows, cols)), shape=(n_nodes, n_nodes))
    adj = (adj + adj.T).tocsr()
    angles = np.linspace(0, 2 * np.pi, n_nodes, endpoint=False)
    y_true = beta_sample * (
        2 * np.sin(2 * angles) + 0.5 * np.cos(4 * angles) + 0.3 * np.sin(angles)
    )
    return _pack(adj, y_true, y_true + rng.normal(0, noise_std, n_nodes))


def generate_grid_multimodal_data(
    n_nodes: int,
    beta_sample: float = 1.0,
    noise_std: float = 0.1,
    seed: int = 42,
    n_peaks: int = 5,
) -> Dict:
    """Grid with multiple random Gaussian peaks (reference
    data_utils.py:212-262)."""
    s = _require_square(n_nodes)
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 1, s)
    xg, yg = np.meshgrid(x, x)
    z = 0.5 * np.sin(2 * np.pi * xg) + 0.3 * np.cos(3 * np.pi * yg)
    for _ in range(n_peaks):
        cx, cy = rng.uniform(0.1, 0.9, size=2)
        amp = rng.uniform(1.0, 3.0)
        wx, wy = rng.uniform(0.05, 0.15, size=2)
        z = z + amp * np.exp(-0.5 * (((xg - cx) / wx) ** 2 + ((yg - cy) / wy) ** 2))
    y_true = (beta_sample * z).reshape(-1)
    return _pack(
        _grid_adjacency(s), y_true, y_true + rng.normal(0, noise_std, n_nodes)
    )


GENERATORS = {
    "ring": generate_ring_data,
    "grid": generate_grid_data,
    "periodic_grid": generate_periodic_grid_data,
    "staircase_grid": generate_staircase_grid_data,
    "circle": generate_circle_graph_data,
    "grid_multimodal": generate_grid_multimodal_data,
}


def generate(graph_type: str, n_nodes: int, **kwargs) -> Dict:
    if graph_type not in GENERATORS:
        raise ValueError(
            f"unknown graph_type {graph_type!r}; options: {sorted(GENERATORS)}"
        )
    return GENERATORS[graph_type](n_nodes, **kwargs)
