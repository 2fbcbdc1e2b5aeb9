"""Plotting helpers: network layouts and GP fit visualizations.

Port of the reference top-level ``utils.py`` plotting API
(plot_network_graph, plot_gp_fit — reference utils.py:5-31), matplotlib-based
and import-gated so headless/serving environments never pay for it.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def plot_network_graph(adjacency, values=None, ax=None, node_size: int = 30):
    """Spring-layout scatter of the graph, optionally colored by node values."""
    import matplotlib.pyplot as plt
    import networkx as nx
    import scipy.sparse as sp

    g = (
        nx.from_scipy_sparse_array(adjacency)
        if sp.issparse(adjacency)
        else nx.from_numpy_array(np.asarray(adjacency))
    )
    if ax is None:
        _, ax = plt.subplots(figsize=(6, 6))
    pos = nx.spring_layout(g, seed=42)
    nx.draw_networkx_edges(g, pos, ax=ax, alpha=0.3)
    nx.draw_networkx_nodes(
        g, pos, ax=ax, node_size=node_size,
        node_color=values if values is not None else "C0",
        cmap="viridis",
    )
    ax.set_axis_off()
    return ax


def plot_gp_fit(
    train_idx,
    y_train,
    test_idx,
    mean,
    var,
    y_true: Optional[np.ndarray] = None,
    ax=None,
):
    """1-D GP fit plot over node index: mean ± 2σ band, observations, truth."""
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots(figsize=(8, 4))
    test_idx = np.asarray(test_idx)
    order = np.argsort(test_idx)
    ti, m = test_idx[order], np.asarray(mean)[order]
    s = np.sqrt(np.asarray(var)[order])
    ax.plot(ti, m, "C0-", label="posterior mean")
    ax.fill_between(ti, m - 2 * s, m + 2 * s, color="C0", alpha=0.2, label="±2σ")
    ax.plot(np.asarray(train_idx), np.asarray(y_train), "k.", ms=4, label="observed")
    if y_true is not None:
        ax.plot(np.arange(len(y_true)), np.asarray(y_true), "C3--", lw=1, label="truth")
    ax.set_xlabel("node index")
    ax.legend(loc="best", fontsize=8)
    return ax
