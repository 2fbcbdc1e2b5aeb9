"""Unified real-dataset loader with two-tier (memory + disk) caching.

Re-design of the reference ``GraphDataLoader`` (experiments/graph_bo/data/
database.py:12-457): same dataset registry (SNAP social edge lists, ERA5 wind
npz, synthetic-field npz), same ``(adjacency_csr, node_ids, targets)``
contract, same degree-target convention for social graphs — but built on
scipy directly (no NetworkX round-trip: edge lists are vectorized into CSR
with dense-rank node relabeling) and cached as npz instead of pickles.

This container has zero network egress, so downloads are impossible: loaders
read files under ``data_root`` and raise a clear FileNotFoundError naming the
expected file when absent. Synthetic npz files use the reference's CSR-triplet
layout (database.py:320-371: A_data/A_indices/A_indptr/A_shape + X + y).
"""
from __future__ import annotations

import gzip
import os
from typing import Callable, Dict, Optional, Tuple

import numpy as np
import scipy.sparse as sp

Arrays = Tuple[sp.csr_matrix, np.ndarray, np.ndarray]


def edges_to_csr(u: np.ndarray, v: np.ndarray) -> Tuple[sp.csr_matrix, np.ndarray]:
    """Undirected simple graph from raw edge endpoint arrays.

    Node ids are dense-ranked (original ids → 0..N-1, sorted order), matching
    the reference's NetworkX relabeling semantics up to node order. Returns
    (adjacency, original_node_ids)."""
    uv = np.stack([np.asarray(u), np.asarray(v)])
    nodes, flat = np.unique(uv, return_inverse=True)
    ui, vi = flat.reshape(2, -1)
    keep = ui != vi  # drop self-loops
    ui, vi = ui[keep], vi[keep]
    n = nodes.size
    adj = sp.coo_matrix(
        (np.ones(ui.size * 2), (np.concatenate([ui, vi]), np.concatenate([vi, ui]))),
        shape=(n, n),
    ).tocsr()
    adj.data[:] = 1.0  # collapse multi-edges
    return adj, nodes


def _degree_targets(adj: sp.csr_matrix) -> np.ndarray:
    """Social-network target = node degree (reference database.py:212-214)."""
    return np.asarray(adj.sum(axis=1)).ravel().astype(np.float32)


def _load_edge_csv(path: str, src_col: str, dst_col: str) -> Arrays:
    import pandas as pd

    df = pd.read_csv(path)
    adj, _ = edges_to_csr(df[src_col].to_numpy(), df[dst_col].to_numpy())
    return adj, np.arange(adj.shape[0]), _degree_targets(adj)


def _load_edge_txt_gz(path: str) -> Arrays:
    us, vs = [], []
    with gzip.open(path, "rt") as f:
        for line in f:
            if line.startswith("#"):
                continue
            a, b = line.split()
            us.append(int(a))
            vs.append(int(b))
    adj, _ = edges_to_csr(np.asarray(us), np.asarray(vs))
    return adj, np.arange(adj.shape[0]), _degree_targets(adj)


def _load_pems_bay_distances(path: str) -> Arrays:
    """Real PEMS-BAY sensor graph from the shipped road-distance table.

    ``distances_bay_2017.csv`` (sensor_from, sensor_to, road distance in
    meters — 325 Bay-Area sensors, 8k directed pairs) is the one PEMS
    artifact the reference tree actually ships offline. Edge weights use
    the DCRNN-style Gaussian distance kernel (see inline note; the
    reference's ``mean_length/length`` convention applies to its OSMnx road
    edges, traffic_utils/preprocessing.py:142-149, not to this proximity
    table). The reference's full pipeline additionally
    needs ``pems-bay.h5`` (speed signals) and an OSMnx download — both
    absent here — so the TARGET field is a GP sample from the exact
    diffusion kernel on this real graph (seeded, amplitude 1, β=5,
    noiseless — drivers add observation noise per their protocol). The
    graph is real; the field is a labeled stand-in.
    """
    import pandas as pd

    df = pd.read_csv(path, header=None, names=["u", "v", "dist"])
    df = df[(df["u"] != df["v"]) & (df["dist"] > 0)]
    ids = np.unique(np.concatenate([df["u"].to_numpy(), df["v"].to_numpy()]))
    id_map = {s: i for i, s in enumerate(ids.tolist())}
    rows = df["u"].map(id_map).to_numpy()
    cols = df["v"].map(id_map).to_numpy()
    dist = df["dist"].to_numpy(dtype=np.float64)
    # DCRNN-style adjacency — the canonical public treatment of this exact
    # file: w = exp(−(d/σ)²) with σ = std of distances, thresholded at 0.1.
    # (The raw table is a dense proximity list, mean degree ~46; the
    # reference's mean_length/length weighting applies to its OSMnx ROAD
    # edges, not to this table — used raw it yields a near-complete graph
    # whose diffusion fields are white.)
    sigma = dist.std()
    w = np.exp(-((dist / sigma) ** 2))
    keep = w >= 0.1
    n = ids.size
    adj = sp.coo_matrix((w[keep], (rows[keep], cols[keep])), shape=(n, n))
    adj = adj.tocsr().maximum(adj.T.tocsr())  # symmetrize directed pairs

    dense = adj.toarray()
    deg = dense.sum(axis=1)
    dinv = np.where(deg > 0, 1.0 / np.sqrt(np.where(deg > 0, deg, 1.0)), 0.0)
    lap = np.eye(n) - dense * dinv[:, None] * dinv[None, :]
    evals, evecs = np.linalg.eigh(lap)
    k = (evecs * np.exp(-5.0 * evals)) @ evecs.T
    rng = np.random.default_rng(7)
    chol = np.linalg.cholesky(k + 1e-8 * np.eye(n))
    y = chol @ rng.normal(size=n)
    return adj.tocsr(), ids.astype(np.int64), y.astype(np.float32)


def _load_csr_npz(path: str) -> Arrays:
    """Reference npz CSR-triplet layout (database.py:320-330)."""
    with np.load(path, allow_pickle=True) as data:
        adj = sp.csr_matrix(
            (data["A_data"], data["A_indices"], data["A_indptr"]),
            shape=tuple(data["A_shape"]),
        )
        return adj, np.asarray(data["X"]), np.asarray(data["y"])


class GraphDataLoader:
    """callable: ``loader(name) -> {'adjacency', 'node_ids', 'y_observed', ...}``."""

    # Candidate data roots when none is given: a local raw_data/ checkout,
    # then the reference repo's dataset tree (the offline source in this
    # environment). Override with GRAPHGP_DATA_ROOT or the data_root arg —
    # no committed symlink to a machine-specific absolute path.
    _DEFAULT_ROOTS = (
        "raw_data",
        "/root/reference/experiments/graph_bo/data/raw_data",
    )

    def __init__(
        self, data_root: Optional[str] = None, cache_dir: Optional[str] = None
    ):
        if data_root is None:
            data_root = os.environ.get("GRAPHGP_DATA_ROOT")
        if data_root is None:
            data_root = next(
                (r for r in self._DEFAULT_ROOTS if os.path.isdir(r)), None
            )
            if data_root is None:
                raise FileNotFoundError(
                    "no dataset root found: none of "
                    f"{list(self._DEFAULT_ROOTS)} exists. Set the "
                    "GRAPHGP_DATA_ROOT environment variable (or pass "
                    "data_root=) to the directory holding the raw "
                    "dataset tree (social_networks/, wind_interpolation/, "
                    "synthetic/)."
                )
        self.data_root = data_root
        self.cache_dir = cache_dir or "processed_data"
        self._memory_cache: Dict[str, Dict] = {}
        os.makedirs(self.cache_dir, exist_ok=True)

        # name -> (relative path, loader) — registry mirrors reference
        # database.py:37-126.
        self.registry: Dict[str, Tuple[str, Callable[[str], Arrays]]] = {
            "facebook": (
                "social_networks/facebook/facebook_large/musae_facebook_edges.csv",
                lambda p: _load_edge_csv(p, "id_1", "id_2"),
            ),
            "twitch": (
                "social_networks/twitch/large_twitch_edges.csv",
                lambda p: _load_edge_csv(p, "numeric_id_1", "numeric_id_2"),
            ),
            "youtube": (
                "social_networks/youtube/com-youtube.ungraph.txt.gz",
                _load_edge_txt_gz,
            ),
            "enron": (
                "social_networks/enron/email-Enron.txt.gz",
                _load_edge_txt_gz,
            ),
            # Real PEMS-BAY road-distance sensor graph (325 nodes). The
            # path is relative to the graph_bo raw_data root; in the
            # reference tree it resolves to experiments/dense/
            # traffic_dataset/data/PEMS/ (see _load_pems_bay_distances).
            "pems_bay": (
                "../../../dense/traffic_dataset/data/PEMS/"
                "distances_bay_2017.csv",
                _load_pems_bay_distances,
            ),
        }
        for level in ["500hpa", "800hpa", "1000hpa"]:
            for wide in ["", "_wide"]:
                name = level + wide
                sub = level.replace("hpa", "hPa") + wide
                self.registry[name] = (
                    f"wind_interpolation/{sub}/wind_data_processed_{sub}.npz",
                    _load_csr_npz,
                )
        for name, sub, fname in [
            ("single_modal", "single_modal", "synthetic_single_modal_1000x1000.npz"),
            ("multi_modal", "multi-modal", "synthetic_multimodal_1000x1000.npz"),
            ("bimodal", "bimodal", "synthetic_bimodal_100x100.npz"),
            ("community", "community", "synthetic_community_10k.npz"),
            ("circular", "circular", "synthetic_circular_10k.npz"),
        ]:
            self.registry[name] = (f"synthetic/{sub}/{fname}", _load_csr_npz)

    def available(self):
        return sorted(self.registry)

    def _cache_path(self, name: str) -> str:
        return os.path.join(self.cache_dir, f"{name}.npz")

    def __call__(self, name: str, force_reload: bool = False) -> Dict:
        if name not in self.registry:
            raise ValueError(
                f"unknown dataset {name!r}; available: {self.available()}"
            )
        if not force_reload and name in self._memory_cache:
            return self._memory_cache[name]

        cache_path = self._cache_path(name)
        if not force_reload and os.path.exists(cache_path):
            adj, node_ids, y = _load_csr_npz(cache_path)
        else:
            rel, loader = self.registry[name]
            path = os.path.join(self.data_root, rel)
            if not os.path.exists(path):
                raise FileNotFoundError(
                    f"dataset file for {name!r} not found: {path} — this "
                    "environment has no network egress; place the raw file "
                    "there manually (see reference load_data notebooks for "
                    "provenance)."
                )
            adj, node_ids, y = loader(path)
            np.savez_compressed(
                cache_path,
                A_data=adj.data,
                A_indices=adj.indices,
                A_indptr=adj.indptr,
                A_shape=np.asarray(adj.shape),
                X=node_ids,
                y=y,
            )

        out = {
            "adjacency": adj,
            "node_ids": np.asarray(node_ids),
            "y_observed": np.asarray(y, dtype=np.float32),
            "y_true": np.asarray(y, dtype=np.float32),
        }
        self._memory_cache[name] = out
        return out


def load_cora_graphml(
    path: str, num_train: int = 1988, num_test: int = 497, seed: int = 0
):
    """Cora LCC from a GraphML export with per-node ``ground_truth`` labels.

    The reference ships ``cora_result.graphml`` (experiments/dense/cora/data/
    cora/) carrying the 2485-node largest connected component with 7-class
    ground-truth labels — the only offline artifact that includes labels
    (``cora.content`` is absent). Parsed with the stdlib XML parser, no
    NetworkX. Returns (adjacency_csr, labels, train_idx, test_idx)."""
    import xml.etree.ElementTree as ET

    ns = {"g": "http://graphml.graphdrawing.org/xmlns"}
    root = ET.parse(path).getroot()
    label_key = None
    for k in root.findall("g:key", ns):
        if k.get("attr.name") == "ground_truth":
            label_key = k.get("id")
    if label_key is None:
        raise ValueError(f"{path}: no 'ground_truth' node attribute")
    graph = root.find("g:graph", ns)
    ids, raw_labels = [], []
    for nd in graph.findall("g:node", ns):
        ids.append(nd.get("id"))
        val = np.nan
        for d in nd.findall("g:data", ns):
            if d.get("key") == label_key:
                val = float(d.text)
        raw_labels.append(val)
    id_map = {s: i for i, s in enumerate(ids)}
    n = len(ids)
    us, vs = [], []
    for e in graph.findall("g:edge", ns):
        us.append(id_map[e.get("source")])
        vs.append(id_map[e.get("target")])
    us, vs = np.asarray(us), np.asarray(vs)
    keep = us != vs
    us, vs = us[keep], vs[keep]
    adj = sp.coo_matrix(
        (np.ones(us.size * 2), (np.concatenate([us, vs]), np.concatenate([vs, us]))),
        shape=(n, n),
    ).tocsr()
    adj.data[:] = 1.0
    classes = {v: i for i, v in enumerate(sorted(set(raw_labels)))}
    labels = np.asarray([classes[v] for v in raw_labels], np.int32)

    if num_train + num_test > n:
        num_train = min(num_train, int(n * 0.8))
        num_test = n - num_train
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    train_idx = np.sort(perm[:num_train]).astype(np.int32)
    test_idx = np.sort(perm[num_train : num_train + num_test]).astype(np.int32)
    return adj, labels, train_idx, test_idx


def load_cora(data_dir: str, num_train: int = 1988, num_test: int = 497, seed: int = 0):
    """Cora citation graph: largest connected component, 7-class labels.

    Functional port of reference ``load_cora`` (experiments/dense/cora/
    cora_utils/preprocessing.py:14-68) minus its absolute scratch path and
    NetworkX pipeline: expects ``cora.cites`` / ``cora.content`` under
    ``data_dir``. When ``cora.content`` is absent but a labeled
    ``cora_result.graphml`` exists (the artifact the reference ships), falls
    back to :func:`load_cora_graphml`. Returns (adjacency_csr, labels,
    train_idx, test_idx)."""
    import pandas as pd

    content_path = os.path.join(data_dir, "cora.content")
    graphml_path = os.path.join(data_dir, "cora_result.graphml")
    if not os.path.exists(content_path) and os.path.exists(graphml_path):
        return load_cora_graphml(graphml_path, num_train, num_test, seed)

    cites = pd.read_csv(
        os.path.join(data_dir, "cora.cites"), sep="\t", header=None,
        names=["target", "source"],
    )
    adj_all, nodes = edges_to_csr(
        cites["source"].to_numpy(), cites["target"].to_numpy()
    )

    # largest connected component
    ncomp, comp = sp.csgraph.connected_components(adj_all, directed=False)
    largest = np.argmax(np.bincount(comp))
    keep = np.flatnonzero(comp == largest)
    adj = adj_all[keep][:, keep].tocsr()
    kept_nodes = nodes[keep]

    content = pd.read_csv(
        os.path.join(data_dir, "cora.content"), sep="\t", header=None, index_col=0
    )
    subjects = content.iloc[:, -1]
    classes = {c: i for i, c in enumerate(sorted(subjects.unique()))}
    labels = np.zeros(keep.size, dtype=np.int32)
    subject_by_node = subjects.to_dict()
    for i, node in enumerate(kept_nodes):
        if node in subject_by_node:
            labels[i] = classes[subject_by_node[node]]

    n = keep.size
    if num_train + num_test > n:
        # graph smaller than the requested split (e.g. subsampled data):
        # fall back to an 80/20 split of what's available
        num_train = min(num_train, int(n * 0.8))
        num_test = n - num_train
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    train_idx = np.sort(perm[:num_train]).astype(np.int32)
    test_idx = np.sort(perm[num_train : num_train + num_test]).astype(np.int32)
    return adj, labels, train_idx, test_idx
