"""Dataset-loader tests with locally fabricated raw files (no egress)."""
import gzip
import os

import numpy as np
import pytest
import scipy.sparse as sp

from graphgp_tpu.data.database import GraphDataLoader, edges_to_csr, load_cora


def test_edges_to_csr_dedup_and_relabel():
    u = np.array([10, 20, 10, 30, 30])
    v = np.array([20, 10, 10, 40, 40])  # includes dup edge + self-loop
    adj, nodes = edges_to_csr(u, v)
    assert adj.shape == (4, 4)
    np.testing.assert_array_equal(nodes, [10, 20, 30, 40])
    assert adj[0, 1] == 1.0 and adj[1, 0] == 1.0  # deduped both directions
    assert adj.diagonal().max() == 0  # self-loop dropped
    assert adj[2, 3] == 1.0  # multi-edge collapsed to 1


def test_loader_facebook_style(tmp_path):
    raw = tmp_path / "raw_data" / "social_networks" / "facebook" / "facebook_large"
    raw.mkdir(parents=True)
    import pandas as pd

    pd.DataFrame({"id_1": [0, 1, 2, 3], "id_2": [1, 2, 3, 0]}).to_csv(
        raw / "musae_facebook_edges.csv", index=False
    )
    loader = GraphDataLoader(
        data_root=str(tmp_path / "raw_data"), cache_dir=str(tmp_path / "cache")
    )
    d = loader("facebook")
    assert d["adjacency"].shape == (4, 4)
    np.testing.assert_array_equal(d["y_observed"], [2, 2, 2, 2])  # degrees
    # disk cache created; second call from memory, third from fresh loader/disk
    assert (tmp_path / "cache" / "facebook.npz").exists()
    d2 = GraphDataLoader(
        data_root=str(tmp_path / "raw_data"), cache_dir=str(tmp_path / "cache")
    )("facebook")
    np.testing.assert_array_equal(
        d["adjacency"].toarray(), d2["adjacency"].toarray()
    )


def test_loader_gz_and_npz(tmp_path):
    root = tmp_path / "raw_data"
    enron_dir = root / "social_networks" / "enron"
    enron_dir.mkdir(parents=True)
    with gzip.open(enron_dir / "email-Enron.txt.gz", "wt") as f:
        f.write("# comment\n0 1\n1 2\n2 0\n")
    wind_dir = root / "wind_interpolation" / "500hPa"
    wind_dir.mkdir(parents=True)
    adj = sp.csr_matrix(np.array([[0, 1.0], [1.0, 0]]))
    np.savez(
        wind_dir / "wind_data_processed_500hPa.npz",
        A_data=adj.data, A_indices=adj.indices, A_indptr=adj.indptr,
        A_shape=np.asarray(adj.shape), X=np.arange(2), y=np.array([1.5, 2.5]),
    )
    loader = GraphDataLoader(data_root=str(root), cache_dir=str(tmp_path / "c"))
    e = loader("enron")
    assert e["adjacency"].shape == (3, 3)
    w = loader("500hpa")
    np.testing.assert_allclose(w["y_observed"], [1.5, 2.5])


def test_loader_missing_file_error(tmp_path):
    loader = GraphDataLoader(data_root=str(tmp_path), cache_dir=str(tmp_path / "c"))
    with pytest.raises(FileNotFoundError, match="facebook"):
        loader("facebook")
    with pytest.raises(ValueError, match="unknown dataset"):
        loader("not_a_dataset")


def test_load_cora_fabricated(tmp_path):
    """Two components; largest kept; labels mapped to class ids."""
    d = tmp_path / "cora"
    d.mkdir()
    # component A: papers 1-4 in a cycle; component B: 10-11
    edges = [(1, 2), (2, 3), (3, 4), (4, 1), (10, 11)]
    with open(d / "cora.cites", "w") as f:
        for a, b in edges:
            f.write(f"{a}\t{b}\n")
    with open(d / "cora.content", "w") as f:
        for paper, subj in [(1, "AI"), (2, "ML"), (3, "AI"), (4, "DB"), (10, "AI")]:
            f.write(f"{paper}\tfeat\t{subj}\n")
    adj, labels, tr, te = load_cora(str(d), num_train=2, num_test=2, seed=0)
    assert adj.shape == (4, 4)
    assert set(labels.tolist()) <= {0, 1, 2}
    assert tr.size == 2 and te.size == 2
    assert len(set(tr.tolist()) & set(te.tolist())) == 0


def test_pems_like_generator():
    """Offline PEMS stand-in must reproduce the reference construction's
    statistics: highway degree profile (sensors/corridors degree 2,
    junctions 3+), weight = mean_length/length, sensors on the graph."""
    from graphgp_tpu.data import synthetic

    d = synthetic.generate("pems_like", 0, n_sensors=100, n_junctions=32, seed=3)
    adj = d["adjacency"]
    n = adj.shape[0]
    assert d["y_observed"].shape == (n,)
    sensors = d["sensor_nodes"]
    assert sensors.size == 100
    assert sensors.max() < n

    import numpy as np
    deg = np.asarray((adj != 0).sum(axis=1)).ravel()
    # connected-ish highway profile: every node has a road, sensors are
    # degree-2 splices, most nodes are corridor nodes
    assert deg.min() >= 1
    assert (deg[sensors] == 2).all()
    assert np.median(deg) == 2
    assert deg.max() >= 3  # junctions exist

    # reference weight convention: w = mean_length/length → mean(1/w
    # normalized) ≈ 1; weights positive and spread
    w = adj.data
    assert (w > 0).all()
    lengths = 1.0 / w
    np.testing.assert_allclose(
        lengths.mean() / lengths.mean(), 1.0
    )
    assert w.std() / w.mean() > 0.2  # real length variance, not a grid

    # connected graph (single component)
    import scipy.sparse.csgraph as csgraph
    ncomp, _ = csgraph.connected_components(adj, directed=False)
    assert ncomp == 1

    # speed field in a plausible range with congestion structure
    assert 20.0 < d["y_true"].min() < d["y_true"].max() <= 66.0


def test_pems_bay_distance_loader(tmp_path):
    """DCRNN-style PEMS-BAY graph from a fabricated distance table: Gaussian
    weights thresholded at 0.1, symmetrized, GP-sampled targets."""
    import numpy as np

    from graphgp_tpu.data.database import _load_pems_bay_distances

    rng = np.random.default_rng(0)
    ids = 400000 + np.arange(12)
    rows = []
    for i in range(12):
        for j in range(i + 1, 12):
            if abs(i - j) <= 3:
                rows.append((ids[i], ids[j], 500.0 * abs(i - j)))
    path = tmp_path / "distances.csv"
    with open(path, "w") as fh:
        for u, v, d in rows:
            fh.write(f"{u},{v},{d}\n")
        fh.write(f"{ids[0]},{ids[0]},0.0\n")  # self-loop row must be dropped

    adj, node_ids, y = _load_pems_bay_distances(str(path))
    n = adj.shape[0]
    assert n == 12 and node_ids.tolist() == ids.tolist()
    assert (adj != adj.T).nnz == 0  # symmetric
    assert adj.diagonal().sum() == 0  # no self loops
    assert np.all(adj.data > 0) and np.all(adj.data <= 1.0)
    assert y.shape == (n,) and np.isfinite(y).all() and y.std() > 0
