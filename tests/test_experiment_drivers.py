"""Tests for the regression / classification / wind experiment drivers."""
import numpy as np
import pytest


def test_regression_driver_small(tmp_path):
    from graphgp_tpu.cli.regression import main

    records = main([
        "--graph-type", "grid",
        "--n-nodes", "100",
        "--num-train", "50",
        "--walks", "20", "200",
        "--max-walk-length", "4",
        "--train-steps", "60",
        "--seeds", "1",
        "--results-dir", str(tmp_path),
    ])
    kernels = {r["kernel"] for r in records}
    assert kernels == {
        "exact_diffusion", "grf_diffusion", "grf_diffusion_transplant",
        "grf_free", "pofm_diffusion", "pofm_free",
    }
    # GRF error should decrease (or at least not blow up) with more walks
    grf = {r["walks_per_node"]: r["rmse"] for r in records if r["kernel"] == "grf_diffusion"}
    assert grf[200] <= grf[20] * 1.5
    exact_rmse = [r["rmse"] for r in records if r["kernel"] == "exact_diffusion"][0]
    assert grf[200] < exact_rmse * 3  # converging toward exact-kernel quality


def test_classification_driver_small(tmp_path):
    from graphgp_tpu.cli.classification import main

    records = main([
        "--n-nodes", "200",
        "--num-classes", "3",
        "--walks-per-node", "200",
        "--max-walk-length", "3",
        "--num-steps", "200",
        "--seeds", "1",
        "--results-dir", str(tmp_path),
    ])
    assert len(records) == 1
    # community graph: GRF-SVGP must beat chance (1/3) clearly
    assert records[0]["accuracy"] > 0.5


def test_classification_cora_files(tmp_path):
    """Real-Cora code path on fabricated cora.cites/cora.content files."""
    from graphgp_tpu.cli.classification import main

    d = tmp_path / "cora"
    d.mkdir()
    rng = np.random.default_rng(0)
    # 60-node, 2-community citation-style graph
    edges = []
    for c, base in [(0, 0), (1, 30)]:
        for _ in range(120):
            a, b = rng.integers(0, 30, 2)
            if a != b:
                edges.append((base + a, base + b))
    edges += [(0, 30), (5, 40)]  # weak inter-community links keep it connected
    with open(d / "cora.cites", "w") as f:
        for a, b in edges:
            f.write(f"{a}\t{b}\n")
    with open(d / "cora.content", "w") as f:
        for node in range(60):
            f.write(f"{node}\tfeat\t{'AI' if node < 30 else 'DB'}\n")
    records = main([
        "--cora-dir", str(d),
        "--walks-per-node", "100",
        "--max-walk-length", "3",
        "--num-steps", "150",
        "--seeds", "1",
        "--results-dir", str(tmp_path),
    ])
    assert records[0]["accuracy"] > 0.6


def test_cora_graphml_fallback(tmp_path):
    """load_cora falls back to a labeled GraphML export when cora.content is
    absent (the reference ships cora_result.graphml as its only offline
    label-carrying Cora artifact)."""
    from graphgp_tpu.data.database import load_cora

    d = tmp_path / "cora"
    d.mkdir()
    ns = "http://graphml.graphdrawing.org/xmlns"
    nodes = "".join(
        f'<node id="{i}"><data key="d0">{float(i % 3)}</data></node>'
        for i in range(12)
    )
    edges = "".join(
        f'<edge source="{i}" target="{(i + 1) % 12}" />' for i in range(12)
    )
    (d / "cora_result.graphml").write_text(
        f'<?xml version="1.0" encoding="utf-8"?>'
        f'<graphml xmlns="{ns}">'
        f'<key id="d0" for="node" attr.name="ground_truth" attr.type="float" />'
        f'<graph edgedefault="undirected">{nodes}{edges}</graph></graphml>'
    )
    # also a cites file, which must be IGNORED in favor of the labeled graphml
    (d / "cora.cites").write_text("0\t1\n")
    adj, labels, tr, te = load_cora(str(d), seed=0)
    assert adj.shape == (12, 12)
    assert adj.nnz == 24  # 12 undirected ring edges
    assert sorted(set(labels.tolist())) == [0, 1, 2]
    assert tr.size + te.size == 12
    assert np.intersect1d(tr, te).size == 0


def test_wind_driver_small(tmp_path):
    from graphgp_tpu.cli.wind import build_sphere_grid_graph, main, orbit_track_nodes

    # graph builder properties: symmetric, wraparound edges present
    lat = np.linspace(-90, 90, 7)
    lon = np.linspace(-180, 180, 12, endpoint=False)
    adj = build_sphere_grid_graph(lat, lon)
    assert adj.shape == (84, 84)
    assert np.abs((adj - adj.T)).max() == 0
    # wraparound: node (i, 0) connects to (i, n_lon-1)
    assert adj[3 * 12 + 0, 3 * 12 + 11] > 0

    track = orbit_track_nodes(lat, lon)
    assert 0 < track.size < 84

    records = main([
        "--n-lat", "7",
        "--n-lon", "12",
        "--walks", "50",
        "--max-walk-length", "3",
        "--train-steps", "30",
        "--num-pathwise-samples", "16",
        "--seeds", "1",
        "--results-dir", str(tmp_path),
    ])
    assert {r["kernel"] for r in records} == {"free", "diffusion"}
    assert all(np.isfinite(r["rmse"]) and np.isfinite(r["nlpd"]) for r in records)


def test_spectral_gp_matches_grf_limit():
    """Spectral exact-diffusion GP is the zero-variance GRF limit: at high
    wpn the GRF diffusion kernel's K approaches the spectral K."""
    import jax
    import jax.numpy as jnp

    from graphgp_tpu import WalkConfig, pack_laplacian
    from graphgp_tpu.data.synthetic import generate_ring_data
    from graphgp_tpu.gp import spectral
    from graphgp_tpu.kernels import fast_diffusion_grf_kernel

    d = generate_ring_data(48, seed=0)
    adj = d["adjacency"].toarray()
    eig = spectral.eigenbasis(adj)
    params = spectral.init_params(beta=1.0, sigma_f=1.0)
    phi = spectral._spectral_phi(eig, params)
    k_exact = np.asarray(phi @ phi.T)
    k_grf = np.asarray(
        fast_diffusion_grf_kernel(adj, beta=1.0, walks_per_node=8000, max_walk_length=10)
    )
    assert np.abs(k_exact - k_grf).max() < 0.05


def test_pofm_features_exact_powers():
    import jax.numpy as jnp

    from graphgp_tpu import normalized_laplacian
    from graphgp_tpu.kernels import pofm_features

    adj = np.zeros((6, 6))
    for i in range(5):
        adj[i, i + 1] = adj[i + 1, i] = 1.0
    lap = np.asarray(normalized_laplacian(adj))
    powers = np.asarray(pofm_features(adj, max_expansion=4))
    np.testing.assert_allclose(powers[0], np.eye(6), atol=1e-6)
    np.testing.assert_allclose(powers[1], lap, atol=1e-5)
    np.testing.assert_allclose(powers[3], lap @ lap @ lap, atol=1e-4)


def test_gcn_baseline_learns():
    import jax
    import jax.numpy as jnp

    from graphgp_tpu.baselines import fit_gcn
    from graphgp_tpu.data.synthetic import generate_grid_data

    d = generate_grid_data(144, seed=0)
    rng = np.random.default_rng(0)
    perm = rng.permutation(144)
    tr = jnp.asarray(np.sort(perm[:100]), jnp.int32)
    te = jnp.asarray(np.sort(perm[100:]), jnp.int32)
    y = jnp.asarray(d["y_observed"])
    res = fit_gcn(d["adjacency"], tr, y[tr], num_steps=400)
    assert float(res.losses[-1]) < float(res.losses[0]) * 0.5
    rmse = float(jnp.sqrt(jnp.mean((res.predictions[te] - y[te]) ** 2)))
    assert rmse < float(jnp.std(y))  # beats predicting the mean


def _write_csr_npz(path, adj, y, extra=None):
    import scipy.sparse as sp

    a = sp.csr_matrix(adj)
    fields = dict(
        A_data=a.data, A_indices=a.indices, A_indptr=a.indptr,
        A_shape=np.asarray(a.shape), X=np.arange(a.shape[0]), y=y,
    )
    fields.update(extra or {})
    np.savez(path, **fields)


def test_wind_npz_uses_saved_track(tmp_path, capsys):
    """Real-data wind path must honor the npz's Aeolus-track training nodes
    (reference protocol), not a random split."""
    from graphgp_tpu.cli.wind import build_sphere_grid_graph, main, synthetic_wind_speed

    lat = np.linspace(-90, 90, 7)
    lon = np.linspace(-180, 180, 12, endpoint=False)
    adj = build_sphere_grid_graph(lat, lon)
    y = synthetic_wind_speed(lat, lon)
    track = np.arange(0, 84, 3, dtype=np.int32)  # fabricated "Aeolus" track
    path = tmp_path / "wind.npz"
    _write_csr_npz(path, adj, y, extra={"X_train": track, "y_train": y[track]})

    records = main([
        "--wind-npz", str(path),
        "--walks", "40",
        "--max-walk-length", "3",
        "--train-steps", "20",
        "--num-pathwise-samples", "8",
        "--seeds", "1",
        "--results-dir", str(tmp_path),
    ])
    assert all(np.isfinite(r["rmse"]) for r in records)
    out = capsys.readouterr().out
    assert "using saved Aeolus-track training nodes" in out
    assert f"train (orbit track) {track.size}" in out


def test_regression_pems_npz(tmp_path):
    """PEMS pre-built npz (CSR triplets) drives the full traffic protocol."""
    from graphgp_tpu.cli.regression import main
    from graphgp_tpu.data.synthetic import generate_grid_data

    d = generate_grid_data(100, seed=3)  # stand-in sensor graph
    path = tmp_path / "pems.npz"
    _write_csr_npz(path, d["adjacency"], d["y_observed"].astype(np.float32))

    records = main([
        "--pems-npz", str(path),
        "--num-train", "50",
        "--walks", "50",
        "--max-walk-length", "3",
        "--train-steps", "40",
        "--seeds", "1",
        "--results-dir", str(tmp_path),
    ])
    kernels = {r["kernel"] for r in records}
    assert "exact_diffusion" in kernels and "grf_diffusion" in kernels
    assert all(np.isfinite(r["rmse"]) for r in records)


def test_bo_yaml_sweep_survives_failure(tmp_path):
    """YAML-driven multi-dataset BO sweep: an unknown dataset in the list
    records an error row and the remaining datasets still complete
    (reference fault-tolerance semantics, run_graph_bo.py:171-175)."""
    import pandas as pd

    from graphgp_tpu.cli.bo import main

    yaml_path = tmp_path / "exp.yaml"
    yaml_path.write_text(
        "datasets: [circle, no_such_dataset, grid]\n"
        "algorithms: [random_search, bfs]\n"
        "bo_parameters:\n"
        "  iterations: 3\n"
        "  runs: 2\n"
        "  initial_points: 5\n"
        "  batch_size: 1\n"
        "grf_parameters:\n"
        "  n_nodes: 64\n"
        "  walks_per_node: 20\n"
        "  max_walk_length: 3\n"
        f"directories:\n"
        f"  results: {tmp_path / 'results'}\n"
        f"  step_matrices: {tmp_path / 'cache'}\n"
    )
    records = main(["--config", str(yaml_path)])

    errors = [r for r in records if "error" in r]
    assert len(errors) == 1 and errors[0]["graph_type"] == "no_such_dataset"
    ok = [r for r in records if "error" not in r]
    assert {r["graph_type"] for r in ok} == {"circle", "grid"}
    assert {r["algorithm"] for r in ok} == {"random_search", "bfs"}
    # combined CSV written and loadable
    df = pd.read_csv(tmp_path / "results" / "bo.csv")
    assert "error" in df.columns and len(df) == len(records)


def test_config_flag_cli_override(tmp_path):
    """Explicit CLI flags override YAML values."""
    from graphgp_tpu.cli.bo import main

    yaml_path = tmp_path / "exp.yaml"
    yaml_path.write_text(
        "graph_type: circle\n"
        "algorithms: [random_search]\n"
        "bo_parameters:\n"
        "  iterations: 2\n"
        "  runs: 3\n"
        "  initial_points: 4\n"
        "  batch_size: 1\n"
        "grf_parameters:\n"
        "  n_nodes: 32\n"
        f"directories:\n"
        f"  results: {tmp_path / 'results'}\n"
        f"  step_matrices: {tmp_path / 'cache'}\n"
    )
    records = main(["--config", str(yaml_path), "--runs", "1"])
    assert {r["seed"] for r in records} == {100}  # one run, not three
    assert all(r["graph_type"] == "circle" for r in records)


def test_run_all_orchestrator(tmp_path):
    from graphgp_tpu.cli.run_all import main

    records = main([
        "--graph-types", "circle", "grid",
        "--n-nodes", "64",
        "--runs", "1",
        "--iterations", "3",
        "--algorithms", "random_search",
        "--initial-points", "5",
        "--results-dir", str(tmp_path),
        "--cache-dir", str(tmp_path / "cache"),
    ])
    ok = [r for r in records if "error" not in r]
    assert {r["graph_type"] for r in ok} == {"circle", "grid"}
    assert (tmp_path / "bo_all_graphs.csv").exists()


def test_hmc_driver_small(tmp_path):
    from graphgp_tpu.cli.hmc import main

    records = main([
        "--graph-type", "circle",
        "--n-nodes", "60",
        "--walks-per-node", "100",
        "--max-walk-length", "3",
        "--num-chains", "2",
        "--num-warmup", "40",
        "--num-samples", "40",
        "--num-leapfrog", "6",
        "--results-dir", str(tmp_path),
    ])
    by_name = {r["quantity"]: r["value"] for r in records}
    assert by_name["accept_chain0"] > 0.2
    assert np.isfinite(by_name["bayes_nlpd"])
    assert by_name["beta_std"] > 0
