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
        "exact_diffusion", "grf_diffusion", "grf_free", "pofm_diffusion", "pofm_free",
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
