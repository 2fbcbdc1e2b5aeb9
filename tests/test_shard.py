"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphgp_tpu import WalkConfig, pack_laplacian
from graphgp_tpu.features import LogFeatures
from graphgp_tpu.gp import iterative
from graphgp_tpu.gp import params as P
from graphgp_tpu.shard import make_mesh, shard_features, sharded_walk_log
from graphgp_tpu.walker import sample_walk_log


def _ring(n):
    adj = np.zeros((n, n))
    idx = np.arange(n)
    adj[idx, (idx + 1) % n] = 1.0
    adj[(idx + 1) % n, idx] = 1.0
    return adj


def test_sharded_walk_bit_identical():
    """Sharded walk == single-device walk, bit for bit — the reproducibility
    property the reference's fork-pool lacks (SURVEY §5.2)."""
    graph = pack_laplacian(_ring(64))
    cfg = WalkConfig(walks_per_node=6, p_halt=0.2, max_walk_length=4)
    key = jax.random.PRNGKey(0)
    single = sample_walk_log(graph, key, cfg)
    mesh = make_mesh(8)
    sharded = sharded_walk_log(graph, key, cfg, mesh)
    np.testing.assert_array_equal(np.asarray(single.curs), np.asarray(sharded.curs))
    np.testing.assert_array_equal(np.asarray(single.loads), np.asarray(sharded.loads))


def test_sharded_walk_unpadded_tail():
    """Node count not divisible by mesh size: tail junk is sliced off."""
    graph = pack_laplacian(_ring(52))
    cfg = WalkConfig(walks_per_node=4, p_halt=0.2, max_walk_length=3)
    key = jax.random.PRNGKey(3)
    single = sample_walk_log(graph, key, cfg)
    sharded = sharded_walk_log(graph, key, cfg, make_mesh(8))
    assert sharded.curs.shape == (3, 52, 4)
    np.testing.assert_array_equal(np.asarray(single.curs), np.asarray(sharded.curs))


def test_graft_entry_and_dryrun():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out))
    ge.dryrun_multichip(8)


def test_sharded_training_reduces_loss():
    """Sharded CG training step actually optimizes."""
    n = 128
    graph = pack_laplacian(_ring(n))
    cfg = WalkConfig(walks_per_node=50, p_halt=0.1, max_walk_length=4)
    mesh = make_mesh(8)
    log = sharded_walk_log(graph, jax.random.PRNGKey(0), cfg, mesh)
    feats = shard_features(LogFeatures(log, num_target_nodes=n), mesh)
    train_idx = jnp.arange(0, n, 2, dtype=jnp.int32)
    y = jnp.sin(jnp.arange(train_idx.shape[0], dtype=jnp.float32) * 0.2)
    res = iterative.fit(
        feats, train_idx, y, kind="diffusion", num_steps=15,
        settings=iterative.CGSettings(cg_tol=1e-3, cg_max_iters=50, num_probes=4),
    )
    losses = np.asarray(res.losses)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_distributed_gram_solve_matches_single_device():
    """Explicit-psum distributed CG == single-device CG solution."""
    from graphgp_tpu.features import LogFeatures
    from graphgp_tpu.gp import params as P
    from graphgp_tpu.gp.iterative import make_ktt_matvec
    from graphgp_tpu.linalg import batched_cg
    from graphgp_tpu.shard import distributed_gram_solve

    n = 64
    graph = pack_laplacian(_ring(n))
    cfg = WalkConfig(walks_per_node=30, p_halt=0.1, max_walk_length=3)
    log = sample_walk_log(graph, jax.random.PRNGKey(0), cfg)
    feats = LogFeatures(log, num_target_nodes=n)
    params = P.init_params("diffusion", 3, jax.random.PRNGKey(1), noise=0.3)
    train_idx = jnp.arange(0, n, 2, dtype=jnp.int32)
    b = jax.random.normal(jax.random.PRNGKey(2), (train_idx.shape[0], 3))

    ref = batched_cg(
        make_ktt_matvec("diffusion"), (params, feats, train_idx), b,
        tol=1e-8, max_iters=300,
    ).x
    mesh = make_mesh(8)
    got = distributed_gram_solve(
        feats, params, train_idx, b, mesh, kind="diffusion",
        tol=1e-8, max_iters=300,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-3, atol=1e-4)

    # single-vector path
    got1 = distributed_gram_solve(
        feats, params, train_idx, b[:, 0], mesh, kind="diffusion",
        tol=1e-8, max_iters=300,
    )
    np.testing.assert_allclose(np.asarray(got1), np.asarray(ref[:, 0]), rtol=1e-3, atol=1e-4)


def test_distributed_gram_solve_pads_arbitrary_n():
    """Node counts not divisible by the mesh size (e.g. Cora's 2485 on 8
    chips) are zero-padded internally — exactly, since padded Φ rows are 0."""
    from graphgp_tpu.features import LogFeatures
    from graphgp_tpu.gp import params as P
    from graphgp_tpu.gp.iterative import make_ktt_matvec
    from graphgp_tpu.linalg import batched_cg
    from graphgp_tpu.shard import distributed_gram_solve

    n = 61  # prime-ish: not divisible by 8
    graph = pack_laplacian(_ring(n))
    cfg = WalkConfig(walks_per_node=20, p_halt=0.1, max_walk_length=3)
    log = sample_walk_log(graph, jax.random.PRNGKey(4), cfg)
    feats = LogFeatures(log, num_target_nodes=n)
    params = P.init_params("diffusion", 3, jax.random.PRNGKey(1), noise=0.3)
    train_idx = jnp.asarray(np.arange(1, n, 3), jnp.int32)
    b = jax.random.normal(jax.random.PRNGKey(5), (train_idx.shape[0],))

    ref = batched_cg(
        make_ktt_matvec("diffusion"), (params, feats, train_idx), b[:, None],
        tol=1e-8, max_iters=300,
    ).x[:, 0]
    got = distributed_gram_solve(
        feats, params, train_idx, b, make_mesh(8), kind="diffusion",
        tol=1e-8, max_iters=300,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-3, atol=1e-4)


def _count_psums(jaxpr) -> int:
    """Recursively count psum equations in a jaxpr."""
    import jax.extend.core as jex_core

    count = 0
    for eqn in jaxpr.eqns:
        if "psum" in eqn.primitive.name:
            count += 1
        for v in eqn.params.values():
            sub = getattr(v, "jaxpr", v)
            if isinstance(sub, (jex_core.Jaxpr,)):
                count += _count_psums(sub)
            elif isinstance(v, (list, tuple)):
                for item in v:
                    s = getattr(item, "jaxpr", item)
                    if isinstance(s, jex_core.Jaxpr):
                        count += _count_psums(s)
    return count


def test_distributed_gram_solve_two_psums_per_iteration():
    """The collective structure claim is enforced: the traced solve contains
    exactly 4 psums total — 2 in the initial residual matvec + 2 in the CG
    while-loop body (i.e. 2 all-reduces per iteration ride the ICI)."""
    from graphgp_tpu.features import LogFeatures
    from graphgp_tpu.gp import params as P
    from graphgp_tpu.shard import distributed_gram_solve

    n = 64
    graph = pack_laplacian(_ring(n))
    cfg = WalkConfig(walks_per_node=10, p_halt=0.2, max_walk_length=3)
    log = sample_walk_log(graph, jax.random.PRNGKey(0), cfg)
    feats = LogFeatures(log, num_target_nodes=n)
    params = P.init_params("diffusion", 3, jax.random.PRNGKey(1), noise=0.3)
    train_idx = jnp.arange(0, n, 2, dtype=jnp.int32)
    b = jnp.ones((train_idx.shape[0],))
    mesh = make_mesh(8)

    jaxpr = jax.make_jaxpr(
        lambda bb: distributed_gram_solve(
            feats, params, train_idx, bb, mesh, kind="diffusion"
        )
    )(b)
    assert _count_psums(jaxpr.jaxpr) == 4, jaxpr


def test_hmc_chains_sharded_over_mesh():
    """≥8 HMC chains sharded over the 8-device mesh must recover the target
    distribution and mix (per-parameter split-chain R-hat ≈ 1).

    Trajectory-level equality with the unsharded run is NOT asserted: HMC is
    chaotic, and XLA compiles a differently-partitioned program for the
    sharded case, so one-ULP rounding differences diverge the paths. The
    correctness bar is distributional: moments against the analytic target.
    """
    from graphgp_tpu.gp import hmc

    # 3-d correlated Gaussian target — cheap, exact, non-trivial geometry
    prec = np.asarray(
        [[2.0, 0.5, 0.0], [0.5, 1.5, 0.3], [0.0, 0.3, 1.0]], np.float32
    )
    prec_j = jnp.asarray(prec)

    def log_prob(params):
        x = params["x"]
        return -0.5 * x @ prec_j @ x

    init = {"x": jnp.zeros(3, jnp.float32)}
    cfg = hmc.HMCConfig(num_warmup=200, num_samples=600, num_leapfrog=8)
    key = jax.random.PRNGKey(0)

    mesh = make_mesh(8, axis_name="chains")
    res = hmc.sample(log_prob, init, key, config=cfg, num_chains=8, mesh=mesh)
    draws = np.asarray(res.samples["x"]).reshape(-1, 3)  # (8*600, 3)
    target_cov = np.linalg.inv(prec)
    np.testing.assert_allclose(draws.mean(0), np.zeros(3), atol=0.12)
    np.testing.assert_allclose(np.cov(draws.T), target_cov, atol=0.15)

    # mixing: per-parameter split-chain R-hat near 1 for every element
    rhat = np.asarray(hmc.split_rhat_tree(res.samples)["x"])
    assert rhat.shape == (3,)
    assert np.all(rhat < 1.1), rhat
    assert np.all(np.asarray(res.accept_rate) > 0.5)

    # padding path: 10 chains on 8 devices → padded to 16 internally
    res_pad = hmc.sample(log_prob, init, key, config=cfg, num_chains=10, mesh=mesh)
    assert res_pad.samples["x"].shape[0] == 10
    assert np.isfinite(np.asarray(res_pad.log_probs)).all()
