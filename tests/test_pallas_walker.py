"""Pallas fused walker vs the XLA reference walkers.

Runs in interpreter mode on the CPU test platform; the same kernel compiles
via Mosaic on TPU (validated by bench/pallas paths). RNG is the same counter
hash in every walker, so walks are identical and only f32 accumulation order
/ the bf16-exact 3-term split (~2^-21 relative) differ.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphgp_tpu import WalkConfig, pack_laplacian
from graphgp_tpu.pallas_kernels import sample_dense_step_matrices_pallas
from graphgp_tpu.pallas_kernels.walker import (
    _hash_i32,
    _split3,
    _uniform_01_i32,
)
from graphgp_tpu.walker import (
    _hash_words,
    _key_words,
    _uniform_01,
    sample_dense_step_matrices,
)


def _mesh_graph(side):
    n = side * side
    adj = np.zeros((n, n), np.float32)
    for r in range(side):
        for c in range(side):
            i = r * side + c
            if r + 1 < side:
                adj[i, i + side] = adj[i + side, i] = 1
            if c + 1 < side:
                adj[i, i + 1] = adj[i + 1, i] = 1
    return adj


def test_int32_hash_matches_uint32_hash():
    key = jax.random.PRNGKey(11)
    k0, k1 = _key_words(key)
    node = jnp.arange(64, dtype=jnp.uint32)[:, None]
    walk = jnp.arange(8, dtype=jnp.uint32)[None, :]
    want = _uniform_01(_hash_words(k0, k1, jnp.uint32(5), node, walk))
    s = jax.lax.bitcast_convert_type(
        jnp.stack([k0, k1]).astype(jnp.uint32), jnp.int32
    )
    got = _uniform_01_i32(
        _hash_i32(
            s[0], s[1], jnp.int32(5), node.astype(jnp.int32), walk.astype(jnp.int32)
        )
    )
    assert bool(jnp.all(want == got))


def test_split3_reconstructs_f32():
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(256).astype(np.float32)
    ) * jnp.float32(37.5)
    t1, t2, t3 = _split3(x)
    rec = t1 + t2 + t3
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), rtol=2**-20)
    # every term is bf16-exact
    for t in (t1, t2, t3):
        again = jnp.asarray(np.asarray(t, np.float32))
        bits = np.asarray(jax.lax.bitcast_convert_type(again, jnp.int32))
        assert (bits & 0xFFFF == 0).all()


@pytest.mark.parametrize("ablation", [False, True])
def test_pallas_matches_xla_walker(ablation):
    adj = _mesh_graph(8)
    g = pack_laplacian(adj)
    cfg = WalkConfig(
        walks_per_node=32, p_halt=0.1, max_walk_length=5, ablation=ablation
    )
    key = jax.random.PRNGKey(3)
    want = np.asarray(sample_dense_step_matrices(g, key, cfg))
    got = np.asarray(
        sample_dense_step_matrices_pallas(
            g, key, cfg, node_block=8, walk_block=8, interpret=True
        )
    )
    assert got.shape == (5, 64, 64)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got[0], np.eye(64), atol=0)


def test_pallas_odd_walks_per_node_falls_back_to_unit_block():
    # wpn=50 (README quickstart) has no pow2 factor > 2; the wrapper shrinks
    # the walk block and must still match.
    adj = _mesh_graph(4)
    g = pack_laplacian(adj)
    cfg = WalkConfig(walks_per_node=50, p_halt=0.1, max_walk_length=3)
    key = jax.random.PRNGKey(0)
    want = np.asarray(sample_dense_step_matrices(g, key, cfg))
    got = np.asarray(
        sample_dense_step_matrices_pallas(g, key, cfg, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pallas_rejects_large_n():
    from graphgp_tpu.pallas_kernels.walker import PALLAS_MAX_NODES

    neighbors = jnp.zeros((PALLAS_MAX_NODES + 1, 1), jnp.int32)
    weights = jnp.zeros((PALLAS_MAX_NODES + 1, 1), jnp.float32)
    degree = jnp.zeros((PALLAS_MAX_NODES + 1,), jnp.int32)
    from graphgp_tpu.graphs import PackedGraph

    g = PackedGraph(
        neighbors=neighbors,
        weights=weights,
        degree=degree,
        num_nodes=PALLAS_MAX_NODES + 1,
        max_degree=1,
    )
    with pytest.raises(ValueError, match="Pallas dense walker supports"):
        sample_dense_step_matrices_pallas(
            g, jax.random.PRNGKey(0), WalkConfig(walks_per_node=8)
        )
