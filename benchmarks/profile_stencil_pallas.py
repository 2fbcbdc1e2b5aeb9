"""On-chip validation + timing of the Pallas stencil products at the
flagship shape (N=1e6 grid, L=5, S≈41), vs the XLA roll chain, plus CG
iters/s through a Pallas-backed Gram operator."""
import time

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from graphgp_tpu import WalkConfig, blocked_ell_features, pack_laplacian
from graphgp_tpu.features import (
    StencilFeatures, contract, ell_to_stencil,
)
from graphgp_tpu.gp import params as P
from graphgp_tpu.linalg import batched_cg
from graphgp_tpu.pallas_kernels import stencil as ps


def grid_csr(side):
    n = side * side
    idx = np.arange(n).reshape(side, side)
    rows = np.concatenate([idx[:-1].ravel(), idx[:, :-1].ravel()])
    cols = np.concatenate([idx[1:].ravel(), idx[:, 1:].ravel()])
    adj = sp.csr_matrix((np.ones(rows.size), (rows, cols)), shape=(n, n))
    return adj + adj.T


def timeit(fn, reps=3):
    t0 = time.perf_counter()
    jax.block_until_ready(fn())
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts), compile_s


def main():
    side = 1000
    graph = pack_laplacian(grid_csr(side))
    cfg = WalkConfig(walks_per_node=1000, p_halt=0.1, max_walk_length=5)
    print("building features...", flush=True)
    feats = blocked_ell_features(graph, jax.random.PRNGKey(0), cfg)
    stencil = ell_to_stencil(feats.mats)
    sfeats = StencilFeatures(stencil)
    n = sfeats.num_nodes
    print(f"n={n} offsets={stencil.num_offsets}", flush=True)
    print("applicable:", ps.pallas_applicable(n, stencil.num_offsets, stencil.offsets), flush=True)

    params = P.init_params("diffusion", 5, jax.random.PRNGKey(0), noise=0.1)
    f = P.modulator("diffusion", params, 5)
    w = jnp.einsum("l,lsn->sn", f, stencil.vals)
    B = 8
    v = jax.random.normal(jax.random.PRNGKey(1), (B, n))

    # XLA roll chain (argument-passed, no giant closure constants)
    phi = contract(sfeats, f)
    mv_x = jax.jit(lambda w_, v_: contract(StencilFeatures(
        stencil.__class__(vals=stencil.vals, offsets=stencil.offsets)), f).matvec_bm(v_))
    # simpler: time phi.matvec_bm via jit with phi as arg
    mv_xla = jax.jit(lambda p_, v_: p_.matvec_bm(v_))
    rv_xla = jax.jit(lambda p_, v_: p_.rmatvec_bm(v_))
    t, c = timeit(lambda: mv_xla(phi, v)); print(f"XLA matvec_bm   {t*1e3:8.2f} ms (compile {c:.1f}s)", flush=True)
    t, c = timeit(lambda: rv_xla(phi, v)); print(f"XLA rmatvec_bm  {t*1e3:8.2f} ms (compile {c:.1f}s)", flush=True)

    w_shift = jax.jit(
        lambda w_: ps.shifted_weights(w_, ps.center_offsets(stencil.offsets, n))
    )(w)

    out_x = mv_xla(phi, v)
    t, c = timeit(lambda: ps.matvec_bm(w, v, stencil.offsets))
    print(f"PL  matvec_bm   {t*1e3:8.2f} ms (compile {c:.1f}s)", flush=True)
    out_p = ps.matvec_bm(w, v, stencil.offsets)
    print("matvec max|d| :", float(jnp.max(jnp.abs(out_x - out_p))), flush=True)

    rout_x = rv_xla(phi, v)
    t, c = timeit(lambda: ps.rmatvec_bm(w_shift, v, stencil.offsets))
    print(f"PL  rmatvec_bm  {t*1e3:8.2f} ms (compile {c:.1f}s)", flush=True)
    rout_p = ps.rmatvec_bm(w_shift, v, stencil.offsets)
    print("rmatvec max|d|:", float(jnp.max(jnp.abs(rout_x - rout_p))), flush=True)

    # CG through the contracted operator (auto Pallas dispatch at this N)
    from graphgp_tpu.gp.iterative import make_gram_matvec_bm_full

    train_idx = jnp.arange(0, n, 2, dtype=jnp.int32)
    iters = 20
    matvec = make_gram_matvec_bm_full()

    @jax.jit
    def solve(params, sfeats, b, node_mask):
        f_ = P.modulator("diffusion", params, sfeats.max_walk_length)
        phi_ = contract(sfeats, f_)
        carry = (phi_, P.noise_variance(params), node_mask)
        return batched_cg(
            matvec, carry, b * node_mask[None, :], tol=0.0, max_iters=iters,
            batch_axis=0,
        ).x

    node_mask = jnp.zeros((n,), jnp.float32).at[train_idx].set(1.0)
    b = jax.random.normal(jax.random.PRNGKey(2), (B, n))
    t, c = timeit(lambda: solve(params, sfeats, b, node_mask), reps=2)
    print(f"PL CG {iters} iters: {t:.3f}s -> {iters/t:.1f} iters/s (compile {c:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
