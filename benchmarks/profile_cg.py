"""Microprofile of the N=1e6 stencil CG iteration: which op eats the time?

Times each piece of the Gram matvec (expand scatter, rmatvec, matvec,
gather, axpy-style CG vector ops) at the bench shape so the bottleneck is
measured, not guessed.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from graphgp_tpu import WalkConfig, blocked_ell_features, pack_laplacian
from graphgp_tpu.features import StencilFeatures, ell_to_stencil
from graphgp_tpu.gp import params as P
from graphgp_tpu.gp.iterative import make_ktt_matvec_bm, _expand_bm


def grid_csr(side):
    n = side * side
    idx = np.arange(n).reshape(side, side)
    rows = np.concatenate([idx[:-1].ravel(), idx[:, :-1].ravel()])
    cols = np.concatenate([idx[1:].ravel(), idx[:, 1:].ravel()])
    adj = sp.csr_matrix((np.ones(rows.size), (rows, cols)), shape=(n, n))
    return adj + adj.T


def bench(label, fn, *args, reps=3):
    print(f"{label:40s} ...", flush=True)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    print(
        f"{label:40s} {min(times)*1e3:9.2f} ms  (first call {compile_s:.1f}s)",
        flush=True,
    )
    return out


def main():
    side = 1000
    graph = pack_laplacian(grid_csr(side))
    cfg = WalkConfig(walks_per_node=1000, p_halt=0.1, max_walk_length=5)
    feats_ell = blocked_ell_features(graph, jax.random.PRNGKey(0), cfg)
    stencil = ell_to_stencil(feats_ell.mats)
    sfeats = StencilFeatures(stencil)
    n = sfeats.num_nodes
    print(f"n={n} offsets={stencil.num_offsets}")

    train_idx = jnp.arange(0, n, 2, dtype=jnp.int32)
    nt = train_idx.shape[0]
    params = P.init_params("diffusion", 5, jax.random.PRNGKey(0), noise=0.1)
    f = P.modulator("diffusion", params, 5)
    B = 8
    v = jax.random.normal(jax.random.PRNGKey(1), (B, nt))
    vfull = jax.random.normal(jax.random.PRNGKey(2), (B, n))

    # single roll for scale
    roll = jax.jit(lambda u: jnp.roll(u, 1, axis=-1))
    bench("single roll (B,1M)", roll, vfull)

    gath = jax.jit(lambda u: u[:, train_idx])
    bench("gather (B,1M)->(B,500k)", gath, vfull)

    rmv = jax.jit(lambda u: sfeats.rmatvec_bm(f, u))
    bench("stencil rmatvec_bm (B,1M)", rmv, vfull)

    mv = jax.jit(lambda u: sfeats.matvec_bm(f, u))
    bench("stencil matvec_bm (B,1M)", mv, vfull)

    w = jax.jit(lambda: jnp.einsum("l,lsn->sn", f, stencil.vals))
    bench("modulator contraction w=(S,N)", w)

    # CG vector ops per iteration roughly: 2 dots, 2 axpy on (B, nt)
    axpy = jax.jit(lambda a, x, y: y + a * x)
    alpha = jnp.ones((B, 1))
    bench("axpy (B,500k)", axpy, alpha, v, v)
    dot = jax.jit(lambda x, y: jnp.sum(x * y, axis=-1))
    bench("batched dot (B,500k)", dot, v, v)

    expand = jax.jit(lambda v: _expand_bm(v, train_idx, n))
    bench("expand scatter (B,500k)->(B,1M)", expand, v, reps=1)

    matvec = make_ktt_matvec_bm("diffusion")
    full = jax.jit(lambda v: matvec((params, sfeats, train_idx), v))
    bench("full Gram matvec", full, v, reps=1)

    # fused stencil product without per-call w contraction
    wfix = jnp.einsum("l,lsn->sn", f, stencil.vals)

    def rmv_fixed(u):
        out = jnp.zeros_like(u)
        for si, off in enumerate(stencil.offsets.tolist()):
            out = out + jnp.roll(wfix[si][None, :] * u, off, axis=-1)
        return out

    bench("rmatvec with precomputed w", jax.jit(rmv_fixed), vfull)


if __name__ == "__main__":
    main()
