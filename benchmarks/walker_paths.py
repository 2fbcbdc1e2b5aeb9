"""Hardware shoot-out of the three dense walker paths on the real TPU chip.

Runs gather (XLA scatter walker), MXU one-hot, and the fused Pallas kernel at
the reference's dense-protocol shapes (ablation 30x30 mesh, traffic ~1k
sensors, Cora 2485 nodes — reference experiments/dense/*, SURVEY.md §6) and
reports seconds per kernel build plus max|Δ| against the gather path (same
RNG stream, so only f32 accumulation order may differ).

Usage:  python benchmarks/walker_paths.py [--reps 3]
Output: a markdown table on stdout; paste into docs/WALKER_PATHS.md.
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from graphgp_tpu.graphs import pack_laplacian
from graphgp_tpu.walker import (
    WalkConfig,
    sample_dense_step_matrices,
    sample_dense_step_matrices_mxu,
)
from graphgp_tpu.pallas_kernels import sample_dense_step_matrices_pallas


def mesh_adj(side: int) -> sp.csr_matrix:
    n = side * side
    idx = np.arange(n).reshape(side, side)
    rows = np.concatenate([idx[:-1].ravel(), idx[:, :-1].ravel()])
    cols = np.concatenate([idx[1:].ravel(), idx[:, 1:].ravel()])
    adj = sp.csr_matrix((np.ones(rows.size), (rows, cols)), shape=(n, n))
    return adj + adj.T


def random_adj(n: int, avg_degree: int, seed: int) -> sp.csr_matrix:
    rng = np.random.default_rng(seed)
    m = n * avg_degree // 2
    rows = rng.integers(0, n, m)
    cols = rng.integers(0, n, m)
    keep = rows != cols
    adj = sp.csr_matrix(
        (np.ones(keep.sum()), (rows[keep], cols[keep])), shape=(n, n)
    )
    adj = ((adj + adj.T) > 0).astype(np.float64)
    return sp.csr_matrix(adj)


def timeit(fn, reps: int) -> float:
    fn()  # compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times)


CASES = [
    # (label, graph builder, wpn, p_halt, L) — reference protocol shapes
    ("ablation 30x30 wpn=1000 L=10", lambda: mesh_adj(30), 1000, 0.01, 10),
    ("traffic-like N=1024 wpn=4096 L=10", lambda: random_adj(1024, 6, 0), 4096, 0.1, 10),
    ("cora-like N=2485 wpn=4096 L=5", lambda: random_adj(2485, 4, 1), 4096, 0.1, 5),
    ("quickstart N=256 wpn=8192 L=5", lambda: random_adj(256, 4, 2), 8192, 0.1, 5),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    backend = jax.default_backend()
    dev = jax.devices()[0]
    print(f"backend={backend} device={dev.device_kind}")
    print()
    print("| case | gather s | mxu s | pallas s | best | max|Δ| mxu | max|Δ| pallas |")
    print("|---|---|---|---|---|---|---|")

    for label, build, wpn, p_halt, lmax in CASES:
        graph = pack_laplacian(build())
        cfg = WalkConfig(walks_per_node=wpn, p_halt=p_halt, max_walk_length=lmax)
        key = jax.random.PRNGKey(0)

        ref = sample_dense_step_matrices(graph, key, cfg)
        ref.block_until_ready()

        def run_gather():
            sample_dense_step_matrices(graph, key, cfg).block_until_ready()

        def run_mxu():
            sample_dense_step_matrices_mxu(graph, key, cfg).block_until_ready()

        def run_pallas():
            sample_dense_step_matrices_pallas(graph, key, cfg).block_until_ready()

        t_gather = timeit(run_gather, args.reps)
        t_mxu = timeit(run_mxu, args.reps)
        try:
            t_pallas = timeit(run_pallas, args.reps)
            d_pallas = float(
                jnp.max(jnp.abs(sample_dense_step_matrices_pallas(graph, key, cfg) - ref))
            )
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            t_pallas, d_pallas = float("nan"), float("nan")
            print(f"<!-- pallas failed on {label}: {type(e).__name__}: {e} -->")
        d_mxu = float(
            jnp.max(jnp.abs(sample_dense_step_matrices_mxu(graph, key, cfg) - ref))
        )
        times = {"gather": t_gather, "mxu": t_mxu, "pallas": t_pallas}
        best = min((v, k) for k, v in times.items() if v == v)[1]
        print(
            f"| {label} | {t_gather:.3f} | {t_mxu:.3f} | {t_pallas:.3f} "
            f"| {best} | {d_mxu:.2e} | {d_pallas:.2e} |"
        )


if __name__ == "__main__":
    main()
