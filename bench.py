"""Benchmark: GRF random-walk sampling throughput on one TPU chip.

Protocol mirrors the reference scaling experiment's RW-sampling benchmark
(reference experiments/sparse/scaling_exp/run_scaling_experiment.py:329-379:
ring graph, walks_per_node=100, p_halt=0.1, max_walk_length=3), at N=2^20 —
the top of the reference's sparse sweep.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: reference sparse sampler measured on this machine's CPUs
(fork-pool, all cores): 82,810 walks/s at N=2^14, wpn=100, L=3 — measured
2026-08-17 on this container (2 cores). The walk workload is per-walk
identical (same wpn × N definition).
"""
import json
import time

import numpy as np

REFERENCE_WALKS_PER_S = 82_810.0


def ring_csr(n: int):
    import scipy.sparse as sp

    rows = np.arange(n)
    cols = (rows + 1) % n
    adj = sp.csr_matrix((np.ones(n), (rows, cols)), shape=(n, n))
    return adj + adj.T


def main():
    import jax

    from graphgp_tpu import WalkConfig, pack_laplacian, sample_walk_log

    n = 2**20
    cfg = WalkConfig(walks_per_node=100, p_halt=0.1, max_walk_length=3)
    graph = pack_laplacian(ring_csr(n))

    import jax.numpy as jnp

    # compile + warmup; the scalar fetch forces full materialization (plain
    # block_until_ready has proven unreliable through the remote-TPU tunnel)
    log = sample_walk_log(graph, jax.random.PRNGKey(0), cfg)
    float(jnp.sum(log.loads))

    times = []
    for i in range(3):
        t0 = time.time()
        log = sample_walk_log(graph, jax.random.PRNGKey(i + 1), cfg)
        float(jnp.sum(log.loads))
        times.append(time.time() - t0)
    dt = min(times)
    walks_per_s = n * cfg.walks_per_node / dt

    print(
        json.dumps(
            {
                "metric": "grf_walk_throughput_n1M_wpn100_L3",
                "value": round(walks_per_s, 1),
                "unit": "walks/s/chip",
                "vs_baseline": round(walks_per_s / REFERENCE_WALKS_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
