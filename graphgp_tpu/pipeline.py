"""Blocked walk→consolidate pipeline: million-node kernel builds on one chip.

The reference's flagship regime is N=1e6 nodes × walks_per_node=1000 ×
max_walk_length=5 (reference experiments/sparse/scalable_bo/run_bo.py:29-50),
which its sparse sampler handles with O(nnz) memory by accumulating per-walk
dict entries (reference efficient_graph_gp_sparse/random_walk_samplers_sparse/
sparse_sampler.py:72-132). A monolithic TPU walk of that config would
materialize a 40 GB (L, N, W) walk log — infeasible in HBM.

This module walks *start-node blocks* under one ``lax.scan``: each block's
(L, B, W) log lives only for its scan iteration and is consolidated on-device
into ELL rows of static ``capacity`` before the next block starts. Peak HBM is
one block log plus the output ELL tensor — both user-bounded — and nothing
ever round-trips to host except two scalars (the capacity probe and the
overflow check).

Capacity protocol:
  1. Probe: walk block 0, compute the max distinct live columns per row on
     device (one sort, one scalar to host), pad with margin.
  2. Run all blocks at that static capacity; each consolidation also reports
     its max-distinct stat, reduced across blocks by the scan.
  3. If any block overflowed (max_distinct > capacity) the whole pipeline
     restarts with a larger capacity. The counter-based walk RNG keys on
     global node ids, so a restart (or any change of block size) is
     bit-identical — results never depend on the blocking.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .features import EllFeatures, EllStepMatrices, _consolidate_rows
from .walker import WalkConfig, sample_walk_log

# Default HBM budget for one block's transient (L, B, W) walk log. The
# consolidation sort materializes ~4× this (argsort keys/values + outputs),
# and the output ELL tensor (L·N·capacity·8 bytes, ×2 transient during the
# final transpose) is separate — so the realistic peak is roughly
# 4×budget + 2×ELL. 256 MB keeps the flagship N=1e6 × wpn=1000 × L=5 build
# comfortably inside a 16 GB chip. Callers with huge N and fat rows should
# shard over a mesh instead.
DEFAULT_LOG_BUDGET_BYTES = 256 << 20


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def auto_block_size(
    num_nodes: int,
    cfg: WalkConfig,
    log_budget_bytes: int = DEFAULT_LOG_BUDGET_BYTES,
) -> int:
    """Largest start-node block whose (L, B, W) curs+loads log fits budget."""
    per_node = max(cfg.max_walk_length, 1) * cfg.walks_per_node * 8
    block = max(log_budget_bytes // per_node, 64)
    if block >= num_nodes:
        return num_nodes
    return max(_round_up(block, 8) - 8, 64) if block > 64 else 64


@partial(jax.jit, static_argnames=("cfg", "block_size"))
def _probe_max_distinct(graph, key, cfg: WalkConfig, block_size: int):
    log = sample_walk_log(
        graph, key, cfg, node_offset=0, num_start_nodes=block_size
    )
    from .features import max_row_distinct

    return max_row_distinct(log)


@partial(
    jax.jit,
    static_argnames=("cfg", "capacity", "block_size"),
    donate_argnums=(0, 1),
)
def _consolidate_one_block(
    cols_acc, vals_acc, graph, key, bix, cfg: WalkConfig, capacity: int,
    block_size: int,
):
    """Walk one start-node block, consolidate it, land it in the accumulator.

    The accumulators are donated, so XLA updates them in place — exactly one
    (L, N, R) cols/vals pair is ever resident. ``bix`` is a traced scalar:
    one compile serves every block.
    """
    inv_w = jnp.float32(1.0 / cfg.walks_per_node)
    log = sample_walk_log(
        graph, key, cfg, node_offset=bix * block_size,
        num_start_nodes=block_size,
    )
    cols, vals, maxd = _consolidate_rows(log.curs, log.loads * inv_w, capacity)
    start = bix * block_size
    cols_acc = jax.lax.dynamic_update_slice(cols_acc, cols, (0, start, 0))
    vals_acc = jax.lax.dynamic_update_slice(vals_acc, vals, (0, start, 0))
    return cols_acc, vals_acc, maxd


def _blocked_consolidate(
    graph, key, cfg: WalkConfig, capacity: int, block_size: int, num_blocks: int
):
    # A Python loop of short per-block XLA programs, NOT one giant lax.scan:
    # a single program spanning all blocks takes minutes to compile at
    # num_blocks ≈ 150 and its multi-minute device time trips the TPU worker
    # watchdog (observed as "TPU worker crashed" at N ≥ 3e5 on v5e). The
    # per-block maxd scalars stay on device until the final stack, so the
    # loop runs fully async.
    l = cfg.max_walk_length
    n_pad = num_blocks * block_size
    cols = jnp.zeros((l, n_pad, capacity), jnp.int32)
    vals = jnp.zeros((l, n_pad, capacity), jnp.float32)
    maxds = []
    for bix in range(num_blocks):
        cols, vals, maxd = _consolidate_one_block(
            cols, vals, graph, key, jnp.int32(bix), cfg, capacity, block_size
        )
        maxds.append(maxd)
    return cols, vals, jnp.max(jnp.stack(maxds))


def blocked_ell_features(
    graph,
    key: jax.Array,
    cfg: WalkConfig,
    *,
    block_size: Optional[int] = None,
    capacity: Optional[int] = None,
    num_target_nodes: Optional[int] = None,
    log_budget_bytes: int = DEFAULT_LOG_BUDGET_BYTES,
    capacity_margin: float = 1.25,
    multiple: int = 8,
) -> EllFeatures:
    """Walk + consolidate a graph of any size into ELL step matrices without
    ever materializing the full (L, N, W) walk log.

    Functional equivalent of reference
    ``SparseRandomWalk.get_random_walk_matrices`` (sparse_sampler.py:72-132)
    at its million-node operating point, as a device-resident blocked scan.

    Args:
        graph: PackedGraph / CsrGraph over the full node set (gather tables
            must cover all reachable nodes).
        block_size: start nodes per scan block (default: sized so the block
            log fits ``log_budget_bytes``).
        capacity: ELL row capacity; ``None`` probes block 0 and pads by
            ``capacity_margin``, restarting on overflow (restart is
            bit-identical thanks to the counter-based RNG).

    Returns:
        EllFeatures with (L, N, capacity) cols/vals on device.
    """
    n = graph.num_nodes
    w = cfg.walks_per_node
    nt = num_target_nodes or n
    block = block_size or auto_block_size(n, cfg, log_budget_bytes)
    block = min(block, n)
    num_blocks = -(-n // block)

    if capacity is None:
        probed = max(int(_probe_max_distinct(graph, key, cfg, block)), 1)
        capacity = min(_round_up(int(probed * capacity_margin), multiple), w)

    while True:
        cols, vals, maxd = _blocked_consolidate(
            graph, key, cfg, capacity, block, num_blocks
        )
        maxd = int(maxd)
        if maxd <= capacity or capacity >= w:
            break
        # Overflow: some later block had fatter rows than the probe. Rerun at
        # the observed max (+margin). Rare; deterministic RNG → identical walks.
        capacity = min(_round_up(int(maxd * capacity_margin), multiple), w)

    if num_blocks * block != n:
        cols = cols[:, :n, :]
        vals = vals[:, :n, :]
    return EllFeatures(
        EllStepMatrices(cols=cols, vals=vals, num_target_nodes=nt)
    )
