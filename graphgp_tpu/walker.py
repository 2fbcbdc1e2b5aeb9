"""Vectorized random-walk engine (XLA path).

TPU-native re-design of the reference's triply-nested Python walk loops
(reference: efficient_graph_gp/random_walk_samplers/sampler.py:40-61 and
efficient_graph_gp_sparse/random_walk_samplers_sparse/sparse_sampler.py:40-55).

Design:
  * All ``N * walks_per_node`` walks advance in lockstep under one
    ``lax.scan`` over ``max_walk_length`` steps — no data-dependent control
    flow, static shapes throughout, so XLA tiles every step into two gathers,
    a handful of VPU elementwise ops, and (for the dense consumer) one
    scatter-add.
  * Early halting is an *alive mask*, not a break: a halted walk keeps riding
    the lanes with load masked to zero. p_halt geometrically truncates walks,
    so for typical p_halt the wasted lanes are bounded by L·p_halt.
  * RNG is a counter-based hash keyed by ``(key, step, global_node, walk)`` —
    results are bit-identical no matter how walks are sharded over devices
    (the reference's results change with n_processes; see SURVEY §5.2).

Estimator semantics match the reference's *principled* importance weights:
at each transition ``load *= degree * weight / (1 - p_halt)`` (reference
sampler.py:59, the multiplicative multiprocessing-path update — the unbiased
estimator making ``E[M_l] = L^l``). The ``ablation`` flag reproduces the
ad-hoc update ``load = weight`` (reference sampler.py:180-183).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .graphs import PackedGraph


@dataclasses.dataclass(frozen=True)
class WalkConfig:
    """Static walk hyperparameters (hashable; safe as a jit static arg)."""

    walks_per_node: int = 50
    p_halt: float = 0.1
    max_walk_length: int = 10
    ablation: bool = False


class WalkLog(NamedTuple):
    """Raw walk trace: the sparse-feature representation of the step matrices.

    ``M_l[i, j] = (1/W) * sum_w loads[l, i, w] * [curs[l, i, w] == j]``.

    curs: int32[L, N, W] — node occupied at step l by walk w from node i.
    loads: float32[L, N, W] — signed importance weight, 0 if the walk halted
        before step l (mask is pre-applied, so consumers never re-mask).
    """

    curs: jnp.ndarray
    loads: jnp.ndarray

    @property
    def max_walk_length(self) -> int:
        return self.curs.shape[0]

    @property
    def num_nodes(self) -> int:
        return self.curs.shape[1]

    @property
    def walks_per_node(self) -> int:
        return self.curs.shape[2]


# ---------------------------------------------------------------------------
# Counter-based RNG: splitmix32-style mixing, shard-invariant by construction.
# ---------------------------------------------------------------------------


def _mix(h: jnp.ndarray) -> jnp.ndarray:
    """splitmix32 finalizer: full-avalanche 32-bit mix."""
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x7FEB352D)
    h = h ^ (h >> 15)
    h = h * jnp.uint32(0x846CA68B)
    h = h ^ (h >> 16)
    return h


def _hash_words(*words: jnp.ndarray) -> jnp.ndarray:
    """Combine u32 words (broadcast) into one well-mixed u32 per element."""
    h = jnp.uint32(0x9E3779B9)
    for w in words:
        h = _mix(h ^ jnp.asarray(w, jnp.uint32))
    return h


def _key_words(key: jax.Array) -> Tuple[jnp.ndarray, jnp.ndarray]:
    data = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)
    return data[0], data[-1]


def _uniform_01(bits: jnp.ndarray) -> jnp.ndarray:
    """u32 → float32 uniform in [0, 1) with 24 bits of entropy."""
    return (bits >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


# ---------------------------------------------------------------------------
# The walk scan.
# ---------------------------------------------------------------------------


# Packed-table fast path: one fused row-gather per step instead of three
# scattered element gathers (~2.7x measured on v5e), viable while the one-hot
# selection stays cheap and f32 holds node ids exactly.
PACKED_MAX_DEGREE = 16
_F32_EXACT_INT = 1 << 24

# Walk-locality hop tables: at step l every alive lane sits at one of the
# max_degree^l exactly-l-step path endpoints of its start node, so the
# neighbor rows can be fetched once per (node, endpoint) and lanes resolved by
# an in-register id match — N*D^l row gathers instead of N*W. Used while the
# fanout stays under these caps, the fanout amortizes (D^l < walks_per_node),
# and only for a bounded number of Python-unrolled steps (degree-1 graphs keep
# fanout=1 forever; without the step cap trace time would grow linearly with
# max_walk_length). The (N, W, fanout) lane-resolution intermediates are NOT a
# viability concern: they are chunked over walk lanes (see _hop_lane_chunk),
# so only the fetched (N, fanout, F) row table must fit HOP_MAX_BYTES.
HOP_MAX_FANOUT = 32
HOP_MAX_BYTES = 1 << 30
HOP_MAX_STEPS = 6
# Lane-resolution sizing: one-shot while the (N, W, max(fanout, F)) transient
# stays under HOP_ONESHOT_BYTES (measured safe on a 16 GB v5e: the N=2^20,
# W=100 ring walk peaks ~7 GB total and runs 7.4x faster than per-lane
# gathers); above that, lanes are processed in walk chunks bounded by
# HOP_CHUNK_BYTES under a lax.scan — bit-identical, just evaluation order.
HOP_ONESHOT_BYTES = 3 << 30
HOP_CHUNK_BYTES = 512 << 20


def _hop_lane_chunk(n: int, w: int, fanout: int, f_cols: int) -> int:
    """Walk-lane chunk width for hop-step lane resolution (a divisor of w)."""

    def bytes_at(wb: int) -> int:
        return n * wb * max(fanout, f_cols) * 4

    if bytes_at(w) <= HOP_ONESHOT_BYTES:
        return w
    for c in range(2, w + 1):
        if w % c == 0 and bytes_at(w // c) <= HOP_CHUNK_BYTES:
            return w // c
    return 1


def _onehot_row_select(rows_nbr, rows_wgt, degf, u_pick):
    """Shared pick arithmetic over pre-fetched neighbor rows.

    Bit-identical to a direct element gather: the one-hot sum adds exact
    zeros around the selected element (``x + 0.0 == x`` in f32; exact int32
    arithmetic for node ids, so this is safe at any N).
    """
    d = rows_nbr.shape[-1]
    deg = degf.astype(jnp.int32)
    pick = jnp.minimum((u_pick * degf).astype(jnp.int32), jnp.maximum(deg - 1, 0))
    onehot = jax.nn.one_hot(pick, d, dtype=jnp.int32)
    nxt = jnp.sum(rows_nbr.astype(jnp.int32) * onehot, -1)
    wgt = jnp.sum(rows_wgt * onehot.astype(jnp.float32), -1)
    return degf, nxt, wgt


def _lookup_ell_flat(graph: PackedGraph):
    """Baseline lookup: 3 independent gathers (degree, neighbor, weight)."""
    flat_neighbors = graph.neighbors.reshape(-1)
    flat_weights = graph.weights.reshape(-1)
    dmax = graph.max_degree

    def lookup(cur, u_pick):
        deg = graph.degree[cur]
        degf = deg.astype(jnp.float32)
        pick = jnp.minimum((u_pick * degf).astype(jnp.int32), jnp.maximum(deg - 1, 0))
        flat_idx = cur * dmax + pick
        return degf, flat_neighbors[flat_idx], flat_weights[flat_idx]

    def lookup_start(start, u_pick):
        # Step 0: every lane of a node shares the node's row — fetch each row
        # once ((N, D) slab, contiguous for iota starts) and select in-register.
        degf = graph.degree[start].astype(jnp.float32)[:, None]
        rows_nbr = graph.neighbors[start][:, None, :]
        rows_wgt = graph.weights[start][:, None, :]
        return _onehot_row_select(rows_nbr, rows_wgt, degf, u_pick)

    return lookup, lookup_start, None


def _lookup_ell_packed(graph: PackedGraph):
    """Fused lookup: one (1+2D)-float row gather + in-register one-hot select.

    Node ids ride as f32 (exact below 2^24); the whole neighborhood row comes
    back in one contiguous HBM transaction instead of three scattered ones.
    """
    d = graph.max_degree
    table = jnp.concatenate(
        [
            graph.degree[:, None].astype(jnp.float32),
            graph.neighbors.astype(jnp.float32),
            graph.weights,
        ],
        axis=1,
    )  # (N, 1+2D)

    def _select(rows, u_pick):
        degf = rows[..., 0]
        deg = degf.astype(jnp.int32)
        pick = jnp.minimum((u_pick * degf).astype(jnp.int32), jnp.maximum(deg - 1, 0))
        onehot = jax.nn.one_hot(pick, d, dtype=jnp.float32)
        nxt = jnp.sum(rows[..., 1 : 1 + d] * onehot, -1).astype(jnp.int32)
        wgt = jnp.sum(rows[..., 1 + d :] * onehot, -1)
        return degf, nxt, wgt

    def lookup(cur, u_pick):
        return _select(table[cur], u_pick)  # (..., 1+2D) single gather per lane

    def lookup_start(start, u_pick):
        # Step 0: one row fetch per node (contiguous slab for iota starts),
        # shared across all walks_per_node lanes of that node.
        return _select(table[start][:, None, :], u_pick)

    return lookup, lookup_start, {"table": table, "select": _select}


def _lookup_csr(graph: "CsrGraph"):
    """CSR lookup for skewed-degree graphs: 2 fused row gathers
    (node table [row_start, degree], edge table [neighbor, weight])."""

    def _edge_select(row_start, deg, u_pick):
        degf = deg.astype(jnp.float32)
        pick = jnp.minimum((u_pick * degf).astype(jnp.int32), jnp.maximum(deg - 1, 0))
        erows = graph.edge_table[row_start + pick]  # (..., 2) gather
        return degf, erows[..., 0].astype(jnp.int32), erows[..., 1]

    def lookup(cur, u_pick):
        nrows = graph.node_table[cur]  # (..., 2) gather
        return _edge_select(nrows[..., 0], nrows[..., 1], u_pick)

    def lookup_start(start, u_pick):
        # Step 0: node-table row shared across the node's lanes. The edge
        # gather still diverges per walk (ragged rows), so only the node
        # gather amortizes here.
        nrows = graph.node_table[start][:, None, :]
        return _edge_select(nrows[..., 0], nrows[..., 1], u_pick)

    return lookup, lookup_start, None


def _make_lookup(graph):
    from .graphs import CsrGraph

    if isinstance(graph, CsrGraph):
        return _lookup_csr(graph)
    if (
        graph.max_degree <= PACKED_MAX_DEGREE
        and graph.num_nodes < _F32_EXACT_INT
    ):
        return _lookup_ell_packed(graph)
    return _lookup_ell_flat(graph)


@partial(jax.jit, static_argnames=("cfg", "num_start_nodes"))
def sample_walk_log(
    graph,
    key: jax.Array,
    cfg: WalkConfig,
    node_offset: jnp.ndarray | int = 0,
    num_start_nodes: Optional[int] = None,
) -> WalkLog:
    """Run ``walks_per_node`` importance-sampled walks from every start node.

    Args:
        graph: ELL-packed (:class:`~graphgp_tpu.graphs.PackedGraph`) or
            CSR-packed (:class:`~graphgp_tpu.graphs.CsrGraph`) weighted graph,
            typically the normalized Laplacian. Gather tables must cover every
            *reachable* node — i.e. the full graph — even when only a block of
            start nodes is walked. The memory layout changes how neighbor
            lookups hit HBM (fused row gathers where possible) but never the
            results: all layouts are bit-identical.
        key: PRNG key; only used as hash salt → shard-invariant streams.
        cfg: static walk configuration.
        node_offset: global index of the first start node (0 single-shard).
            Under shard_map each device passes its block offset; the
            counter-based RNG keys on the *global* node id, so a sharded walk
            is bit-identical to the single-device walk.
        num_start_nodes: walk only this many nodes starting at node_offset
            (default: all nodes in the graph).

    Returns:
        WalkLog with ``curs``/``loads`` of shape (L, num_start_nodes, W).
    """
    n = num_start_nodes if num_start_nodes is not None else graph.num_nodes
    w = cfg.walks_per_node
    if cfg.max_walk_length == 0:
        # Step 0 is peeled below, so guard the degenerate config explicitly:
        # zero steps means zero step matrices (matches the pre-peel contract).
        return WalkLog(
            curs=jnp.zeros((0, n, w), jnp.int32),
            loads=jnp.zeros((0, n, w), jnp.float32),
        )
    k0, k1 = _key_words(key)
    start = jnp.asarray(node_offset, jnp.int32) + jnp.arange(n, dtype=jnp.int32)
    global_node = start.astype(jnp.uint32)[:, None]  # (N, 1)
    walk_id = jnp.arange(w, dtype=jnp.uint32)[None, :]  # (1, W)
    lookup, lookup_start, hop = _make_lookup(graph)
    inv_keep = jnp.float32(1.0 / (1.0 - cfg.p_halt))

    def transition(carry, l, degf, nxt, wgt, u_halt):
        cur, load, alive = carry
        halt = (degf == 0) | (u_halt < cfg.p_halt)
        if cfg.ablation:
            new_load = wgt
        else:
            new_load = load * degf * wgt * inv_keep
        alive_next = alive & ~halt
        cur_next = jnp.where(alive_next, nxt, cur)
        load_next = jnp.where(alive_next, new_load, load)
        return cur_next, load_next, alive_next

    def step(carry, l):
        cur, load, alive = carry
        rec_cur = cur
        rec_load = jnp.where(alive, load, 0.0)
        u_halt = _uniform_01(_hash_words(k0, k1, l * 2, global_node, walk_id))
        u_pick = _uniform_01(_hash_words(k0, k1, l * 2 + 1, global_node, walk_id))
        degf, nxt, wgt = lookup(cur, u_pick)
        carry = transition(carry, l, degf, nxt, wgt, u_halt)
        return carry, (rec_cur, rec_load)

    cur0 = jnp.broadcast_to(start[:, None], (n, w))
    # Derive the initial load/alive carries from cur0 (not fresh constants) so
    # that under shard_map they inherit cur0's varying mesh axes — lax.scan
    # requires carry in/out manual-axes to match.
    load0 = jnp.where(cur0 >= 0, 1.0, 1.0).astype(jnp.float32)
    alive0 = cur0 >= 0

    # Step 0 is peeled out of the scan: every lane of a node still sits at the
    # node itself, so the neighbor-row fetch is ONE row per node (a contiguous
    # slab for iota starts) instead of one random gather per (node, walk) lane
    # — walks_per_node× fewer step-0 gathers, bit-identical results.
    u_halt0 = _uniform_01(_hash_words(k0, k1, 0, global_node, walk_id))
    u_pick0 = _uniform_01(_hash_words(k0, k1, 1, global_node, walk_id))
    degf0, nxt0, wgt0 = lookup_start(start, u_pick0)
    rec0 = (cur0, load0)  # alive0 is all-true at step 0
    carry = transition(
        (cur0, load0, alive0),
        jnp.uint32(0),
        jnp.broadcast_to(degf0, (n, w)),
        jnp.broadcast_to(nxt0, (n, w)),
        jnp.broadcast_to(wgt0, (n, w)),
        u_halt0,
    )

    recs = [rec0]
    l_next = 1

    # Walk-locality hop steps: an alive lane at step l has made exactly l
    # neighbor moves, so its position is one of the D^l padded path endpoints
    # of its start node. Fetch those rows once per (node, endpoint) and
    # resolve lanes by an id match + one-hot MXU select — N·D^l random row
    # gathers instead of N·W, a big win while D^l << walks_per_node. Results
    # stay bit-identical: the matched row holds exactly the values the
    # per-lane gather would return (dead lanes may mismatch; their lookup
    # outputs are discarded by the alive mask in `transition`).
    if hop is not None and cfg.max_walk_length > 1:
        d = graph.max_degree
        f_cols = hop["table"].shape[-1]
        ids = graph.neighbors[start]  # (N, K) endpoints after 1 move
        fanout = d

        def _hop_viable(fan: int) -> bool:
            # Only the (N, fan, F) fetched row table must fit the budget: the
            # (N, W, fan) lane-resolution intermediates are chunked over walk
            # lanes by _hop_lane_chunk, so they never gate viability. The
            # fan < w condition keeps the hop only while it does strictly
            # fewer row gathers than the per-lane path it replaces.
            return (
                fan <= HOP_MAX_FANOUT
                and fan < w
                and n * fan * f_cols * 4 <= HOP_MAX_BYTES
            )

        while l_next < cfg.max_walk_length and l_next <= HOP_MAX_STEPS:
            if not _hop_viable(fanout):
                break
            cur, load, alive = carry
            recs.append((cur, jnp.where(alive, load, 0.0)))
            u_halt = _uniform_01(
                _hash_words(k0, k1, l_next * 2, global_node, walk_id)
            )
            u_pick = _uniform_01(
                _hash_words(k0, k1, l_next * 2 + 1, global_node, walk_id)
            )
            rows = hop["table"][ids]  # (N, K, F) — the step's only gather

            def resolve(cur_c, u_pick_c):
                # Lane resolution: match each lane's position against the
                # node's endpoint ids (first occurrence; duplicate ids share
                # identical rows) and pull its row via one-hot MXU select.
                match_ix = jnp.argmax(
                    cur_c[:, :, None] == ids[:, None, :], axis=-1
                )
                onehot = jax.nn.one_hot(match_ix, fanout, dtype=jnp.float32)
                lane_rows = jnp.einsum(
                    "nwk,nkf->nwf",
                    onehot,
                    rows,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                return hop["select"](lane_rows, u_pick_c)

            wb = _hop_lane_chunk(n, w, fanout, f_cols)
            if wb == w:
                degf, nxt, wgt = resolve(cur, u_pick)
            else:
                # Chunk lanes so the (N, wb, fanout/F) transients stay inside
                # HOP_CHUNK_BYTES; scan stacks (C, N, wb) outputs which are
                # transposed back — bit-identical to the one-shot resolve.
                c = w // wb
                split = lambda a: a.reshape(n, c, wb).transpose(1, 0, 2)
                join = lambda a: a.transpose(1, 0, 2).reshape(n, w)
                _, (degf, nxt, wgt) = jax.lax.scan(
                    lambda _, args: (None, resolve(*args)),
                    None,
                    (split(cur), split(u_pick)),
                )
                degf, nxt, wgt = join(degf), join(nxt), join(wgt)
            carry = transition(carry, jnp.uint32(l_next), degf, nxt, wgt, u_halt)
            l_next += 1
            if l_next >= cfg.max_walk_length or not _hop_viable(fanout * d):
                break
            ids = graph.neighbors[ids.reshape(-1)].reshape(n, fanout * d)
            fanout *= d

    if l_next < cfg.max_walk_length:
        steps = jnp.arange(l_next, cfg.max_walk_length, dtype=jnp.uint32)
        _, (curs_t, loads_t) = jax.lax.scan(step, carry, steps)
        curs = jnp.concatenate(
            [jnp.stack([r[0] for r in recs]), curs_t], axis=0
        )
        loads = jnp.concatenate(
            [jnp.stack([r[1] for r in recs]), loads_t], axis=0
        )
    else:
        curs = jnp.stack([r[0] for r in recs])
        loads = jnp.stack([r[1] for r in recs])
    return WalkLog(curs=curs, loads=loads)


# ---------------------------------------------------------------------------
# MXU one-hot walker: the dense-regime fast path.
#
# For small/medium N the walk state is carried as ONE-HOT row vectors, so each
# step is two MXU matmuls (row gather = C @ table, step-matrix accumulation =
# loadsᵀ-weighted batched matmul) plus VPU compares — zero HBM random gathers.
# This targets exactly the reference's dense sweeps (N ≈ 900–2500, wpn up to
# 8192: traffic/Cora/ablation protocols, SURVEY §6) where gather-issue rate,
# not FLOPs, bounds the gather walker.
# ---------------------------------------------------------------------------

ONEHOT_MAX_NODES = 2048


@partial(jax.jit, static_argnames=("cfg", "walk_block"))
def sample_dense_step_matrices_mxu(
    graph: PackedGraph,
    key: jax.Array,
    cfg: WalkConfig,
    walk_block: int = 8,
) -> jnp.ndarray:
    """Walk + accumulate dense (L, N, N) step matrices via MXU one-hot algebra.

    Bit-identical to the gather path (same hash RNG, same pick arithmetic);
    only the memory-access strategy differs. Walks are processed in blocks of
    ``walk_block`` per node under a lax.scan so the one-hot state stays
    bounded at (N·walk_block, N) floats.
    """
    n, w = graph.num_nodes, cfg.walks_per_node
    d = graph.max_degree
    if w % walk_block:
        walk_block = 1  # fall back to per-walk blocks for odd wpn
    num_blocks = w // walk_block
    k0, k1 = _key_words(key)
    table = jnp.concatenate(
        [
            graph.degree[:, None].astype(jnp.float32),
            graph.neighbors.astype(jnp.float32),
            graph.weights,
        ],
        axis=1,
    )  # (N, 1+2D)
    node_iota = jnp.arange(n, dtype=jnp.int32)
    inv_keep = jnp.float32(1.0 / (1.0 - cfg.p_halt))

    def one_block(m_acc, block_ix):
        # lanes: (N, walk_block); global walk ids for RNG parity
        walk_id = (block_ix * walk_block + jnp.arange(walk_block, dtype=jnp.uint32))[
            None, :
        ]
        global_node = node_iota.astype(jnp.uint32)[:, None]
        b = n * walk_block
        cur = jnp.broadcast_to(node_iota[:, None], (n, walk_block))
        load = jnp.where(cur >= 0, 1.0, 1.0).astype(jnp.float32)
        alive = cur >= 0

        def step(carry, l):
            cur, load, alive, m_acc = carry
            # one-hot of the current position (B, N): built by lane compare,
            # consumed twice by the MXU (accumulate + row gather)
            c = (cur.reshape(b, 1) == node_iota[None, :]).astype(jnp.float32)
            rec_load = jnp.where(alive, load, 0.0)  # (N, WB)
            # accumulate M_l += Σ_w load · onehot(cur): batched MXU matmul
            contrib = jnp.einsum(
                "nw,nwj->nj",
                rec_load,
                c.reshape(n, walk_block, n),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            m_acc = m_acc.at[l].add(contrib)

            u_halt = _uniform_01(_hash_words(k0, k1, l * 2, global_node, walk_id))
            u_pick = _uniform_01(_hash_words(k0, k1, l * 2 + 1, global_node, walk_id))

            # HIGHEST precision is load-bearing: default TPU matmuls use bf16
            # inputs, which rounds neighbor ids > 256 in the one-hot gather.
            rows = jnp.dot(
                c, table, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (B, F)
            rows = rows.reshape(n, walk_block, -1)
            degf = rows[..., 0]
            deg = degf.astype(jnp.int32)
            halt = (degf == 0) | (u_halt < cfg.p_halt)
            pick = jnp.minimum(
                (u_pick * degf).astype(jnp.int32), jnp.maximum(deg - 1, 0)
            )
            onehot_pick = jax.nn.one_hot(pick, d, dtype=jnp.float32)
            nxt = jnp.sum(rows[..., 1 : 1 + d] * onehot_pick, -1).astype(jnp.int32)
            wgt = jnp.sum(rows[..., 1 + d :] * onehot_pick, -1)
            if cfg.ablation:
                new_load = wgt
            else:
                new_load = load * degf * wgt * inv_keep
            alive_next = alive & ~halt
            load = jnp.where(alive_next, new_load, load)
            cur = jnp.where(alive_next, nxt, cur)
            return (cur, load, alive_next, m_acc), None

        (cur, load, alive, m_acc), _ = jax.lax.scan(
            step,
            (cur, load, alive, m_acc),
            jnp.arange(cfg.max_walk_length, dtype=jnp.uint32),
        )
        return m_acc, None

    m0 = jnp.zeros((cfg.max_walk_length, n, n), jnp.float32)
    m_acc, _ = jax.lax.scan(
        one_block, m0, jnp.arange(num_blocks, dtype=jnp.uint32)
    )
    return m_acc / w


@partial(jax.jit, static_argnames=("cfg", "num_target_nodes"))
def dense_step_matrices(
    log: WalkLog, cfg: WalkConfig, num_target_nodes: Optional[int] = None
) -> jnp.ndarray:
    """Consolidate a WalkLog into dense step matrices ``M`` of shape (L, N, Nt).

    ``M[l]`` is the Monte-Carlo estimate of ``L_graph^l`` (unbiased under the
    principled load update). Equivalent of the reference's dict-accumulator →
    dense array merge (reference sampler.py:188-203) as one scatter-add per
    step.
    """
    l, n, w = log.curs.shape
    nt = num_target_nodes or n
    start = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :, None], (l, n, w))
    flat = (start * nt + log.curs).reshape(-1)
    vals = (log.loads / cfg.walks_per_node).reshape(-1)
    # Single flat scatter-add over all (step, start, cur) triples.
    step_ix = jnp.broadcast_to(
        jnp.arange(l, dtype=jnp.int32)[:, None, None], (l, n, w)
    ).reshape(-1)
    out = jnp.zeros((l * n * nt,), dtype=jnp.float32)
    out = out.at[step_ix * (n * nt) + flat].add(vals)
    return out.reshape(l, n, nt)


@partial(jax.jit, static_argnames=("cfg",))
def sample_dense_step_matrices(
    graph: PackedGraph, key: jax.Array, cfg: WalkConfig
) -> jnp.ndarray:
    """Walk + consolidate in one jit: ``(L, N, N)`` dense step matrices.

    Functional equivalent of reference
    ``RandomWalk.get_random_walk_matrices`` (sampler.py:93-146) minus its
    (N, N, L) axis order — we put the step axis first so each ``M_l`` is a
    contiguous MXU-friendly matrix. Use ``jnp.moveaxis(M, 0, -1)`` for the
    reference layout.
    """
    log = sample_walk_log(graph, key, cfg)
    return dense_step_matrices(log, cfg)


@partial(jax.jit, static_argnames=("cfg",))
def fused_phi(
    graph: PackedGraph,
    key: jax.Array,
    modulator: jnp.ndarray,
    cfg: WalkConfig,
) -> jnp.ndarray:
    """Sample walks and directly accumulate ``Φ = Σ_l f_l · M_l`` (N, N).

    Fuses the modulator contraction into the walk accumulation, skipping the
    (L, N, N) intermediate — useful when f is fixed (e.g. one HMC leapfrog
    step's kernel build). For hyperparameter learning prefer the step-matrix
    path, which makes Φ(f) a cheap contraction (the reference's key trick,
    SURVEY §0.5).
    """
    log = sample_walk_log(graph, key, cfg)
    l, n, w = log.curs.shape
    f = jnp.asarray(modulator, jnp.float32).reshape(l, 1, 1)
    start = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :, None], (l, n, w))
    flat = (start * n + log.curs).reshape(-1)
    vals = (f * log.loads / cfg.walks_per_node).reshape(-1)
    phi = jnp.zeros((n * n,), dtype=jnp.float32).at[flat].add(vals)
    return phi.reshape(n, n)
