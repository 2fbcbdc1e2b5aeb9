"""Fused Pallas walker: random walks + step-matrix accumulation on-chip.

The dense-regime hot loop (reference protocols traffic/Cora/ablation: N ≈
900–2500, walks_per_node up to 8192 — reference
efficient_graph_gp/random_walk_samplers/sampler.py:40-61 is the Python
original) as ONE Pallas kernel:

  * Grid over start-node blocks. Each program keeps the packed neighbor
    table, the walk state (cur/load/alive lanes) and its private
    ``(L, NB, N)`` step-matrix accumulator resident in VMEM for the whole
    walk. The pure-XLA scan path (walker.sample_dense_step_matrices_mxu)
    round-trips the full (L, N, N) accumulator through HBM on every
    walk-block iteration — at N=2048, L=10 that is 160 MB of HBM traffic
    per iteration; here the accumulator leaves VMEM exactly once.
  * Neighbor lookup is a one-hot MXU matmul against the VMEM-resident table
    (zero random HBM gathers), identical to the XLA MXU path's strategy.
  * RNG is the same splitmix32 counter hash keyed by
    (key, step, global_node, walk) as every other walker in this package, so
    halting decisions and neighbor picks are bit-identical across the Pallas,
    XLA-gather and XLA-MXU paths — only f32 accumulation order differs.

Estimator semantics match the reference's principled importance weights
(``load *= degree * weight / (1 - p_halt)``, reference sampler.py:59); the
``ablation`` flag reproduces the ad-hoc ``load = weight`` update
(reference sampler.py:180-183).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..graphs import PackedGraph
from ..walker import WalkConfig, _key_words

# VMEM-resident one-hot state bounds the supported N (c block: B × N floats).
PALLAS_MAX_NODES = 4096


# Mosaic has no uint32↔float casts, so the splitmix32 hash runs in int32 with
# logical shifts — bit-identical to walker._mix/_hash_words/_uniform_01
# (int32 mul/xor wrap exactly like uint32; shift_right_logical == uint32 >>).
def _i32(x: int) -> jnp.ndarray:
    return jnp.int32(np.uint32(x).astype(np.int32))


def _mix_i32(h):
    h = h ^ jax.lax.shift_right_logical(h, 16)
    h = h * _i32(0x7FEB352D)
    h = h ^ jax.lax.shift_right_logical(h, 15)
    h = h * _i32(0x846CA68B)
    h = h ^ jax.lax.shift_right_logical(h, 16)
    return h


def _hash_i32(*words):
    h = _i32(0x9E3779B9)
    for w in words:
        h = _mix_i32(h ^ w)
    return h


def _uniform_01_i32(bits):
    """int32 hash bits → float32 uniform in [0, 1), matching _uniform_01."""
    top24 = jax.lax.shift_right_logical(bits, 8)  # non-negative, < 2^24
    return top24.astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def _bf16_trunc(x: jnp.ndarray) -> jnp.ndarray:
    """Truncate an f32 to its top 7 mantissa bits (a bf16-exact value).

    Deliberately NOT ``x.astype(bf16).astype(f32)``: under
    ``--xla_allow_excess_precision`` (set on this fleet) XLA elides
    down-then-up casts, which silently collapses split terms to zero. A
    bitwise mask is opaque to that rewrite. Truncation (vs round-to-nearest)
    also makes each residual an exact f32 subtraction.
    """
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    return jax.lax.bitcast_convert_type(bits & _i32(0xFFFF0000), jnp.float32)


def _split3(x: jnp.ndarray):
    """Split f32 into 3 bf16-exact f32 terms: x ≈ t1+t2+t3 to ~2^-21 relative.

    Every term is exactly representable in bf16, so a DEFAULT-precision MXU
    pass (which rounds inputs to bf16) is lossless on each term — this is how
    the kernel gets f32-grade matmuls at 1-pass cost instead of HIGHEST's 6.
    """
    t1 = _bf16_trunc(x)
    r = x - t1  # exact: t1 shares x's exponent and truncates its mantissa
    t2 = _bf16_trunc(r)
    t3 = _bf16_trunc(r - t2)
    return t1, t2, t3


def _walk_kernel(
    seeds_ref,  # SMEM (2,) int32 (bit-cast uint32 key words)
    table_ref,  # VMEM (N, 2+5D) f32, bf16-exact cols (see build_table)
    pool_ref,  # VMEM (NB, B) f32: fixed block-diagonal walk→node pooling
    out_ref,  # VMEM (L, NB, N) f32 block of the step matrices
    *,
    cfg: WalkConfig,
    n: int,
    d: int,
    node_block: int,
    walk_block: int,
):
    # All walk state is flat (B, 1), node-major: lane q holds walk q % WB of
    # start node q >> log2(WB). Mosaic rejects (NB, WB) → (B, 1) shape casts,
    # so lane ids come from shifts (WB is a power of two) and the per-node
    # walk reduction is an MXU matmul against the fixed pooling matrix.
    #
    # All matmuls run at DEFAULT precision (1 bf16 pass). This is lossless
    # because every input is bf16-exact by construction: one-hot/pooling
    # matrices are 0/1, table ids and degrees are base-64 digit pairs (< 64),
    # and weights/loads are pre-split into 3 bf16-exact terms.
    nb, wb = node_block, walk_block
    b = nb * wb
    wb_shift = wb.bit_length() - 1
    num_wblocks = cfg.walks_per_node // wb
    k0 = seeds_ref[0]
    k1 = seeds_ref[1]
    node_offset = pl.program_id(0) * nb
    inv_keep = jnp.float32(1.0 / (1.0 - cfg.p_halt))

    lane = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)
    node_ids = node_offset + jax.lax.shift_right_logical(lane, wb_shift)
    lane_walk = lane & jnp.int32(wb - 1)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    pick_iota = jax.lax.broadcasted_iota(jnp.int32, (b, d), 1)

    def mm(lhs, rhs):
        return jax.lax.dot_general(
            lhs,
            rhs,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    out_ref[...] = jnp.zeros_like(out_ref)

    def one_walk_block(wb_ix, _):
        walk_ids = lane_walk + wb_ix * wb
        cur = node_ids  # (B, 1)
        load = jnp.ones((b, 1), jnp.float32)
        alive = jnp.ones((b, 1), jnp.bool_)

        for l in range(cfg.max_walk_length):
            step = jnp.int32(l)
            # One-hot of the current position: (B, N). Consumed by the MXU
            # twice: row gather (c @ table) and walk→node pooling (pool @ ·).
            c = (cur == col_iota).astype(jnp.float32)
            loadm = jnp.where(alive, load, 0.0)  # (B, 1)
            l1, l2, l3 = _split3(loadm)
            out_ref[l] += (
                mm(pool_ref[...], c * l1)
                + mm(pool_ref[...], c * l2)
                + mm(pool_ref[...], c * l3)
            )

            u_halt = _uniform_01_i32(
                _hash_i32(k0, k1, step * 2, node_ids, walk_ids)
            )
            u_pick = _uniform_01_i32(
                _hash_i32(k0, k1, step * 2 + 1, node_ids, walk_ids)
            )

            rows = mm(c, table_ref[...])  # (B, 2+5D)
            degf = rows[:, 0:1] * 64.0 + rows[:, 1:2]  # (B, 1), exact
            deg = degf.astype(jnp.int32)
            halt = (degf == 0) | (u_halt < cfg.p_halt)
            pick = jnp.minimum(
                (u_pick * degf).astype(jnp.int32), jnp.maximum(deg - 1, 0)
            )
            oh = (pick_iota == pick).astype(jnp.float32)  # (B, D)

            def sel(k):  # one-hot select of table column group k
                return jnp.sum(
                    rows[:, 2 + k * d : 2 + (k + 1) * d] * oh,
                    axis=1,
                    keepdims=True,
                )

            nxt = (sel(0) * 64.0 + sel(1)).astype(jnp.int32)  # id digits
            wgt = sel(2) + sel(3) + sel(4)  # 3-term weight split

            if cfg.ablation:
                new_load = wgt
            else:
                new_load = load * degf * wgt * inv_keep
            alive = alive & ~halt
            cur = jnp.where(alive, nxt, cur)
            load = jnp.where(alive, new_load, load)
        return 0

    jax.lax.fori_loop(0, num_wblocks, one_walk_block, 0)
    out_ref[...] *= jnp.float32(1.0 / cfg.walks_per_node)


@partial(
    jax.jit,
    static_argnames=("cfg", "node_block", "walk_block", "interpret"),
)
def sample_dense_step_matrices_pallas(
    graph: PackedGraph,
    key: jax.Array,
    cfg: WalkConfig,
    node_block: int = 8,
    walk_block: int = 128,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Walk + accumulate dense ``(L, N, N)`` step matrices, fully fused.

    Drop-in equivalent of :func:`graphgp_tpu.walker.sample_dense_step_matrices`
    (same RNG stream → same walks; f32 accumulation order differs). Requires
    ``N <= PALLAS_MAX_NODES`` — the dense regime where (L, N, N) step
    matrices are the right representation at all (reference dense stack,
    SURVEY §2.1).
    """
    n, d = graph.num_nodes, graph.max_degree
    if n > PALLAS_MAX_NODES:
        raise ValueError(
            f"Pallas dense walker supports N <= {PALLAS_MAX_NODES}; got {n}. "
            "Use the WalkLog/ELL sparse path for larger graphs."
        )
    # Lane ids come from shifts in-kernel, so walk_block must be a power of
    # two dividing walks_per_node.
    while walk_block > 1 and (
        cfg.walks_per_node % walk_block or walk_block & (walk_block - 1)
    ):
        walk_block //= 2
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    k0, k1 = _key_words(key)
    # Bit-cast the uint32 key words to int32 (the in-kernel hash is int32).
    seeds = jax.lax.bitcast_convert_type(
        jnp.stack([k0, k1]).astype(jnp.uint32), jnp.int32
    )
    # bf16-exact table columns: degree and neighbor ids as base-64 digit
    # pairs (< 64 each; N <= 4096 so two digits suffice), weights as 3
    # bf16-exact split terms — see _walk_kernel docstring.
    deg = graph.degree.astype(jnp.int32)
    ids = graph.neighbors.astype(jnp.int32)
    w = graph.weights.astype(jnp.float32)
    w1, w2, w3 = _split3(w)
    table = jnp.concatenate(
        [
            (deg[:, None] >> 6).astype(jnp.float32),
            (deg[:, None] & 63).astype(jnp.float32),
            (ids >> 6).astype(jnp.float32),
            (ids & 63).astype(jnp.float32),
            w1,
            w2,
            w3,
        ],
        axis=1,
    )  # (N, 2+5D)
    # Block-diagonal walk→node pooling: pool[i, q] = 1 iff lane q walks from
    # block-local node i. Static 0/1 matrix → exact under any MXU precision.
    bsz = node_block * walk_block
    pool = (
        np.repeat(np.eye(node_block, dtype=np.float32), walk_block, axis=1)
    ).reshape(node_block, bsz)
    pool = jnp.asarray(pool)

    grid = (pl.cdiv(n, node_block),)
    kernel = partial(
        _walk_kernel,
        cfg=cfg,
        n=n,
        d=d,
        node_block=node_block,
        walk_block=walk_block,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((n, 2 + 5 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (node_block, bsz), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (cfg.max_walk_length, node_block, n),
            lambda i: (0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((cfg.max_walk_length, n, n), jnp.float32),
        interpret=interpret,
    )(seeds, table, pool)
