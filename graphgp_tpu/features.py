"""Step-matrix feature representations: dense, walk-log, and ELL-consolidated.

This is the TPU-native replacement for three reference components at once:
  * the dense (N, N, L) step tensor (reference
    efficient_graph_gp/random_walk_samplers/sampler.py:188-203),
  * the list of per-step scipy CSR matrices (reference
    efficient_graph_gp_sparse/random_walk_samplers_sparse/sparse_sampler.py:117-131),
  * the torch ``SparseLinearOperator`` wrapper (reference
    efficient_graph_gp_sparse/utils_sparse/sparse_lo.py:4-25).

There is no CSR on TPU; the two sparse layouts here are fixed-shape and
gather/scatter friendly:
  * :class:`WalkLog` (from .walker) — the raw trace; Φ·v is a gather + a
    (W, L)-reduction, Φᵀ·v is a scatter-add. Zero consolidation cost.
  * ELL step matrices — per-row deduplicated (cols, vals) with static row
    capacity. Costs one sort to build, then every matvec is O(nnz) — the
    right layout for CG loops that do hundreds of matvecs.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .walker import WalkConfig, WalkLog


# ---------------------------------------------------------------------------
# Walk-log linear operators (Φ and the M_l themselves, without consolidation)
# ---------------------------------------------------------------------------


def log_phi_matvec(
    log: WalkLog, modulator: jnp.ndarray, v: jnp.ndarray
) -> jnp.ndarray:
    """``Φ @ v`` with ``Φ = Σ_l f_l M_l`` straight from the walk log.

    v: (Nt,) or (Nt, B). Returns (N,) or (N, B).
    """
    l, n, w = log.curs.shape
    f = jnp.asarray(modulator, jnp.float32)
    gathered = v[log.curs]  # (L, N, W) or (L, N, W, B)
    weights = (log.loads / w) * f[:, None, None]
    if v.ndim == 1:
        return jnp.einsum("lnw,lnw->n", weights, gathered)
    return jnp.einsum("lnw,lnwb->nb", weights, gathered)


def log_phi_rmatvec(
    log: WalkLog, modulator: jnp.ndarray, v: jnp.ndarray, num_target_nodes: int
) -> jnp.ndarray:
    """``Φᵀ @ v``: scatter-add of f_l·load·v[start] onto visited nodes."""
    l, n, w = log.curs.shape
    f = jnp.asarray(modulator, jnp.float32)
    weights = (log.loads / w) * f[:, None, None]  # (L, N, W)
    if v.ndim == 1:
        vals = (weights * v[None, :, None]).reshape(-1)
        return jnp.zeros((num_target_nodes,), jnp.float32).at[log.curs.reshape(-1)].add(vals)
    b = v.shape[1]
    vals = (weights[..., None] * v[None, :, None, :]).reshape(-1, b)
    return (
        jnp.zeros((num_target_nodes, b), jnp.float32)
        .at[log.curs.reshape(-1)]
        .add(vals)
    )


def log_phi_rows(
    log: WalkLog, modulator: jnp.ndarray, rows: jnp.ndarray, num_target_nodes: int
) -> jnp.ndarray:
    """Dense rows ``Φ[rows, :]`` (R, Nt) — for K_test,train style blocks."""
    l, _, w = log.curs.shape
    f = jnp.asarray(modulator, jnp.float32)
    curs = log.curs[:, rows, :]  # (L, R, W)
    weights = (log.loads[:, rows, :] / w) * f[:, None, None]
    r = rows.shape[0]
    row_ix = jnp.broadcast_to(jnp.arange(r, dtype=jnp.int32)[None, :, None], curs.shape)
    flat = (row_ix * num_target_nodes + curs).reshape(-1)
    out = jnp.zeros((r * num_target_nodes,), jnp.float32).at[flat].add(weights.reshape(-1))
    return out.reshape(r, num_target_nodes)


# ---------------------------------------------------------------------------
# ELL-consolidated step matrices
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EllStepMatrices:
    """Per-step sparse matrices in stacked ELL layout.

    cols: int32[L, N, R] — deduplicated visited-node ids per (step, start).
        Padded slots point at node 0 with value 0.
    vals: float32[L, N, R] — summed loads / walks_per_node (i.e. M_l entries).
    num_target_nodes: static — column dimension of each M_l.
    """

    cols: jnp.ndarray
    vals: jnp.ndarray
    num_target_nodes: int = dataclasses.field(metadata=dict(static=True))

    @property
    def max_walk_length(self) -> int:
        return self.cols.shape[0]

    @property
    def num_nodes(self) -> int:
        return self.cols.shape[1]

    @property
    def row_capacity(self) -> int:
        return self.cols.shape[2]

    def nnz(self) -> jnp.ndarray:
        return jnp.sum(self.vals != 0)


# Dead-lane sentinel: halted walks carry load 0, so their (frozen) positions
# contribute nothing to M_l. Remapping them to int32-max merges every dead
# lane of a row into ONE group that sorts *last* — it is dropped by the
# capacity clip for free, so the required capacity is the max number of
# distinct columns with nonzero mass, not the raw distinct-position count.
# np.int32, not jnp.int32: a module-level jnp constant creates a device
# array at import time, initializing the default backend before any driver
# can force a different platform (e.g. cli/multichip --force-cpu).
_DEAD_COL = np.int32(2**31 - 1)


def _consolidate_rows(
    cols: jnp.ndarray, vals: jnp.ndarray, capacity: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Deduplicate (cols, vals) pairs along the last axis into ≤capacity slots.

    cols: int32[..., W], vals: f32[..., W] →
        (int32[..., R], f32[..., R], max_distinct scalar).

    ``max_distinct`` is the largest per-row count of distinct *live* columns;
    consolidation is lossless iff ``max_distinct <= capacity`` (blocked
    pipelines use this to detect overflow and retry with a larger capacity).

    TPU implementation notes (measured on v5e): this is the pipeline's hot op,
    so every stage is chosen for the hardware —
      * batch dims are flattened to 2D and the (cols, vals) pair goes through
        ONE ``lax.sort`` with vals bit-cast to int32 (argsort+gather on a 3D
        operand compiles to a ~1000× slower sort variant);
      * an ``optimization_barrier`` stops XLA fusing the dead-lane ``where``
        into the sort comparator (fused producers put lax.sort on a slow path);
      * per-segment totals come from a hand-rolled segmented scan, and
        compaction into the ≤capacity output slots is a SECOND stable sort on
        an is-last-of-segment key — row-wise ``take_along_axis`` gathers cost
        ~36 ms each at this shape (vs ~50 ms for a whole 33.5M-element pair
        sort), so a binary-search-and-gather extraction was 5× slower, and
        TPU scatter-adds were 10× slower still.
    """
    batch_shape = cols.shape[:-1]
    w = cols.shape[-1]
    # A row of W walks can hold at most W distinct columns: clamp the working
    # capacity and zero-pad the outputs back to the requested width (callers
    # may pass lane-aligned capacities larger than W on tiny graphs).
    req_capacity, capacity = capacity, min(capacity, w)
    b = int(np.prod(batch_shape)) if batch_shape else 1
    c = jnp.where(vals == 0.0, _DEAD_COL, cols).reshape(b, w)
    vbits = jax.lax.bitcast_convert_type(
        vals.reshape(b, w).astype(jnp.float32), jnp.int32
    )
    c, vbits = jax.lax.optimization_barrier((c, vbits))
    c, vbits = jax.lax.sort((c, vbits), dimension=-1, num_keys=1)
    v = jax.lax.bitcast_convert_type(vbits, jnp.float32)

    is_new = jnp.concatenate(
        [jnp.ones((b, 1), dtype=bool), c[:, 1:] != c[:, :-1]], axis=-1
    )
    live = c != _DEAD_COL
    max_distinct = jnp.max(jnp.sum(is_new & live, axis=-1))
    # Segmented prefix sum (resets at each segment boundary): segment j's
    # total sits at its last element. Unlike global-prefix-sum differences,
    # each segment accumulates independently — no f32 cancellation against
    # unrelated earlier segments (signed loads make that loss real).
    # Hand-rolled Hillis–Steele (power-of-2 shifted adds) rather than
    # jax.lax.associative_scan: an associative_scan whose operand chain
    # contains a lax.sort hangs XLA:TPU compilation indefinitely (observed on
    # v5e, 2026-08); the shift/where form compiles in seconds and runs at
    # bandwidth.
    segsum, flag = v, is_new
    d = 1
    while d < w:
        s_sh = jnp.pad(segsum, ((0, 0), (d, 0)))[:, :w]
        f_sh = jnp.pad(flag, ((0, 0), (d, 0)), constant_values=True)[:, :w]
        segsum = jnp.where(flag, segsum, segsum + s_sh)
        flag = flag | f_sh
        d *= 2
    # Compact segment totals into the first `capacity` slots: every segment's
    # LAST element carries (col, total); a stable sort on the is-last flag
    # moves those elements to the row front in segment order.
    is_last = jnp.concatenate(
        [is_new[:, 1:], jnp.ones((b, 1), dtype=bool)], axis=-1
    )
    nseg = jnp.sum(is_new, axis=-1, dtype=jnp.int32)[:, None]  # (b, 1)
    ssbits = jax.lax.bitcast_convert_type(segsum, jnp.int32)
    # Barrier again: lax.sort with a large fused producer graph (the
    # segmented scan) hangs XLA:TPU compilation, same pathology as above.
    sort_ops = jax.lax.optimization_barrier(
        ((~is_last).astype(jnp.int32), c, ssbits)
    )
    _, oc, ovbits = jax.lax.sort(
        sort_ops, dimension=-1, num_keys=1, is_stable=True
    )
    oc = oc[:, :capacity]
    ov = jax.lax.bitcast_convert_type(ovbits[:, :capacity], jnp.float32)
    slot = jnp.arange(capacity, dtype=jnp.int32)[None, :]
    ok = (slot < nseg) & (oc != _DEAD_COL)
    out_cols = jnp.where(ok, oc, 0)
    out_vals = jnp.where(ok, ov, 0.0)
    if req_capacity > capacity:
        pad = ((0, 0), (0, req_capacity - capacity))
        out_cols = jnp.pad(out_cols, pad)
        out_vals = jnp.pad(out_vals, pad)
    return (
        out_cols.reshape(*batch_shape, req_capacity),
        out_vals.reshape(*batch_shape, req_capacity),
        max_distinct,
    )


@jax.jit
def max_row_distinct(log: WalkLog) -> jnp.ndarray:
    """Device scalar: max count of distinct *live* visited nodes over all
    (step, start) rows — the minimal lossless ELL row capacity."""
    w = log.curs.shape[-1]
    c = jnp.where(log.loads == 0.0, _DEAD_COL, log.curs).reshape(-1, w)
    # Barrier + 2D: same lax.sort fast-path reasoning as _consolidate_rows.
    c = jax.lax.optimization_barrier(c)
    c = jax.lax.sort(c, dimension=-1)
    is_new = jnp.concatenate(
        [jnp.ones((c.shape[0], 1), dtype=bool), c[:, 1:] != c[:, :-1]],
        axis=-1,
    )
    return jnp.max(jnp.sum(is_new & (c != _DEAD_COL), axis=-1))


def suggest_row_capacity(log: WalkLog, multiple: int = 8) -> int:
    """Max distinct live nodes over all (step, start) rows, rounded up for
    lane alignment. Use as the static ELL capacity. Computed on device (one
    sort); only the scalar crosses to host."""
    w = log.walks_per_node
    cap = max(int(max_row_distinct(log)), 1)
    return min(((cap + multiple - 1) // multiple) * multiple, w)


@partial(jax.jit, static_argnames=("capacity", "num_target_nodes", "walks_per_node"))
def consolidate(
    log: WalkLog,
    capacity: int,
    num_target_nodes: Optional[int] = None,
    walks_per_node: Optional[int] = None,
) -> EllStepMatrices:
    """WalkLog → ELL step matrices (one sort + segment-sum, all on device)."""
    l, n, w = log.curs.shape
    nt = num_target_nodes or n
    wpn = walks_per_node or w
    cols, vals, _ = _consolidate_rows(log.curs, log.loads / wpn, capacity)
    return EllStepMatrices(cols=cols, vals=vals, num_target_nodes=nt)


def ell_phi_matvec(
    mats: EllStepMatrices, modulator: jnp.ndarray, v: jnp.ndarray
) -> jnp.ndarray:
    """``Φ @ v`` from ELL step matrices. v: (Nt,) or (Nt, B).

    The batched case scans over steps so the gather transient is (N, R, B),
    never (L, N, R, B) — at the flagship N=1e6, R=56, B=8 the latter is a
    20 GB allocation (OOM on a 16 GB chip), the former 1.8 GB.
    """
    f = jnp.asarray(modulator, jnp.float32)
    if v.ndim == 1:
        gathered = v[mats.cols]  # (L, N, R)
        return jnp.einsum("l,lnr,lnr->n", f, mats.vals, gathered)

    def body(acc, args):
        cols_l, vals_l, f_l = args
        g = v[cols_l]  # (N, R, B)
        return acc + f_l * jnp.einsum("nr,nrb->nb", vals_l, g), None

    acc0 = jnp.zeros((mats.num_nodes, v.shape[1]), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, (mats.cols, mats.vals, f))
    return acc


def ell_phi_rmatvec(
    mats: EllStepMatrices, modulator: jnp.ndarray, v: jnp.ndarray
) -> jnp.ndarray:
    """``Φᵀ @ v``. v: (N,) or (N, B). Batched case scans over steps (see
    ell_phi_matvec memory note)."""
    f = jnp.asarray(modulator, jnp.float32)
    nt = mats.num_target_nodes
    if v.ndim == 1:
        weights = mats.vals * f[:, None, None]  # (L, N, R)
        vals = (weights * v[None, :, None]).reshape(-1)
        return jnp.zeros((nt,), jnp.float32).at[mats.cols.reshape(-1)].add(vals)
    b = v.shape[1]

    def body(acc, args):
        cols_l, vals_l, f_l = args
        contrib = (f_l * vals_l)[..., None] * v[:, None, :]  # (N, R, B)
        return acc.at[cols_l.reshape(-1)].add(contrib.reshape(-1, b)), None

    acc0 = jnp.zeros((nt, b), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, (mats.cols, mats.vals, f))
    return acc


def ell_phi_rows(
    mats: EllStepMatrices, modulator: jnp.ndarray, rows: jnp.ndarray
) -> jnp.ndarray:
    """Dense ``Φ[rows, :]`` (R, Nt)."""
    f = jnp.asarray(modulator, jnp.float32)
    cols = mats.cols[:, rows, :]  # (L, R, C)
    weights = mats.vals[:, rows, :] * f[:, None, None]
    r = rows.shape[0]
    nt = mats.num_target_nodes
    row_ix = jnp.broadcast_to(jnp.arange(r, dtype=jnp.int32)[None, :, None], cols.shape)
    flat = (row_ix * nt + cols).reshape(-1)
    out = jnp.zeros((r * nt,), jnp.float32).at[flat].add(weights.reshape(-1))
    return out.reshape(r, nt)


# ---------------------------------------------------------------------------
# Column-sorted (CSC-style) transpose: the fast Φᵀ path for UNSTRUCTURED
# large-N graphs.
#
# TPU scatter-adds are the pathology of the ELL rmatvec (measured ~24 s per
# batched Φᵀv at N=1e6, R=56 — features.EllStepMatrices docstrings): every
# CG iteration of the social-graph BO protocol (reference
# experiments/sparse/scalable_bo/run_bo.py, SNAP configs) would ride that.
# The reference solves this with a CSC→CSR torch transpose
# (utils_sparse/sparse_lo.py:16-25); the TPU equivalent here stores each
# M_lᵀ as its entries sorted by target column, so Φᵀv becomes
#     gather (z = val · v[row])  →  segmented prefix-sum  →  gather totals
# — zero scatters in the hot path. A transposed ELL would not work for this:
# social-graph hub columns collect entries from every start node within L
# hops, so the per-column capacity (and the ELL padding) explodes; the
# sorted flat layout is skew-proof.
# ---------------------------------------------------------------------------


# Virtual-row geometry of the column-sorted transpose. Each column's entries
# are padded up to multiples of _CSC_BLOCK (the 128-lane width) and split
# into "virtual rows" of exactly _CSC_BLOCK entries; Φᵀv then reduces each
# virtual row DENSELY (one gather + one lane reduction — a single pass over
# the entries) and only the ~E/128 virtual-row partials go through the
# segmented scan. The round-3 design ran the Hillis–Steele scan over the raw
# entry axis — log2(E) ≈ 20+ full-array passes (~40× the data in HBM
# traffic) and, chunked, a program so large the flagship remote compile
# rejected it (HTTP 413) — where this layout does one pass plus noise.
_CSC_BLOCK = 128
# Virtual rows per inner-scan chunk: bounds the (B, Vc, 128) gather
# transient (~268 MB at B=16) regardless of XLA's layout choice, and keeps
# the compiled program one-chunk-sized (lax.scan over chunks, not unrolled).
_CSC_VROW_CHUNK = 1 << 15


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CscStepMatrices:
    """Per-step transposed step matrices in virtual-row layout.

    rows: int32[L, C, Vc, 128] — source (start) node per entry (pad → 0).
    vals: float32[L, C, Vc, 128] — M_l[row, col] (pad entries carry 0).
    seg_start: bool[L, C, Vc] — virtual row opens a new column.
    last_pos: int32[L, Nt] — GLOBAL virtual-row index of column c's last
        virtual row (0 if none).
    has_any: bool[L, Nt] — column c has at least one live entry.

    C·Vc virtual rows of 128 entries each; a column with k live entries
    occupies ceil(k/128) consecutive virtual rows (zero-padded), so hub
    columns of social graphs cost exactly their entry count — no per-column
    ELL capacity blowup (the reason a transposed ELL is infeasible here).
    """

    rows: jnp.ndarray
    vals: jnp.ndarray
    seg_start: jnp.ndarray
    last_pos: jnp.ndarray
    has_any: jnp.ndarray

    @property
    def max_walk_length(self) -> int:
        return self.rows.shape[0]

    @property
    def num_target_nodes(self) -> int:
        return self.last_pos.shape[1]

    @property
    def vrow_chunk(self) -> int:
        return self.seg_start.shape[2]


def segmented_sum_scan(z: jnp.ndarray, seg_start: jnp.ndarray) -> jnp.ndarray:
    """Inclusive within-segment prefix sum along the last axis.

    z: (..., E); seg_start: bool (E,) marking segment openers. Hillis–Steele
    shifted adds with flag propagation (the same pattern as
    _consolidate_rows' segmented scan): log2(E) bandwidth-bound passes, no
    cross-segment accumulation — so no f32 cancellation against unrelated
    segments, unlike a global-prefix-difference reduction.
    """
    e = z.shape[-1]
    s = z
    flag = seg_start
    d = 1
    while d < e:
        pad = [(0, 0)] * (s.ndim - 1) + [(d, 0)]
        s_sh = jnp.pad(s, pad)[..., :e]
        f_sh = jnp.pad(flag, ((d, 0),), constant_values=True)[:e]
        s = jnp.where(flag, s, s + s_sh)
        flag = flag | f_sh
        d *= 2
    return s


def _ceil_mult(x: int, m: int) -> int:
    return -(-x // m) * m


def transpose_ell(mats: EllStepMatrices) -> CscStepMatrices:
    """One-time build of the virtual-row column transpose (cache with the
    mats — the preprocessor stores it as an npz sidecar).

    Host-side NumPy: per step, sort live entries by column, pad each
    column's run to a multiple of _CSC_BLOCK, and scatter entries into
    their (virtual row, lane) slots. One argsort + a few prefix sums per
    step; the hot path (csc_phi_rmatvec_bm) then never sorts or scatters.
    """
    l, n, r = mats.cols.shape
    nt = mats.num_target_nodes
    blk = _CSC_BLOCK
    cols_np = np.asarray(mats.cols).reshape(l, -1)
    vals_np = np.asarray(mats.vals).reshape(l, -1)
    row_ix = np.repeat(np.arange(n, dtype=np.int32), r)

    per_step = []
    v_counts = []
    for li in range(l):
        v = vals_np[li]
        live = v != 0.0
        c_l = cols_np[li][live]
        v_l = v[live]
        r_l = row_ix[live]
        order = np.argsort(c_l, kind="stable")
        c_l, v_l, r_l = c_l[order], v_l[order], r_l[order]
        uniq, counts = np.unique(c_l, return_counts=True)
        padded = ((counts + blk - 1) // blk) * blk
        bases = np.concatenate([[0], np.cumsum(padded)[:-1]]).astype(np.int64)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
        k = np.arange(c_l.size, dtype=np.int64) - np.repeat(starts, counts)
        dest = np.repeat(bases, counts) + k
        total = max(int(padded.sum()), blk)
        rows_o = np.zeros(total, np.int32)
        vals_o = np.zeros(total, np.float32)
        rows_o[dest] = r_l
        vals_o[dest] = v_l
        nv = total // blk
        seg = np.zeros(nv, bool)
        seg[0] = True
        vbases = (bases // blk).astype(np.int64)
        seg[vbases[: uniq.size]] = True
        has = np.zeros(nt, bool)
        last = np.zeros(nt, np.int32)
        has[uniq] = True
        last[uniq] = (vbases + padded // blk - 1)[: uniq.size]
        per_step.append((rows_o, vals_o, seg, last, has))
        v_counts.append(nv)

    vmax = max(v_counts)
    vc = min(_CSC_VROW_CHUNK, 1 << (vmax - 1).bit_length() if vmax > 1 else 1)
    v_tot = _ceil_mult(vmax, vc)
    nchunks = v_tot // vc

    rows_all = np.zeros((l, v_tot * blk), np.int32)
    vals_all = np.zeros((l, v_tot * blk), np.float32)
    seg_all = np.zeros((l, v_tot), bool)
    last_all = np.zeros((l, nt), np.int32)
    has_all = np.zeros((l, nt), bool)
    for li, (rows_o, vals_o, seg, last, has) in enumerate(per_step):
        rows_all[li, : rows_o.size] = rows_o
        vals_all[li, : vals_o.size] = vals_o
        seg_all[li, : seg.size] = seg
        last_all[li] = last
        has_all[li] = has

    return CscStepMatrices(
        rows=jnp.asarray(rows_all.reshape(l, nchunks, vc, blk)),
        vals=jnp.asarray(vals_all.reshape(l, nchunks, vc, blk)),
        seg_start=jnp.asarray(seg_all.reshape(l, nchunks, vc)),
        last_pos=jnp.asarray(last_all),
        has_any=jnp.asarray(has_all),
    )


def csc_phi_rmatvec(
    csc: CscStepMatrices, modulator: jnp.ndarray, v: jnp.ndarray
) -> jnp.ndarray:
    """``Φᵀ @ v`` via the virtual-row transpose. v: (Nsrc,) → (Nt,)."""
    return csc_phi_rmatvec_bm(csc, modulator, v[None, :])[0]


def csc_phi_rmatvec_bm(
    csc: CscStepMatrices, modulator: jnp.ndarray, v: jnp.ndarray
) -> jnp.ndarray:
    """``V @ Φ`` batch-major via the virtual-row transpose.
    v: (B, Nsrc) → (B, Nt).

    Two-level reduction, scanned over fixed-shape chunks (program size is
    ONE chunk body — the round-3 unrolled entry-chunking compiled a program
    the remote TPU compile rejected outright at the facebook shape):

      level 1: gather + lane-reduce each (Vc, 128) virtual-row tile —
               a single dense pass over the entries;
      level 2: Hillis–Steele segmented scan over the (B, Vc) virtual-row
               partials (128× smaller than the entry axis), with an
               open-segment carry across chunk boundaries;
      extract: each column's total is gathered from the chunk holding its
               last virtual row.
    """
    f = jnp.asarray(modulator, jnp.float32)
    b = v.shape[0]
    nt = csc.num_target_nodes
    vc = csc.vrow_chunk

    def step_body(acc, args):
        rows_l, vals_l, st_l, lp_l, ha_l, f_l = args
        # chunk-local gather targets of each column's last virtual row
        lp_chunk = lp_l // vc
        lp_local = lp_l % vc

        def chunk_body(carry_state, chunk_args):
            out_l, carry, ci = carry_state
            rows_c, vals_c, st_c = chunk_args  # (Vc, 128), (Vc, 128), (Vc,)
            g = v[:, rows_c]  # (B, Vc, 128)
            partial = jnp.einsum("vr,bvr->bv", vals_c, g)  # (B, Vc)
            s = segmented_sum_scan(partial, st_c)
            open_mask = (jnp.cumsum(st_c.astype(jnp.int32)) == 0).astype(
                jnp.float32
            )
            s = s + carry[:, None] * open_mask[None, :]
            carry = s[:, -1]
            here = ha_l & (lp_chunk == ci)
            out_l = out_l + jnp.where(here[None, :], s[:, lp_local], 0.0)
            return (out_l, carry, ci + 1), None

        init = (
            jnp.zeros((b, nt), jnp.float32),
            jnp.zeros((b,), jnp.float32),
            jnp.int32(0),
        )
        (out_l, _, _), _ = jax.lax.scan(
            chunk_body, init, (rows_l, vals_l, st_l)
        )
        return acc + f_l * out_l, None

    acc0 = jnp.zeros((b, nt), jnp.float32)
    acc, _ = jax.lax.scan(
        step_body,
        acc0,
        (csc.rows, csc.vals, csc.seg_start, csc.last_pos, csc.has_any, f),
    )
    return acc


# ---------------------------------------------------------------------------
# Batch-major (B, N) product variants.
#
# TPU arrays pad the minor dimension to the 128-lane vector width: a column-
# major (N, B) batch with B=8 physically occupies (N, 128) tiles — 16× the
# logical bytes — so every elementwise op, roll, and reduction in a CG loop
# moves 16× the data (measured: the N=1e6 stencil CG ran 4.96 iters/s column-
# major vs the HBM roofline's ~100+). Batch-major (B, N) puts the long node
# axis on the lanes; these *_bm products are the layout the iterative GP
# stack (gp/iterative.py) rides. Semantics: matvec_bm(f, V) = V @ Φᵀ for
# V (B, Nt) → (B, N); rmatvec_bm(f, V) = V @ Φ for V (B, N) → (B, Nt).
# ---------------------------------------------------------------------------


def log_phi_matvec_bm(
    log: WalkLog, modulator: jnp.ndarray, v: jnp.ndarray
) -> jnp.ndarray:
    """``V @ Φᵀ`` straight from the walk log. v: (B, Nt) → (B, N)."""
    l, n, w = log.curs.shape
    f = jnp.asarray(modulator, jnp.float32)
    weights = (log.loads / w) * f[:, None, None]  # (L, N, W)
    gathered = v[:, log.curs]  # (B, L, N, W)
    return jnp.einsum("lnw,blnw->bn", weights, gathered)


def log_phi_rmatvec_bm(
    log: WalkLog, modulator: jnp.ndarray, v: jnp.ndarray, num_target_nodes: int
) -> jnp.ndarray:
    """``V @ Φ``: scatter-add onto visited nodes. v: (B, N) → (B, Nt)."""
    l, n, w = log.curs.shape
    b = v.shape[0]
    f = jnp.asarray(modulator, jnp.float32)
    weights = (log.loads / w) * f[:, None, None]  # (L, N, W)
    vals = weights[None, ...] * v[:, None, :, None]  # (B, L, N, W)
    return (
        jnp.zeros((b, num_target_nodes), jnp.float32)
        .at[:, log.curs.reshape(-1)]
        .add(vals.reshape(b, -1))
    )


def ell_phi_matvec_bm(
    mats: EllStepMatrices, modulator: jnp.ndarray, v: jnp.ndarray
) -> jnp.ndarray:
    """``V @ Φᵀ`` over ELL step matrices. v: (B, Nt) → (B, N). Scans over
    steps so the gather transient is (B, N, R), never (B, L, N, R)."""
    f = jnp.asarray(modulator, jnp.float32)

    def body(acc, args):
        cols_l, vals_l, f_l = args
        g = v[:, cols_l]  # (B, N, R)
        return acc + f_l * jnp.einsum("nr,bnr->bn", vals_l, g), None

    acc0 = jnp.zeros((v.shape[0], mats.num_nodes), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, (mats.cols, mats.vals, f))
    return acc


def ell_phi_rmatvec_bm(
    mats: EllStepMatrices, modulator: jnp.ndarray, v: jnp.ndarray
) -> jnp.ndarray:
    """``V @ Φ``. v: (B, N) → (B, Nt)."""
    f = jnp.asarray(modulator, jnp.float32)
    b = v.shape[0]

    def body(acc, args):
        cols_l, vals_l, f_l = args
        contrib = (f_l * vals_l)[None, :, :] * v[:, :, None]  # (B, N, R)
        return acc.at[:, cols_l.reshape(-1)].add(contrib.reshape(b, -1)), None

    acc0 = jnp.zeros((b, mats.num_target_nodes), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, (mats.cols, mats.vals, f))
    return acc


def stencil_phi_matvec_bm(
    mats: StencilStepMatrices, modulator: jnp.ndarray, v: jnp.ndarray
) -> jnp.ndarray:
    """``V @ Φᵀ``: Σ_s w_s ⊙ roll(v, -off_s, axis=-1). v: (B, N) → (B, N)."""
    f = jnp.asarray(modulator, jnp.float32)
    w = jnp.einsum("l,lsn->sn", f, mats.vals)  # (S, N)
    out = jnp.zeros_like(v, dtype=jnp.float32)
    for si, off in enumerate(mats.offsets.tolist()):
        out = out + w[si][None, :] * jnp.roll(v, -off, axis=-1)
    return out


def stencil_phi_rmatvec_bm(
    mats: StencilStepMatrices, modulator: jnp.ndarray, v: jnp.ndarray
) -> jnp.ndarray:
    """``V @ Φ``: Σ_s roll(w_s ⊙ v, +off_s, axis=-1). v: (B, N) → (B, N)."""
    f = jnp.asarray(modulator, jnp.float32)
    w = jnp.einsum("l,lsn->sn", f, mats.vals)
    out = jnp.zeros_like(v, dtype=jnp.float32)
    for si, off in enumerate(mats.offsets.tolist()):
        out = out + jnp.roll(w[si][None, :] * v, off, axis=-1)
    return out


# ---------------------------------------------------------------------------
# Custom VJPs for the batched ELL/CSC products.
#
# These products are LINEAR in (f, v); letting JAX transpose their
# implementation graphs is both wasteful and dangerous: the AD transpose of
# the chunked segmented scan (csc_phi_rmatvec_bm) materializes per-stage
# cotangents across all log2(K) Hillis–Steele passes — measured
# RESOURCE_EXHAUSTED at the facebook shape (N=22470, R=792, E=17.8M) on a
# 16 GB chip — and the AD transpose of the gather matvec is a scatter-add
# (the exact pathology the CSC layout exists to avoid). Instead each product
# declares its transpose analytically as the opposite-direction product in
# its best layout:
#
#     d/dv [V Φᵀ] · G = G Φ      (the rmatvec — CSC path, scatter-free)
#     d/dv [V Φ] · G  = G Φᵀ     (the matvec — ELL gather, scatter-free)
#     d/df_l        = ⟨A, B M_lᵀ⟩ per step (one gather+einsum contraction)
#
# Step matrices are nondiff: the fwd rules run under symbolic_zeros=True and
# raise if any step-matrix leaf is perturbed (a caller differentiating
# through mats.vals/csc.vals fails loudly instead of silently getting
# zeros); their cotangents are SymbolicZero.
# ---------------------------------------------------------------------------


def _unwrap_primal(tree):
    """Strip CustomVJPPrimal wrappers (symbolic_zeros=True fwd calling
    convention) back to plain arrays."""
    return jax.tree_util.tree_map(lambda p: p.value, tree)


def _assert_unperturbed(tree, what: str) -> None:
    """Fail loudly if a caller differentiates through step-matrix values.

    The VJPs below only propagate cotangents to (f, v); step matrices are
    fixed MC samples (SURVEY §0.5). Without this check a future caller
    differentiating w.r.t. mats.vals/csc.vals would silently receive zeros
    (ADVICE r4)."""
    if any(p.perturbed for p in jax.tree_util.tree_leaves(tree)):
        raise ValueError(
            f"differentiating through {what} values is unsupported: the "
            "ELL/CSC product VJPs declare analytic transposes only for "
            "(modulator, vector); wrap the step matrices in stop_gradient "
            "or differentiate the dense layout instead"
        )


def _zero_cotangent(tree):
    from jax.custom_derivatives import SymbolicZero

    return jax.tree_util.tree_map(
        lambda x: SymbolicZero(jax.typeof(x).to_tangent_aval()), tree
    )


def _ell_df(mats: EllStepMatrices, a: jnp.ndarray, bb: jnp.ndarray):
    """df_l = Σ_{b,i} a[b,i] · (B M_lᵀ)[b,i] with (B M_lᵀ)[b,i] =
    Σ_r vals_l[i,r] · bb[b, cols_l[i,r]] — the shared modulator-cotangent
    contraction of both product VJPs (one ELL gather + einsum per step)."""

    def body(_, args):
        cols_l, vals_l = args
        g = bb[:, cols_l]  # (B, N, R)
        m = jnp.einsum("nr,bnr->bn", vals_l, g)
        return None, jnp.vdot(a, m)

    _, df = jax.lax.scan(body, None, (mats.cols, mats.vals))
    return df


@jax.custom_vjp
def _ell_matvec_bm_op(mats, csc, f, v):
    """``V @ Φᵀ`` (B, Nt) → (B, N) with analytic transpose."""
    return ell_phi_matvec_bm(mats, f, v)


def _ell_matvec_bm_fwd(mats, csc, f, v):
    _assert_unperturbed(mats, "ELL step-matrix")
    _assert_unperturbed(csc, "CSC step-matrix")
    mats, csc = _unwrap_primal(mats), _unwrap_primal(csc)
    f, v = f.value, v.value
    return ell_phi_matvec_bm(mats, f, v), (mats, csc, f, v)


def _ell_matvec_bm_bwd(res, g):
    mats, csc, f, v = res
    dv = (
        csc_phi_rmatvec_bm(csc, f, g)
        if csc is not None
        else ell_phi_rmatvec_bm(mats, f, g)
    )
    df = _ell_df(mats, g, v)
    return _zero_cotangent(mats), _zero_cotangent(csc), df, dv


_ell_matvec_bm_op.defvjp(
    _ell_matvec_bm_fwd, _ell_matvec_bm_bwd, symbolic_zeros=True
)


@jax.custom_vjp
def _ell_rmatvec_bm_op(mats, csc, f, v):
    """``V @ Φ`` (B, N) → (B, Nt) with analytic transpose."""
    return (
        csc_phi_rmatvec_bm(csc, f, v)
        if csc is not None
        else ell_phi_rmatvec_bm(mats, f, v)
    )


def _ell_rmatvec_bm_fwd(mats, csc, f, v):
    _assert_unperturbed(mats, "ELL step-matrix")
    _assert_unperturbed(csc, "CSC step-matrix")
    mats, csc = _unwrap_primal(mats), _unwrap_primal(csc)
    f, v = f.value, v.value
    out = (
        csc_phi_rmatvec_bm(csc, f, v)
        if csc is not None
        else ell_phi_rmatvec_bm(mats, f, v)
    )
    return out, (mats, csc, f, v)


def _ell_rmatvec_bm_bwd(res, g):
    mats, csc, f, v = res
    dv = ell_phi_matvec_bm(mats, f, g)
    df = _ell_df(mats, v, g)
    return _zero_cotangent(mats), _zero_cotangent(csc), df, dv


_ell_rmatvec_bm_op.defvjp(
    _ell_rmatvec_bm_fwd, _ell_rmatvec_bm_bwd, symbolic_zeros=True
)


# ---------------------------------------------------------------------------
# Unified feature-operator protocol: one GP stack over three layouts.
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DenseFeatures:
    """Φ built from dense (L, N, Nt) step matrices — the small-N regime
    (reference dense stack, gpflow_kernels/*)."""

    step_matrices: jnp.ndarray  # (L, N, Nt)

    @property
    def num_nodes(self) -> int:
        return self.step_matrices.shape[1]

    @property
    def num_target_nodes(self) -> int:
        return self.step_matrices.shape[2]

    @property
    def max_walk_length(self) -> int:
        return self.step_matrices.shape[0]

    def phi(self, f: jnp.ndarray) -> jnp.ndarray:
        return jnp.einsum("l,lij->ij", jnp.asarray(f, jnp.float32), self.step_matrices)

    def matvec(self, f, v):
        return self.phi(f) @ v

    def rmatvec(self, f, v):
        return self.phi(f).T @ v

    def matvec_bm(self, f, v):
        return v @ self.phi(f).T

    def rmatvec_bm(self, f, v):
        return v @ self.phi(f)

    def rows(self, f, idx):
        return jnp.einsum(
            "l,lij->ij", jnp.asarray(f, jnp.float32), self.step_matrices[:, idx, :]
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EllFeatures:
    """Φ over consolidated ELL step matrices — the large-N regime
    (replaces reference SparseLinearOperator + per-step CSR list).

    When ``csc`` (the column-sorted transpose, see transpose_ell) is
    attached, Φᵀ products ride the scatter-free gather/segmented-scan path —
    the difference between ~24 s and sub-second batched rmatvecs at N=1e6 on
    unstructured graphs. Attach with :func:`with_transpose`.
    """

    mats: EllStepMatrices
    csc: Optional[CscStepMatrices] = None

    @property
    def num_nodes(self) -> int:
        return self.mats.num_nodes

    @property
    def num_target_nodes(self) -> int:
        return self.mats.num_target_nodes

    @property
    def max_walk_length(self) -> int:
        return self.mats.max_walk_length

    def matvec(self, f, v):
        return ell_phi_matvec(self.mats, f, v)

    def rmatvec(self, f, v):
        if self.csc is not None:
            return (
                csc_phi_rmatvec(self.csc, f, v)
                if v.ndim == 1
                else _ell_rmatvec_bm_op(self.mats, self.csc, f, v.T).T
            )
        return ell_phi_rmatvec(self.mats, f, v)

    def matvec_bm(self, f, v):
        return _ell_matvec_bm_op(self.mats, self.csc, f, v)

    def rmatvec_bm(self, f, v):
        return _ell_rmatvec_bm_op(self.mats, self.csc, f, v)

    def rows(self, f, idx):
        return ell_phi_rows(self.mats, f, idx)


def with_transpose(feats: EllFeatures) -> EllFeatures:
    """Attach the column-sorted transpose (one sort per step; cacheable)."""
    if feats.csc is not None:
        return feats
    return EllFeatures(mats=feats.mats, csc=transpose_ell(feats.mats))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LogFeatures:
    """Φ straight off the walk log — zero consolidation cost; best when only
    a few Φ products are needed (e.g. one-shot Thompson sampling)."""

    log: WalkLog
    num_target_nodes: int = dataclasses.field(metadata=dict(static=True))

    @property
    def num_nodes(self) -> int:
        return self.log.num_nodes

    @property
    def max_walk_length(self) -> int:
        return self.log.max_walk_length

    def matvec(self, f, v):
        return log_phi_matvec(self.log, f, v)

    def rmatvec(self, f, v):
        return log_phi_rmatvec(self.log, f, v, self.num_target_nodes)

    def matvec_bm(self, f, v):
        return log_phi_matvec_bm(self.log, f, v)

    def rmatvec_bm(self, f, v):
        return log_phi_rmatvec_bm(self.log, f, v, self.num_target_nodes)

    def rows(self, f, idx):
        return log_phi_rows(self.log, f, idx, self.num_target_nodes)


# ---------------------------------------------------------------------------
# Stencil step matrices: the gather-free layout for structured graphs.
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StencilStepMatrices:
    """Step matrices as diagonal stencils: ``M_l[i, i + offsets[s]] =
    vals[l, s, i]``.

    On the synthetic graphs of every large-N reference protocol (ring, grid,
    torus, staircase — experiments/sparse/scalable_bo/run_bo.py:29-50 and
    scaling_exp/run_scaling_experiment.py:154-198) the walk estimator's
    column indices satisfy ``col - row ∈`` a tiny global vocabulary (≤ ~61
    offsets at L=5 on a 4-neighbor grid), because l-hop neighborhoods are
    translates of one stencil. Storing values per (step, offset, node) turns
    every matvec into shifted elementwise multiply-adds:

        (M_l v)[i]  = Σ_s vals[l, s, i] · v[i + off_s]   →  Σ_s w_s ⊙ roll(v, -off_s)
        (M_lᵀ v)[j] = Σ_s roll(w_s ⊙ v, +off_s)[j]

    — pure HBM bandwidth, ZERO gathers/scatters. Measured on v5e at N=1e6,
    wpn=1000, L=5: the ELL gather matvec runs ~2.1 s and the batched scatter
    rmatvec ~24 s; the stencil form runs both in milliseconds. This is the
    layout the million-node CG path rides.

    ``offsets`` is a static numpy int array (sorted); wraparound entries of
    periodic graphs appear as their raw differences (e.g. N-1), and jnp.roll
    semantics make them exact: any (i, s) whose true column ≠ (i+off) mod N
    simply has vals = 0.
    """

    vals: jnp.ndarray  # f32[L, S, N]
    offsets: np.ndarray = dataclasses.field(metadata=dict(static=True))

    @property
    def max_walk_length(self) -> int:
        return self.vals.shape[0]

    @property
    def num_offsets(self) -> int:
        return self.vals.shape[1]

    @property
    def num_nodes(self) -> int:
        return self.vals.shape[2]


@partial(jax.jit, static_argnames=("max_offsets",))
def _vocab_chunk(cols_c, vals_c, row0, max_offsets: int):
    """One node-chunk of the offset-vocabulary scan: sorted-unique live
    ``col − row`` differences, extracted at a STATIC size so every chunk
    shares one compile (a data-dependent ``nonzero(size=count)`` here cost a
    fresh XLA compile per chunk — 88 s of a 128 s conversion at N=1e6)."""
    l, c, r = cols_c.shape
    rows = row0 + jnp.arange(c, dtype=jnp.int32)[None, :, None]
    d = jnp.where(
        vals_c != 0.0, cols_c - rows, _DEAD_COL
    ).reshape(-1)
    d = jnp.sort(d)
    is_new = jnp.concatenate([jnp.ones((1,), bool), d[1:] != d[:-1]])
    live = d != _DEAD_COL
    count = jnp.sum(is_new & live)
    # fill positions point at d[-1]: the sentinel when any dead slot exists,
    # else the largest live diff — np.unique collapses either harmlessly
    idx = jnp.nonzero(
        is_new & live, size=max_offsets + 1, fill_value=d.shape[0] - 1
    )[0]
    return count, d[idx]


def offset_vocabulary(
    mats: EllStepMatrices, max_offsets: int = 256, chunk_rows: int = 0
) -> Optional[np.ndarray]:
    """The sorted set of live ``col - row`` differences, or None if it
    exceeds ``max_offsets`` (unstructured graph → keep ELL).

    ``chunk_rows=0`` (default) sizes chunks so the whole scan is ~one device
    dispatch (≤1.5 GB of diffs per sort): the flagship N=1e6 scan ran 47 s
    as sixteen 64k-row dispatches and ~3 s as one."""
    l, n, r = mats.cols.shape
    if chunk_rows <= 0:
        chunk_rows = max((1536 << 20) // (l * r * 4), 1 << 16)
    sentinel = int(np.int32(2**31 - 1))
    vocab = np.zeros((0,), np.int64)
    for lo in range(0, n, chunk_rows):
        hi = min(lo + chunk_rows, n)
        count, cand = _vocab_chunk(
            mats.cols[:, lo:hi, :],
            mats.vals[:, lo:hi, :],
            jnp.int32(lo),
            max_offsets,
        )
        if int(count) > max_offsets:
            return None
        cand = np.asarray(cand)
        vocab = np.unique(np.concatenate([vocab, cand[cand != sentinel]]))
        if vocab.size > max_offsets:
            return None
    return vocab.astype(np.int32)


@partial(jax.jit, static_argnames=("num_offsets",))
def _stencil_chunk(cols_c, vals_c, row0, off_dev, num_offsets: int):
    """One node-chunk of ELL→stencil: (L, C, R) cols/vals → (L, S, C) slab.

    Slot resolution is a one-hot compare + einsum reduce over R — pure VPU
    work, no scatters (TPU scatter-adds ran this conversion at ~146 s for
    N=1e6; this form runs it in seconds). Dead slots contribute exact zeros.
    """
    l, c, r = cols_c.shape
    rows = row0 + jnp.arange(c, dtype=jnp.int32)[None, :, None]
    diffs = cols_c - rows
    slot = jnp.minimum(
        jnp.searchsorted(off_dev, diffs).astype(jnp.int32), num_offsets - 1
    )
    live = (vals_c != 0.0) & (off_dev[slot] == diffs)
    v = jnp.where(live, vals_c, 0.0)
    onehot = (
        slot[..., None] == jnp.arange(num_offsets, dtype=jnp.int32)
    ).astype(jnp.float32)  # (L, C, R, S)
    return jnp.einsum("lcr,lcrs->lsc", v, onehot)


def ell_to_stencil(
    mats: EllStepMatrices,
    max_offsets: int = 256,
    chunk_rows: int = 0,
) -> Optional[StencilStepMatrices]:
    """Convert ELL step matrices to stencil form, or None if the offset
    vocabulary is too large. One-time cost; cache the result.

    The accumulation chunks the node axis so the (L, C, R, S) one-hot
    transient stays bounded, and assembles the output by concatenation —
    chunks tile disjoint node ranges, so no scatter is ever needed.
    """
    if mats.num_target_nodes != mats.num_nodes:
        return None
    offsets = offset_vocabulary(mats, max_offsets, chunk_rows)
    if offsets is None:
        return None
    l, n, r = mats.cols.shape
    s = offsets.shape[0]
    if jax.default_backend() == "tpu" and n >= _STENCIL_PALLAS_MIN_NODES:
        # Pallas slot accumulation: no one-hot transient through HBM
        # (the XLA chunk path below moves ~23 GB at the flagship shape).
        # Applicability-gated: a wide-ELL graph (large L·R) can exceed the
        # scoped-VMEM budget — plan_cols returns 0 there and we fall through
        # to the XLA chunk path instead of a dead compile.
        from .pallas_kernels.stencil_build import ell_to_stencil_pallas, plan_cols

        if plan_cols(l, r, s) > 0:
            out = ell_to_stencil_pallas(
                mats.cols, mats.vals, tuple(int(o) for o in offsets)
            )
            return StencilStepMatrices(vals=out, offsets=offsets)
    off_dev = jnp.asarray(offsets)
    # bound the (L, C, R, S) one-hot transient to ~256 MB
    c_max = max((256 << 20) // (l * r * s * 4), 256)
    slabs = []
    for lo in range(0, n, c_max):
        hi = min(lo + c_max, n)
        slabs.append(
            _stencil_chunk(
                mats.cols[:, lo:hi, :],
                mats.vals[:, lo:hi, :],
                jnp.int32(lo),
                off_dev,
                s,
            )
        )
    out = slabs[0] if len(slabs) == 1 else jnp.concatenate(slabs, axis=2)
    return StencilStepMatrices(vals=out, offsets=offsets)


def stencil_phi_matvec(
    mats: StencilStepMatrices, modulator: jnp.ndarray, v: jnp.ndarray
) -> jnp.ndarray:
    """``Φ @ v``: Σ_s w_s ⊙ roll(v, -off_s). v: (N,) or (N, B)."""
    f = jnp.asarray(modulator, jnp.float32)
    w = jnp.einsum("l,lsn->sn", f, mats.vals)  # (S, N)
    out = jnp.zeros_like(v, dtype=jnp.float32)
    for si, off in enumerate(mats.offsets.tolist()):
        shifted = jnp.roll(v, -off, axis=0)
        ws = w[si] if v.ndim == 1 else w[si][:, None]
        out = out + ws * shifted
    return out


def stencil_phi_rmatvec(
    mats: StencilStepMatrices, modulator: jnp.ndarray, v: jnp.ndarray
) -> jnp.ndarray:
    """``Φᵀ @ v``: Σ_s roll(w_s ⊙ v, +off_s). v: (N,) or (N, B)."""
    f = jnp.asarray(modulator, jnp.float32)
    w = jnp.einsum("l,lsn->sn", f, mats.vals)
    out = jnp.zeros_like(v, dtype=jnp.float32)
    for si, off in enumerate(mats.offsets.tolist()):
        ws = w[si] if v.ndim == 1 else w[si][:, None]
        out = out + jnp.roll(ws * v, off, axis=0)
    return out


def stencil_phi_rows(
    mats: StencilStepMatrices, modulator: jnp.ndarray, rows: jnp.ndarray
) -> jnp.ndarray:
    """Dense ``Φ[rows, :]`` (R, N) — small scatter (R·S entries)."""
    f = jnp.asarray(modulator, jnp.float32)
    w = jnp.einsum("l,lsn->sn", f, mats.vals)  # (S, N)
    n = mats.num_nodes
    r = rows.shape[0]
    rows = jnp.asarray(rows, jnp.int32)
    wr = w[:, rows]  # (S, R)
    cols = rows[None, :] + jnp.asarray(mats.offsets)[:, None]  # (S, R)
    row_ix = jnp.broadcast_to(jnp.arange(r, dtype=jnp.int32)[None, :], cols.shape)
    ok = (cols >= 0) & (cols < n)
    flat = jnp.where(ok, row_ix * n + cols, r * n)
    out = jnp.zeros((r * n,), jnp.float32).at[flat.reshape(-1)].add(
        jnp.where(ok, wr, 0.0).reshape(-1), mode="drop"
    )
    return out.reshape(r, n)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StencilFeatures:
    """Φ over stencil step matrices — the structured-graph large-N fast path
    (same duck-typed protocol as DenseFeatures / EllFeatures / LogFeatures)."""

    mats: StencilStepMatrices

    @property
    def num_nodes(self) -> int:
        return self.mats.num_nodes

    @property
    def num_target_nodes(self) -> int:
        return self.mats.num_nodes

    @property
    def max_walk_length(self) -> int:
        return self.mats.max_walk_length

    def matvec(self, f, v):
        return stencil_phi_matvec(self.mats, f, v)

    def rmatvec(self, f, v):
        return stencil_phi_rmatvec(self.mats, f, v)

    def matvec_bm(self, f, v):
        return stencil_phi_matvec_bm(self.mats, f, v)

    def rmatvec_bm(self, f, v):
        return stencil_phi_rmatvec_bm(self.mats, f, v)

    def rows(self, f, idx):
        return stencil_phi_rows(self.mats, f, idx)


Features = Any  # DenseFeatures | EllFeatures | LogFeatures | StencilFeatures


# ---------------------------------------------------------------------------
# Contracted Φ operators: the modulator is folded in ONCE, outside the CG /
# Lanczos loops.
#
# Every stencil product used to re-contract w = Σ_l f_l · vals_l inside the
# loop body — at N=1e6, L=5, S=41 that is an 820 MB read of stencil.vals per
# product, ~1.6 GB of pure re-computation per CG iteration. A contracted
# operator carries w (S, N) = 164 MB instead, and the solvers put it in the
# matvec carry so gradients still flow through w back to f (the custom-VJP
# solvers differentiate the carry pytree).
# ---------------------------------------------------------------------------


# Node count above which the stencil products dispatch to the Pallas
# windowed kernels on TPU (below it the roll chain's HBM traffic fits cache
# behavior fine and Pallas only adds compile latency).
_STENCIL_PALLAS_MIN_NODES = 1 << 17

# Global kill-switch: None = auto (size + backend + probe-compile checks),
# False = force the XLA roll chain, True = force Pallas where applicable.
# Drivers flip this to False and retry when an outer jit compile dies inside
# the Pallas kernels — the last-resort guarantee that a planner/compiler
# miss degrades to slow instead of dead (VERDICT r3 weak #1).
_STENCIL_PALLAS_OVERRIDE: Optional[bool] = None


def set_stencil_pallas(enabled: Optional[bool]) -> None:
    """Override stencil-product Pallas dispatch: True/False force, None auto.

    Changing the value clears the process jit caches: dispatch happens at
    trace time, so a cached executable from a *successful* compile would
    otherwise keep running the old path (e.g. a pallas-off retry after an
    execution-time TPU fault would silently re-run the Pallas kernels).
    Recompiles are cheap under the persistent XLA compilation cache
    (utils/config.enable_compilation_cache).
    """
    global _STENCIL_PALLAS_OVERRIDE
    if enabled is not _STENCIL_PALLAS_OVERRIDE:
        _STENCIL_PALLAS_OVERRIDE = enabled
        jax.clear_caches()


def _stencil_use_pallas(num_nodes: int, num_offsets: int, offsets) -> bool:
    if _STENCIL_PALLAS_OVERRIDE is not None:
        if not _STENCIL_PALLAS_OVERRIDE:
            return False
    elif num_nodes < _STENCIL_PALLAS_MIN_NODES:
        return False
    if jax.default_backend() != "tpu":
        return False
    from .pallas_kernels import stencil as _ps

    return _ps.pallas_applicable(num_nodes, num_offsets, offsets)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ContractedStencil:
    """``Φ = Σ_s diag(w_s) · shift(off_s)`` with the modulator pre-folded.

    w: f32[S, N] — w[s, i] = Σ_l f_l · stencil.vals[l, s, i].

    Products dispatch to the Pallas windowed kernels
    (pallas_kernels/stencil.py) on TPU at large N — one HBM pass per product
    instead of the roll chain's S read-modify-write sweeps; the XLA roll
    chain remains the portable fallback (and the CPU test path).
    """

    w: jnp.ndarray
    offsets: np.ndarray = dataclasses.field(metadata=dict(static=True))
    # Pre-shifted weight table for the Pallas transpose path:
    # w_shift[s] = roll(w[s], off_s), built once by contract() when the
    # Pallas dispatch applies (rmatvec ≡ matvec under this table with
    # negated offsets — pallas_kernels/stencil.py).
    w_shift: Optional[jnp.ndarray] = None

    @property
    def num_nodes(self) -> int:
        return self.w.shape[1]

    @property
    def num_target_nodes(self) -> int:
        return self.w.shape[1]

    def matvec_bm(self, v: jnp.ndarray) -> jnp.ndarray:
        """``V @ Φᵀ``: Σ_s w_s ⊙ roll(v, -off_s, axis=-1). v: (B, N)."""
        if _stencil_use_pallas(self.num_nodes, self.w.shape[0], self.offsets):
            from .pallas_kernels import stencil as _ps

            return _ps.matvec_bm(self.w, v, self.offsets)
        out = jnp.zeros_like(v, dtype=jnp.float32)
        for si, off in enumerate(self.offsets.tolist()):
            out = out + self.w[si][None, :] * jnp.roll(v, -off, axis=-1)
        return out

    def rmatvec_bm(self, v: jnp.ndarray) -> jnp.ndarray:
        """``V @ Φ``: Σ_s roll(w_s ⊙ v, +off_s, axis=-1). v: (B, N)."""
        if self.w_shift is not None and _stencil_use_pallas(
            self.num_nodes, self.w.shape[0], self.offsets
        ):
            from .pallas_kernels import stencil as _ps

            return _ps.rmatvec_bm(self.w_shift, v, self.offsets)
        out = jnp.zeros_like(v, dtype=jnp.float32)
        for si, off in enumerate(self.offsets.tolist()):
            out = out + jnp.roll(self.w[si][None, :] * v, off, axis=-1)
        return out

    def rows(self, idx: jnp.ndarray) -> jnp.ndarray:
        """Dense ``Φ[idx, :]`` (R, N) — small scatter (R·S entries)."""
        n = self.num_nodes
        r = idx.shape[0]
        idx = jnp.asarray(idx, jnp.int32)
        wr = self.w[:, idx]  # (S, R)
        cols = idx[None, :] + jnp.asarray(self.offsets)[:, None]  # (S, R)
        row_ix = jnp.broadcast_to(
            jnp.arange(r, dtype=jnp.int32)[None, :], cols.shape
        )
        ok = (cols >= 0) & (cols < n)
        flat = jnp.where(ok, row_ix * n + cols, r * n)
        out = jnp.zeros((r * n,), jnp.float32).at[flat.reshape(-1)].add(
            jnp.where(ok, wr, 0.0).reshape(-1), mode="drop"
        )
        return out.reshape(r, n)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ContractedFeatures:
    """Generic contracted Φ: binds the modulator to a Features layout whose
    products cannot pre-fold it (ELL / log / dense). Same duck-typed surface
    as ContractedStencil so solver carries are layout-agnostic."""

    feats: Features
    f: jnp.ndarray

    @property
    def num_nodes(self) -> int:
        return self.feats.num_nodes

    @property
    def num_target_nodes(self) -> int:
        return self.feats.num_target_nodes

    def matvec_bm(self, v):
        return self.feats.matvec_bm(self.f, v)

    def rmatvec_bm(self, v):
        return self.feats.rmatvec_bm(self.f, v)

    def rows(self, idx):
        return self.feats.rows(self.f, idx)


def contract(feats: Features, f: jnp.ndarray):
    """Fold the modulator into the feature operator (see ContractedStencil).

    StencilFeatures → ContractedStencil (w precomputed, the big win);
    everything else → ContractedFeatures (a thin binding, zero cost).
    """
    if isinstance(feats, StencilFeatures):
        w = jnp.einsum(
            "l,lsn->sn", jnp.asarray(f, jnp.float32), feats.mats.vals
        )
        offsets = feats.mats.offsets
        w_shift = None
        if _stencil_use_pallas(w.shape[1], w.shape[0], offsets):
            from .pallas_kernels import stencil as _ps

            w_shift = _ps.shifted_weights(w, _ps.center_offsets(offsets, w.shape[1]))
        return ContractedStencil(w=w, offsets=offsets, w_shift=w_shift)
    return ContractedFeatures(feats=feats, f=jnp.asarray(f, jnp.float32))


def ell_to_dense(mats: EllStepMatrices) -> jnp.ndarray:
    """(L, N, Nt) dense reconstruction, for tests/small N."""
    l, n, r = mats.cols.shape
    nt = mats.num_target_nodes
    step_ix = jnp.broadcast_to(
        jnp.arange(l, dtype=jnp.int32)[:, None, None], mats.cols.shape
    )
    row_ix = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[None, :, None], mats.cols.shape
    )
    flat = ((step_ix * n + row_ix) * nt + mats.cols).reshape(-1)
    out = jnp.zeros((l * n * nt,), jnp.float32).at[flat].add(mats.vals.reshape(-1))
    return out.reshape(l, n, nt)


# RAW step-matrix layouts are structurally non-differentiable (fixed MC
# samples; see _assert_unperturbed). Registering them lets the linalg
# adjoint rules (cg_solve/slq_logdet bwd) stop their gradients before the
# inner jax.vjp through the matvec carry — those rules discard step-matrix
# cotangents by design, and without the stop the inner vjp would perturb the
# step-matrix leaves and trip the loud check.
#
# ONLY the raw layouts belong here. ContractedStencil (and the Contracted
# wrapper generally) pre-folds the MODULATOR into its weights — its
# cotangent IS the path by which mll gradients reach the kernel
# hyperparameters on the stencil layout. Registering it silently zeroed
# every stencil-path fit gradient (observed: flat 1e6-node BO regret —
# Thompson's GP never trained).
from .linalg import register_nondiff_type as _register_nondiff_type  # noqa: E402

for _cls in (
    EllStepMatrices,
    CscStepMatrices,
    StencilStepMatrices,
):
    _register_nondiff_type(_cls)
del _cls


def stencil_is_periodic(mats: StencilStepMatrices) -> bool:
    """True iff any wrap-region stencil weight is nonzero.

    A stencil entry at (node j, centered offset off) wraps when
    ``j + off ∉ [0, N)``. Non-periodic graphs carry vals = 0 there by
    construction (the walk never produced that pair — StencilStepMatrices
    docstring); ring/torus graphs carry real weight. Aperiodic stencils let
    the fused padded CG (pallas_kernels/gram.py) skip its pad-mirroring
    copy each product. Sums run on device; one scalar comes back.
    """
    from .pallas_kernels.stencil import center_offsets

    n = mats.num_nodes
    offs = center_offsets(mats.offsets, n)
    pieces = []
    for s, off in enumerate(offs.tolist()):
        if off > 0:
            pieces.append(jnp.sum(jnp.abs(mats.vals[:, s, n - off:])))
        elif off < 0:
            pieces.append(jnp.sum(jnp.abs(mats.vals[:, s, : -off])))
    if not pieces:
        return False
    return bool(sum(pieces) > 0)
