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
_DEAD_COL = jnp.int32(2**31 - 1)


def _consolidate_rows(
    cols: jnp.ndarray, vals: jnp.ndarray, capacity: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Deduplicate (cols, vals) pairs along the last axis into ≤capacity slots.

    cols: int32[..., W], vals: f32[..., W] →
        (int32[..., R], f32[..., R], max_distinct scalar).

    ``max_distinct`` is the largest per-row count of distinct *live* columns;
    consolidation is lossless iff ``max_distinct <= capacity`` (blocked
    pipelines use this to detect overflow and retry with a larger capacity).
    """
    cols = jnp.where(vals == 0.0, _DEAD_COL, cols)
    order = jnp.argsort(cols, axis=-1)
    c = jnp.take_along_axis(cols, order, axis=-1)
    v = jnp.take_along_axis(vals, order, axis=-1)
    is_new = jnp.concatenate(
        [
            jnp.ones((*c.shape[:-1], 1), dtype=bool),
            c[..., 1:] != c[..., :-1],
        ],
        axis=-1,
    )
    live = c != _DEAD_COL
    max_distinct = jnp.max(jnp.sum(is_new & live, axis=-1))
    seg = jnp.cumsum(is_new, axis=-1) - 1  # (..., W) values in [0, W)
    seg_clip = jnp.minimum(seg, capacity - 1)
    valid = (seg < capacity) & live
    out_vals = jnp.zeros((*c.shape[:-1], capacity), jnp.float32)
    out_cols = jnp.zeros((*c.shape[:-1], capacity), jnp.int32)
    out_vals = _scatter_add_lastaxis(out_vals, seg_clip, jnp.where(valid, v, 0.0))
    out_cols = _scatter_set_lastaxis(out_cols, seg_clip, c, valid)
    return out_cols, out_vals, max_distinct


def _scatter_add_lastaxis(out, idx, vals):
    """Batched scatter-add along the last axis (flatten batch dims)."""
    shape = out.shape
    r = shape[-1]
    b = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
    flat_out = out.reshape(b, r)
    flat_idx = idx.reshape(b, -1)
    flat_vals = vals.reshape(b, -1)
    rows = jnp.broadcast_to(
        jnp.arange(b, dtype=jnp.int32)[:, None], flat_idx.shape
    ).reshape(-1)
    flat = rows * r + flat_idx.reshape(-1)
    res = flat_out.reshape(-1).at[flat].add(flat_vals.reshape(-1))
    return res.reshape(shape)


def _scatter_set_lastaxis(out, idx, vals, valid):
    shape = out.shape
    r = shape[-1]
    b = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
    flat_idx = idx.reshape(b, -1)
    flat_vals = vals.reshape(b, -1)
    rows = jnp.broadcast_to(
        jnp.arange(b, dtype=jnp.int32)[:, None], flat_idx.shape
    ).reshape(-1)
    flat = jnp.where(
        valid.reshape(-1), rows * r + flat_idx.reshape(-1), b * r
    )  # invalid → dropped (index OOB with drop mode)
    res = (
        out.reshape(-1)
        .at[flat]
        .set(flat_vals.reshape(-1), mode="drop")
    )
    return res.reshape(shape)


@jax.jit
def max_row_distinct(log: WalkLog) -> jnp.ndarray:
    """Device scalar: max count of distinct *live* visited nodes over all
    (step, start) rows — the minimal lossless ELL row capacity."""
    c = jnp.where(log.loads == 0.0, _DEAD_COL, log.curs)
    c = jnp.sort(c, axis=-1)
    is_new = jnp.concatenate(
        [jnp.ones((*c.shape[:-1], 1), dtype=bool), c[..., 1:] != c[..., :-1]],
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
    """``Φ @ v`` from ELL step matrices. v: (Nt,) or (Nt, B)."""
    f = jnp.asarray(modulator, jnp.float32)
    gathered = v[mats.cols]  # (L, N, R[, B])
    if v.ndim == 1:
        return jnp.einsum("l,lnr,lnr->n", f, mats.vals, gathered)
    return jnp.einsum("l,lnr,lnrb->nb", f, mats.vals, gathered)


def ell_phi_rmatvec(
    mats: EllStepMatrices, modulator: jnp.ndarray, v: jnp.ndarray
) -> jnp.ndarray:
    """``Φᵀ @ v``. v: (N,) or (N, B)."""
    f = jnp.asarray(modulator, jnp.float32)
    weights = mats.vals * f[:, None, None]  # (L, N, R)
    nt = mats.num_target_nodes
    if v.ndim == 1:
        vals = (weights * v[None, :, None]).reshape(-1)
        return jnp.zeros((nt,), jnp.float32).at[mats.cols.reshape(-1)].add(vals)
    b = v.shape[1]
    vals = (weights[..., None] * v[None, :, None, :]).reshape(-1, b)
    return jnp.zeros((nt, b), jnp.float32).at[mats.cols.reshape(-1)].add(vals)


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

    def rows(self, f, idx):
        return jnp.einsum(
            "l,lij->ij", jnp.asarray(f, jnp.float32), self.step_matrices[:, idx, :]
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EllFeatures:
    """Φ over consolidated ELL step matrices — the large-N regime
    (replaces reference SparseLinearOperator + per-step CSR list)."""

    mats: EllStepMatrices

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
        return ell_phi_rmatvec(self.mats, f, v)

    def rows(self, f, idx):
        return ell_phi_rows(self.mats, f, idx)


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

    def rows(self, f, idx):
        return log_phi_rows(self.log, f, idx, self.num_target_nodes)


Features = Any  # DenseFeatures | EllFeatures | LogFeatures (duck-typed protocol)


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
