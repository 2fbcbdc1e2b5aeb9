"""Pallas stencil Φ product: VMEM-windowed shifted-FMA kernel.

The stencil layout's XLA products (features.stencil_phi_*_bm) are a chain of
S ≈ 41 ``jnp.roll`` + FMA ops on a (B, N) batch; every term re-reads the
operand and the accumulator from HBM, so one product moves ~S · 3 · B·N·4
bytes — ~4 GB at the N=1e6 flagship, ~8 GB per CG Gram iteration (reference
flagship protocol: BO on 1e6-node grids,
experiments/sparse/scalable_bo/run_bo.py:29-50; the loop being replaced is
GPyTorch's linear_cg over torch CSR, sparse_grf_model.py:43).

This kernel reads each operand from HBM once. The node axis is tiled into
blocks of C columns; each program loads its (B, C) tile plus both neighbor
tiles (the halo: all offsets satisfy |off| ≤ C), concatenates them into a
(B, 3C) VMEM window, and accumulates all S shifted FMAs as *static* VMEM
slices — zero extra HBM traffic, zero gathers. Traffic per product:
3·B·N (window) + S·N (w) + B·N (out) ≈ 0.33 GB at the flagship shape, ~13×
under the roll chain.

Only ONE kernel exists — the transpose is the same kernel under a weight
pre-shift: ``rmatvec(w, v, offs) = matvec(shift(w, offs), v, −offs)`` where
``shift(w)[s] = roll(w[s], off_s)``. The shift is S rolls of an (S, N) array
done ONCE per solve (features.contract precomputes it), not per iteration —
and it halves the kernel's VMEM footprint versus a dedicated rmatvec kernel
that would need w halos (the first cut of which blew the 16 MB scoped-VMEM
compile limit at the flagship shape: 16.33M > 16M).

Circular (jnp.roll) semantics are exact: the padded operand is
[last C cols | x | first C cols | zero tail to a block multiple]; positions
past either edge land in the circular pads, and the zero tail only feeds
output columns ≥ N, which are sliced off.

Gradients via custom_vjp: the v cotangent is the transposed product (same
kernel, shifted weights built inside the backward), the w cotangent a
once-per-backward XLA roll reduction.
"""
from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

# Scoped-VMEM plan: measured on v5e, the compiled kernel's stack allocation
# is ≈ 2500 bytes/column at (S=41, B=16) — Mosaic keeps more live copies than
# the naive operand count (the round-3 4·(5S+16B) model compiled 18.27 MB
# against the 16 MB scoped limit at the flagship N=1e6, B=16 launch and
# killed the whole BO sweep). The formula below over-covers that measurement;
# plans are additionally VALIDATED by an AOT probe compile (_planned_c) that
# shrinks the block until the real compiler accepts it, so a planner miss
# degrades to a smaller block (or the XLA roll chain) instead of a dead run.
_VMEM_BUDGET = 13 << 20
_LANES = 128
# Batch rows per kernel launch; larger batches chunk outside (pathwise
# prediction runs B up to 200 — window VMEM scales with B).
_MAX_BATCH = 16


def center_offsets(offsets: np.ndarray, n: int) -> np.ndarray:
    """Map roll offsets to centered equivalents mod n (e.g. ring wraparound
    n−1 → −1) — minimizes the halo H = max|off|."""
    off = np.asarray(offsets, np.int64) % n
    return np.where(off > n // 2, off - n, off).astype(np.int64)


def plan_blocks(n: int, s: int, b: int, h: int) -> int:
    """Column block size C (multiple of 128, ≥ H, ≤ N) fitting the scoped-
    VMEM budget, or 0 if no legal C exists (→ XLA roll-chain fallback)."""
    per_col = 4 * (6 * s + 28 * b)  # ≥ measured 2500 B/col at (41, 16)
    c = (_VMEM_BUDGET // per_col) // _LANES * _LANES
    # the circular pads are C columns of the real array: C ≤ N required
    c = min(c, n // _LANES * _LANES)
    if c < max(h, _LANES):
        return 0
    return c


def _min_block(h: int) -> int:
    """Smallest legal (lane-aligned, ≥ halo) block size."""
    return -(-max(h, _LANES) // _LANES) * _LANES


def _probe_ok(n: int, s: int, b: int, c: int, offsets: Tuple[int, ...]) -> bool:
    """AOT-compile the kernel (both offset signs — the custom-VJP backward
    runs the negated variant) at these exact shapes; True iff the TPU
    compiler accepts the scoped-VMEM footprint. Compiles land in JAX's
    cache, so a successful probe is not wasted work."""
    try:
        wspec = jax.ShapeDtypeStruct((s, n), jnp.float32)
        vspec = jax.ShapeDtypeStruct((b, n), jnp.float32)
        _matvec_pallas.lower(wspec, vspec, offsets=offsets, c=c).compile()
        _matvec_pallas.lower(
            wspec, vspec, offsets=_neg(offsets), c=c
        ).compile()
        return True
    except Exception:
        return False


@lru_cache(maxsize=None)
def _planned_c(
    n: int, s: int, b: int, offsets: Tuple[int, ...], probe: bool
) -> int:
    """Validated column block size for a (n, s, b, offsets) launch, or 0 if
    no block compiles (→ caller falls back to the XLA roll chain).

    With ``probe`` (TPU, non-interpret), each candidate is AOT-compiled and
    shrunk ×3/4 on rejection — the planner model only picks the starting
    point; the real compiler has the final word on the 16 MB scoped limit.
    """
    offs = np.asarray(offsets)
    h = int(np.abs(offs).max()) if offs.size else 0
    c = plan_blocks(n, s, b, h)
    if c <= 0 or not probe:
        return max(c, 0)
    floor = min(_min_block(h), n // _LANES * _LANES)
    while c >= floor and c > 0:
        if _probe_ok(n, s, b, c, offsets):
            return c
        c = (c * 3 // 4) // _LANES * _LANES
    return 0


def _should_probe(interpret: bool) -> bool:
    return (not interpret) and jax.default_backend() == "tpu"


def _pad_circular(x: jnp.ndarray, n: int, c: int, nb: int) -> jnp.ndarray:
    """[x[..., −C:] | x | x[..., :C] | 0-tail] → (..., (nb+2)·C)."""
    tail = nb * c - n
    parts = [x[..., n - c :], x, x[..., :c]]
    if tail:
        parts.append(jnp.zeros(x.shape[:-1] + (tail,), x.dtype))
    return jnp.concatenate(parts, axis=-1)


def _matvec_kernel(w_ref, vl_ref, vc_ref, vr_ref, out_ref, *, offs, c):
    win = jnp.concatenate([vl_ref[...], vc_ref[...], vr_ref[...]], axis=-1)
    acc = jnp.zeros_like(out_ref)
    for s, off in enumerate(offs):
        acc = acc + w_ref[s][None, :] * jax.lax.slice_in_dim(
            win, c + off, 2 * c + off, axis=-1
        )
    out_ref[...] = acc


def _block_specs_3(block_shape):
    """Three views of one blocked array: left / center / right neighbor."""
    nd = len(block_shape)

    def at(shift):
        return pl.BlockSpec(
            block_shape, lambda i, _s=shift: (0,) * (nd - 1) + (i + _s,)
        )

    return [at(0), at(1), at(2)]


@partial(jax.jit, static_argnames=("offsets", "c", "interpret"))
def _matvec_pallas(
    w, v, offsets: Tuple[int, ...], c: int, interpret: bool = False
):
    s, n = w.shape
    b = v.shape[0]
    offs = np.asarray(offsets, np.int64)
    assert c > 0, "caller must pre-check _planned_c"
    nb = -(-n // c)
    vp = _pad_circular(v, n, c, nb)
    wp = (
        jnp.concatenate([w, jnp.zeros((s, nb * c - n), w.dtype)], axis=-1)
        if nb * c != n
        else w
    )
    out = pl.pallas_call(
        partial(_matvec_kernel, offs=tuple(offs.tolist()), c=c),
        grid=(nb,),
        in_specs=[pl.BlockSpec((s, c), lambda i: (0, i))]
        + _block_specs_3((b, c)),
        out_specs=pl.BlockSpec((b, c), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((b, nb * c), jnp.float32),
        interpret=interpret,
    )(wp, vp, vp, vp)
    return out[:, :n]


def shifted_weights(w: jnp.ndarray, offsets) -> jnp.ndarray:
    """``shift(w)[s] = roll(w[s], off_s)`` — the transpose's weight table.
    S rolls of (S, N), done once per solve (features.contract), never inside
    the CG loop."""
    return jnp.stack(
        [jnp.roll(w[s], int(o), axis=-1) for s, o in enumerate(np.asarray(offsets))]
    )


def _neg(offsets: Tuple[int, ...]) -> Tuple[int, ...]:
    return tuple(-o for o in offsets)


def _dw_matvec(v, g, offsets):
    """dw[s, i] = Σ_b g[b, i] · v[b, (i + off_s) mod n]."""
    return jnp.stack(
        [jnp.einsum("bi,bi->i", g, jnp.roll(v, -int(o), axis=-1)) for o in offsets]
    )


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def stencil_matvec_pallas(
    w, v, offsets: Tuple[int, ...], c: int, interpret: bool = False
):
    """``out[b, i] = Σ_s w[s, i] · v[b, (i + off_s) mod n]`` — the batch-major
    ``V @ Φᵀ`` of features.stencil_phi_matvec_bm, in one HBM pass."""
    return _matvec_pallas(w, v, offsets, c, interpret)


def _matvec_fwd(w, v, offsets, c, interpret):
    return _matvec_pallas(w, v, offsets, c, interpret), (w, v)


def _matvec_bwd(offsets, c, interpret, res, g):
    w, v = res
    # dv[b, j] = Σ_s w[s, j−off_s] g[b, j−off_s]: the transposed product —
    # same kernel, weights pre-shifted, offsets negated.
    dv = _matvec_pallas(
        shifted_weights(w, offsets), g, _neg(offsets), c, interpret
    )
    return _dw_matvec(v, g, offsets), dv


stencil_matvec_pallas.defvjp(_matvec_fwd, _matvec_bwd)


def pallas_applicable(n: int, s: int, offsets: np.ndarray) -> bool:
    """True when the windowed kernel covers this stencil: a block plan at the
    chunked launch batch exists AND (on TPU) survives a real AOT compile."""
    offs = tuple(center_offsets(offsets, n).tolist())
    return _planned_c(n, s, _MAX_BATCH, offs, _should_probe(False)) > 0


def _roll_matvec(w, v, offs: Tuple[int, ...]) -> jnp.ndarray:
    """XLA roll-chain fallback with identical semantics to the kernel —
    used per-chunk when no block size compiles (planner returned 0)."""
    out = jnp.zeros_like(v, dtype=jnp.float32)
    for si, off in enumerate(offs):
        out = out + w[si][None, :] * jnp.roll(v, -int(off), axis=-1)
    return out


def _one_chunk(w, v, offs: Tuple[int, ...], interpret: bool):
    s, n = w.shape
    c = _planned_c(n, s, v.shape[0], offs, _should_probe(interpret))
    if c <= 0:
        return _roll_matvec(w, v, offs)
    return stencil_matvec_pallas(w, v, offs, c, interpret)


def _chunked(w, v, offs: Tuple[int, ...], interpret: bool):
    b = v.shape[0]
    if b <= _MAX_BATCH:
        return _one_chunk(w, v, offs, interpret)
    return jnp.concatenate(
        [
            _one_chunk(w, v[i : i + _MAX_BATCH], offs, interpret)
            for i in range(0, b, _MAX_BATCH)
        ],
        axis=0,
    )


def matvec_bm(w, v, offsets: np.ndarray, interpret: bool = False):
    """``V @ Φᵀ`` (B, N) → (B, N); batches over _MAX_BATCH chunk launches."""
    n = w.shape[1]
    return _chunked(w, v, tuple(center_offsets(offsets, n).tolist()), interpret)


def rmatvec_bm(w_shift, v, offsets: np.ndarray, interpret: bool = False):
    """``V @ Φ`` via the pre-shifted weight table (see shifted_weights):
    rmatvec(w, ·, offs) ≡ matvec(shift(w), ·, −offs)."""
    n = w_shift.shape[1]
    offs = tuple((-center_offsets(offsets, n)).tolist())
    return _chunked(w_shift, v, offs, interpret)
