"""Pallas ELL→stencil conversion: per-offset slot accumulation in VMEM.

The XLA conversion path (features._stencil_chunk) resolves each ELL entry's
offset slot with a one-hot compare and contracts it with an einsum — correct
and scatter-free, but it materializes an (L, C, R, S) one-hot transient
through HBM: ~23 GB of traffic at the flagship shape (N=1e6, L=5, R=56,
S=41), measured 67 s on v5e.

Here each program holds its (L, R, C) cols/vals tile in VMEM and accumulates
all S offset lanes as compare-masked reductions over R — the one-hot never
exists in memory, traffic is one read of cols+vals plus one write of the
(L, S, C) output slab (~3 GB total), and the S loop is unrolled at compile
time (offsets are static). Layout note: the node axis rides the 128-lane
minor dimension; R sits on sublanes where the reduction is free.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

_LANES = 128
_VMEM_BUDGET = 10 << 20


def plan_cols(l: int, r: int, s: int) -> int:
    """Node-axis block size for the conversion kernel, or 0 when no legal
    (lane-aligned) block fits the VMEM budget — the caller
    (features.ell_to_stencil) then keeps the XLA chunk path instead of
    risking a scoped-VMEM compile failure on wide-ELL graphs."""
    per_col = 4 * (2 * 2 * l * r + l * s + 2 * l * r)  # in tiles ×2 (dbl buf) + out + work
    c = (_VMEM_BUDGET // per_col) // _LANES * _LANES
    return c if c >= _LANES else 0


def _build_kernel(cols_ref, vals_ref, out_ref, *, offs: Tuple[int, ...], c: int):
    i = pl.program_id(0)
    rows = i * c + jax.lax.broadcasted_iota(jnp.int32, cols_ref.shape, 2)
    d = cols_ref[...] - rows  # (L, R, C)
    v = vals_ref[...]
    live = v != 0.0
    for s, off in enumerate(offs):
        m = live & (d == off)
        out_ref[:, s, :] = jnp.sum(jnp.where(m, v, 0.0), axis=1)


@partial(jax.jit, static_argnames=("offsets", "interpret"))
def ell_to_stencil_pallas(
    cols: jnp.ndarray,
    vals: jnp.ndarray,
    offsets: Tuple[int, ...],
    interpret: bool = False,
) -> jnp.ndarray:
    """(L, N, R) ELL cols/vals + static offset vocabulary → (L, S, N) stencil
    values. Entries whose diff is not in the vocabulary are dropped (the
    caller guarantees the vocabulary is complete; dead entries carry val 0)."""
    l, n, r = cols.shape
    s = len(offsets)
    c = plan_cols(l, r, s)
    nb = -(-n // c)
    pad = nb * c - n
    # (L, R, N): node axis minor (lanes), R on sublanes (reduced in-kernel)
    cols_t = jnp.swapaxes(cols, 1, 2)
    vals_t = jnp.swapaxes(vals, 1, 2)
    if pad:
        cols_t = jnp.pad(cols_t, ((0, 0), (0, 0), (0, pad)))
        # padded entries: val 0 → dead, never accumulated
        vals_t = jnp.pad(vals_t, ((0, 0), (0, 0), (0, pad)))
    out = pl.pallas_call(
        partial(_build_kernel, offs=tuple(int(o) for o in offsets), c=c),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((l, r, c), lambda i: (0, 0, i)),
            pl.BlockSpec((l, r, c), lambda i: (0, 0, i)),
        ],
        out_specs=pl.BlockSpec((l, s, c), lambda i: (0, 0, i)),
        out_shape=jax.ShapeDtypeStruct((l, s, nb * c), jnp.float32),
        interpret=interpret,
    )(cols_t, vals_t)
    return out[:, :, :n]
