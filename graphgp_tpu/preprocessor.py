"""Graph preprocessing service: Laplacian → walks → features, with a
content-addressed disk cache.

TPU-native re-design of the reference ``GraphPreprocessor``
(efficient_graph_gp_sparse/preprocessor/graph_preprocessor.py:10-165): cache
files keyed by md5(adjacency bytes) + walk parameters (reference
_generate_cache_filename, :75-83), stored as npz of the consolidated ELL step
matrices (instead of pickled scipy CSR lists), so re-running any driver skips
completed sampling — the checkpoint/resume story of SURVEY §5.4.
"""
from __future__ import annotations

import dataclasses
import hashlib
import os
from typing import Optional, Union

import jax
import numpy as np

from .features import EllFeatures, EllStepMatrices, consolidate, suggest_row_capacity
from .graphs import PackedGraph, pack_laplacian
from .walker import WalkConfig, WalkLog, sample_walk_log


def _cache_key(adjacency, cfg: WalkConfig, seed: int) -> str:
    import scipy.sparse as sp

    h = hashlib.md5()
    if sp.issparse(adjacency):
        csr = adjacency.tocsr()
        h.update(csr.indptr.tobytes())
        h.update(csr.indices.tobytes())
        h.update(np.asarray(csr.data, dtype=np.float64).tobytes())
    else:
        h.update(np.ascontiguousarray(adjacency, dtype=np.float64).tobytes())
    h.update(
        f"w{cfg.walks_per_node}_p{cfg.p_halt}_l{cfg.max_walk_length}"
        f"_a{cfg.ablation}_s{seed}".encode()
    )
    return h.hexdigest()


def save_step_matrices(path: str, mats: EllStepMatrices) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(
        path,
        cols=np.asarray(mats.cols),
        vals=np.asarray(mats.vals),
        num_target_nodes=mats.num_target_nodes,
    )


def load_step_matrices(path: str) -> EllStepMatrices:
    import jax.numpy as jnp

    with np.load(path) as z:
        return EllStepMatrices(
            cols=jnp.asarray(z["cols"]),
            vals=jnp.asarray(z["vals"]),
            num_target_nodes=int(z["num_target_nodes"]),
        )


def preprocess_graph(
    adjacency,
    cfg: WalkConfig,
    *,
    seed: int = 42,
    cache_dir: Optional[str] = None,
    mesh=None,
    log_budget_bytes: Optional[int] = None,
    layout: str = "ell",
):
    """Adjacency → normalized Laplacian → sharded/unsharded walks →
    consolidated ELL step matrices, cached on disk.

    Equivalent of reference ``GraphPreprocessor.preprocess_graph``
    (graph_preprocessor.py:85-115) with the pickle cache replaced by npz.

    When the monolithic (L, N, W) walk log would exceed ``log_budget_bytes``
    (default: pipeline.DEFAULT_LOG_BUDGET_BYTES), the blocked scan pipeline is
    used instead — the full log is never materialized, enabling the
    reference's million-node regime (run_bo.py:29-50) on one chip. Blocking
    never changes results (counter-based RNG keys on global node ids).

    ``layout="auto"`` additionally tries to convert the ELL matrices to the
    gather-free stencil form (structured graphs: ring/grid/torus — see
    features.StencilStepMatrices); large-N CG is ~1000× faster there on TPU.
    ``layout="ell"`` (default) always returns EllFeatures.
    """
    from .pipeline import DEFAULT_LOG_BUDGET_BYTES, blocked_ell_features

    if layout not in ("ell", "auto"):
        # Validate before any (potentially hours-long) walk work.
        raise ValueError(f"unknown layout {layout!r}; expected 'ell' or 'auto'")

    budget = (
        log_budget_bytes if log_budget_bytes is not None else DEFAULT_LOG_BUDGET_BYTES
    )
    if cache_dir is not None:
        base = os.path.join(
            cache_dir, f"step_matrices_{_cache_key(adjacency, cfg, seed)}"
        )
        path = base + ".npz"
        if os.path.exists(path):
            # Derived-layout sidecars first: the stencil/CSC conversions cost
            # tens of seconds at large N (offset-vocabulary scan + per-step
            # sorts) and are pure functions of the cached ELL matrices —
            # load them instead of recomputing on every driver start.
            if layout == "auto":
                cached = _load_layout_sidecar(base)
                if cached is not None:
                    return cached
            # Cache hit goes through the SAME layout conversion as a cold
            # run, so the returned feature type never depends on cache state.
            return _apply_layout(load_step_matrices(path), layout, base)

    graph = pack_laplacian(adjacency)
    key = jax.random.PRNGKey(seed)
    n = graph.num_nodes
    log_bytes = cfg.max_walk_length * n * cfg.walks_per_node * 8
    if mesh is None and log_bytes > budget:
        feats = blocked_ell_features(graph, key, cfg, log_budget_bytes=budget)
        mats = feats.mats
    else:
        if mesh is not None:
            from .shard import sharded_walk_log

            log = sharded_walk_log(graph, key, cfg, mesh)
        else:
            log = sample_walk_log(graph, key, cfg)
        cap = suggest_row_capacity(log)
        mats = consolidate(log, cap, walks_per_node=cfg.walks_per_node)

    if cache_dir is not None:
        save_step_matrices(path, mats)
        return _apply_layout(mats, layout, base)
    return _apply_layout(mats, layout, None)


def _load_layout_sidecar(base: str):
    """Load a cached derived layout (stencil or ELL+CSC) if present."""
    import jax.numpy as jnp

    from .features import (
        CscStepMatrices,
        EllFeatures,
        StencilFeatures,
        StencilStepMatrices,
    )

    spath = base + ".stencil.npz"
    if os.path.exists(spath):
        with np.load(spath) as z:
            return StencilFeatures(
                StencilStepMatrices(
                    vals=jnp.asarray(z["vals"]),
                    offsets=np.asarray(z["offsets"], np.int32),
                )
            )
    cpath = base + ".csc.npz"
    if os.path.exists(cpath):
        mats = load_step_matrices(base + ".npz")
        with np.load(cpath) as z:
            csc = CscStepMatrices(
                rows=jnp.asarray(z["rows"]),
                vals=jnp.asarray(z["vals"]),
                seg_start=jnp.asarray(z["seg_start"]),
                last_pos=jnp.asarray(z["last_pos"]),
                has_any=jnp.asarray(z["has_any"]),
            )
        return EllFeatures(mats=mats, csc=csc)
    return None


def _apply_layout(mats: EllStepMatrices, layout: str, base: Optional[str] = None):
    """ELL step matrices → requested feature layout. ``auto`` upgrades to the
    gather-free stencil form when the graph's offset vocabulary is small
    (structured graphs), and otherwise attaches the column-sorted transpose
    so Φᵀ products avoid TPU scatter-adds (unstructured graphs). With
    ``base``, the derived layout is saved as a sidecar npz next to the ELL
    cache so later loads skip the conversion."""
    if layout == "auto":
        from .features import StencilFeatures, ell_to_stencil, with_transpose

        # Stencil matvecs cost O(N·S): only worth it when the offset
        # vocabulary is far smaller than the graph (structured graphs keep
        # S constant in N — e.g. 61 at L=5 on a 4-neighbor grid — while on
        # unstructured graphs it grows ~linearly and ELL+transpose wins).
        max_offsets = min(256, max(64, int(mats.num_nodes ** 0.5)))
        stencil = ell_to_stencil(mats, max_offsets=max_offsets)
        if stencil is not None:
            if base is not None:
                np.savez(
                    base + ".stencil.npz",
                    vals=np.asarray(stencil.vals),
                    offsets=np.asarray(stencil.offsets),
                )
            return StencilFeatures(stencil)
        feats = with_transpose(EllFeatures(mats))
        if base is not None:
            csc = feats.csc
            np.savez(
                base + ".csc.npz",
                rows=np.asarray(csc.rows),
                vals=np.asarray(csc.vals),
                seg_start=np.asarray(csc.seg_start),
                last_pos=np.asarray(csc.last_pos),
                has_any=np.asarray(csc.has_any),
            )
        return feats
    return EllFeatures(mats)
