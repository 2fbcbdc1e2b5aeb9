"""Multi-chip sharding: mesh construction, sharded walking, sharded GP steps.

TPU-native replacement for the reference's only parallelism — a fork-pool of
CPU processes splitting start nodes (reference
efficient_graph_gp/random_walk_samplers/sampler.py:119-143, SURVEY §2.4 P1) —
re-designed as SPMD over a ``jax.sharding.Mesh``:

  * **Walks** shard over start-node blocks (one axis, 'nodes'): each device
    walks its block against replicated gather tables; the counter-based RNG
    keys on global node ids, so sharded results are *bit-identical* to
    single-device results (the reference's change with n_processes).
  * **Feature tensors / walk logs** stay sharded over the node axis; Φ
    products under pjit induce the XLA collectives (all_gather of the small
    train-row blocks, psum of partial mat-vecs) the reference has no analog
    of (SURVEY §5.8).
  * **HMC chains** shard over a 'chains' axis (embarrassingly parallel).

On a single host this is exercised with the 8-device virtual CPU platform
(tests/conftest.py); on hardware the same code spans a pod slice.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .features import DenseFeatures, EllFeatures, EllStepMatrices, LogFeatures
from .graphs import PackedGraph
from .walker import WalkConfig, WalkLog, sample_walk_log


def make_mesh(num_devices: Optional[int] = None, axis_name: str = "nodes") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def _pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def sharded_walk_log(
    graph: PackedGraph,
    key: jax.Array,
    cfg: WalkConfig,
    mesh: Mesh,
) -> WalkLog:
    """Walk all nodes with start-node blocks sharded over the mesh.

    Gather tables are replicated; the log comes back sharded over axis 1.
    Node count is padded up to a multiple of the mesh size (padded rows walk
    real nodes but are sliced off before returning).
    """
    axis = mesh.axis_names[0]
    nd = mesh.devices.size
    n = graph.num_nodes
    n_pad = _pad_to_multiple(n, nd)
    block = n_pad // nd

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(P(None, axis, None), P(None, axis, None)),
    )
    def walk(graph_rep, key_rep):
        shard_ix = jax.lax.axis_index(axis)
        offset = shard_ix * block
        log = sample_walk_log(
            graph_rep, key_rep, cfg, node_offset=offset, num_start_nodes=block
        )
        return log.curs, log.loads

    curs, loads = walk(graph, key)
    if n_pad != n:
        # Tail-shard rows with start node >= n are junk (gathers clamp
        # in-bounds, results well-defined) — slice them off.
        curs = curs[:, :n, :]
        loads = loads[:, :n, :]
    return WalkLog(curs=curs, loads=loads)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def shard_features(feats, mesh: Mesh):
    """Place a Features pytree with its node axis sharded over the mesh.

    DenseFeatures: (L, N, Nt) → P(None, 'nodes', None)
    EllFeatures:   (L, N, R) cols/vals → P(None, 'nodes', None)
    LogFeatures:   (L, N, W) curs/loads → P(None, 'nodes', None)
    """
    axis = mesh.axis_names[0]
    row_sharded = NamedSharding(mesh, P(None, axis, None))
    if isinstance(feats, DenseFeatures):
        return DenseFeatures(jax.device_put(feats.step_matrices, row_sharded))
    if isinstance(feats, EllFeatures):
        mats = feats.mats
        return EllFeatures(
            EllStepMatrices(
                cols=jax.device_put(mats.cols, row_sharded),
                vals=jax.device_put(mats.vals, row_sharded),
                num_target_nodes=mats.num_target_nodes,
            )
        )
    if isinstance(feats, LogFeatures):
        return LogFeatures(
            WalkLog(
                curs=jax.device_put(feats.log.curs, row_sharded),
                loads=jax.device_put(feats.log.loads, row_sharded),
            ),
            num_target_nodes=feats.num_target_nodes,
        )
    raise TypeError(f"unsupported features type {type(feats)!r}")


def pad_features(feats, n_pad: int):
    """Zero-pad a Features pytree's node axis (axis 1) up to ``n_pad`` rows.

    Padded rows have identically-zero Φ rows (zero step-matrix rows / zero
    loads), so they contribute nothing to any Φ product — padding is exact,
    not approximate.
    """
    n = feats.num_nodes
    if n_pad == n:
        return feats
    if n_pad < n:
        raise ValueError(f"n_pad ({n_pad}) < num_nodes ({n})")
    extra = n_pad - n

    def pad(x):
        widths = [(0, 0)] * x.ndim
        widths[1] = (0, extra)
        return jnp.pad(x, widths)

    if isinstance(feats, DenseFeatures):
        return DenseFeatures(pad(feats.step_matrices))
    if isinstance(feats, EllFeatures):
        m = feats.mats
        return EllFeatures(
            EllStepMatrices(
                cols=pad(m.cols), vals=pad(m.vals),
                num_target_nodes=m.num_target_nodes,
            )
        )
    if isinstance(feats, LogFeatures):
        return LogFeatures(
            WalkLog(curs=pad(feats.log.curs), loads=pad(feats.log.loads)),
            num_target_nodes=feats.num_target_nodes,
        )
    raise TypeError(f"unsupported features type {type(feats)!r}")


def distributed_gram_solve(
    feats,
    params,
    train_idx: jnp.ndarray,
    b: jnp.ndarray,
    mesh: Mesh,
    kind: str = "free",
    *,
    tol: float = 1e-4,
    max_iters: int = 200,
) -> jnp.ndarray:
    """Solve ``(K_tt + σ²I) x = b`` with explicit SPMD collectives.

    The explicit-collectives counterpart of the pjit-auto path in
    gp/iterative.py, and the TPU-native replacement for the reference's
    absent distributed backend (SURVEY §5.8): features stay sharded over
    start-node blocks; each CG matvec is

        u    = psum_shards( Φ_shardᵀ scatter_local(v) )     # one psum (ICI)
        K v  = psum_shards( scatter_train( Φ_shard u ) )    # one psum (ICI)

    so per iteration exactly two all-reduces of (Nt,) and (n_train,) vectors
    ride the interconnect; everything else is shard-local gathers/scatters.

    Args:
        feats: Features pytree whose node axis is shard-able over the mesh
            (Dense/Ell/Log). Pass the *global* object; this function shards it.
        b: (n_train,) or (n_train, B) replicated right-hand side.

    Returns: x with b's shape, replicated.
    """
    from .gp import params as gp_params

    axis = mesh.axis_names[0]
    nd = mesh.devices.size
    # Zero-pad the node axis up to a mesh-size multiple (exact: padded rows
    # have zero Φ rows), so arbitrary N (e.g. Cora's 2485 on 8 chips) works.
    n = _pad_to_multiple(feats.num_nodes, nd)
    feats = pad_features(feats, n)
    block = n // nd
    lmax = feats.max_walk_length
    feats_sharded = shard_features(feats, mesh)
    single = b.ndim == 1
    b2 = b[:, None] if single else b
    n_train = b2.shape[0]

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, axis, None), P(), P(), P()),
        out_specs=P(),
    )
    def solve(feats_leaves, params_rep, train_idx_rep, b_rep):
        local = jax.tree_util.tree_unflatten(_treedef(feats), list(feats_leaves))
        shard_ix = jax.lax.axis_index(axis)
        offset = shard_ix * block
        f = gp_params.modulator(kind, params_rep, lmax)
        noise = gp_params.noise_variance(params_rep)
        in_shard = (train_idx_rep >= offset) & (train_idx_rep < offset + block)
        local_rows = jnp.where(in_shard, train_idx_rep - offset, block)  # OOB→drop

        def matvec(v):  # v (n_train, B) replicated
            # scatter train values into the local row block
            local_v = (
                jnp.zeros((block, v.shape[1]), jnp.float32)
                .at[local_rows]
                .add(v, mode="drop")
            )
            u = jax.lax.psum(local.rmatvec(f, local_v), axis)  # (Nt, B)
            kv_rows = local.matvec(f, u)  # (block, B)
            out = (
                jnp.zeros((n_train, v.shape[1]), jnp.float32)
                .at[jnp.where(in_shard, jnp.arange(n_train), n_train)]
                .add(kv_rows[local_rows.clip(0, block - 1)] * in_shard[:, None],
                     mode="drop")
            )
            return jax.lax.psum(out, axis) + noise * v

        # plain CG (replicated scalars, shard-local matvec internals)
        x = jnp.zeros_like(b_rep)
        r = b_rep - matvec(x)
        p = r
        rs = jnp.sum(r * r, axis=0)
        bnorm = jnp.maximum(jnp.linalg.norm(b_rep, axis=0), 1e-30)

        def cond(state):
            x, r, p, rs, it = state
            return (it < max_iters) & jnp.any(
                jnp.linalg.norm(r, axis=0) / bnorm > tol
            )

        def body(state):
            x, r, p, rs, it = state
            ap = matvec(p)
            denom = jnp.sum(p * ap, axis=0)
            alpha = jnp.where(denom != 0, rs / jnp.where(denom != 0, denom, 1.0), 0.0)
            active = (jnp.linalg.norm(r, axis=0) / bnorm) > tol
            alpha = jnp.where(active, alpha, 0.0)
            x = x + alpha[None] * p
            r = r - alpha[None] * ap
            rs_new = jnp.sum(r * r, axis=0)
            beta = jnp.where(rs != 0, rs_new / jnp.where(rs != 0, rs, 1.0), 0.0)
            p = r + beta[None] * p
            return (x, r, p, rs_new, it + 1)

        x, *_ = jax.lax.while_loop(cond, body, (x, r, p, rs, 0))
        return x

    leaves = jax.tree_util.tree_leaves(feats_sharded)
    x = solve(tuple(leaves), params, train_idx, b2)
    return x[:, 0] if single else x


def _treedef(feats):
    return jax.tree_util.tree_structure(feats)


def sharded_hmc_chains(mesh: Mesh):
    """Sharding helper for the HMC chain axis: use with
    ``jax.jit(..., in_shardings=...)`` over chain-leading pytrees."""
    axis = mesh.axis_names[0]
    return NamedSharding(mesh, P(axis))
