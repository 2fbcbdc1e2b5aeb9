"""Large-N GP inference: CG marginal likelihood + pathwise conditioning.

TPU-native replacement for the reference's GPyTorch stack in CG-only mode
(reference experiments/sparse/scalable_bo/bo_utils/config.py:6-15:
max_cholesky_size=0, cg tolerance 1e-2, Lanczos-quadrature logdet; prediction
via Matheron's rule with batched linear_cg at
efficient_graph_gp_sparse/models/sparse_grf_model.py:21-45).

Everything operates through the Features protocol (Dense/Ell/Log layouts) so
the same code serves consolidated sparse step matrices and raw walk logs. The
train-block Gram matvec is composed from full-graph Φ products:

    K_tt v = (Φ (Φᵀ scatter(v)))[train]      — two sparse ops, no N×N matrix.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..features import Features, contract
from ..linalg import batched_cg, cg_solve, rademacher_probes, slq_logdet
from . import params as P

_LOG2PI = 1.8378770664093453


@dataclasses.dataclass(frozen=True)
class CGSettings:
    """Solver knobs. Defaults are TPU-tuned (16 probes amortize well on the
    128-lane batch-major products; 15 Lanczos iters give a usable logdet).
    For runs that must match the reference's GPyTorch configuration use
    :meth:`reference_parity`."""

    cg_tol: float = 1e-2
    cg_max_iters: int = 100
    num_probes: int = 16
    num_lanczos_iters: int = 15

    @classmethod
    def reference_parity(cls) -> "CGSettings":
        """The reference's exact GPyTorch knobs (experiments/sparse/
        scalable_bo/bo_utils/config.py:6-15): cg_tolerance=1e-2,
        num_trace_samples=64, max_lanczos_quadrature_iterations=1 (their
        deliberately crude logdet), Cholesky + preconditioner disabled."""
        return cls(
            cg_tol=1e-2, cg_max_iters=100, num_probes=64, num_lanczos_iters=1
        )


def _expand(v: jnp.ndarray, idx: jnp.ndarray, n: int) -> jnp.ndarray:
    """Scatter rows of v (|idx|, ...) into a zero (n, ...) array."""
    if v.ndim == 1:
        return jnp.zeros((n,), v.dtype).at[idx].set(v)
    return jnp.zeros((n, v.shape[1]), v.dtype).at[idx].set(v)


def _expand_bm(v: jnp.ndarray, idx: jnp.ndarray, n: int) -> jnp.ndarray:
    """Scatter columns of batch-major v (B, |idx|) into a zero (B, n) array."""
    return jnp.zeros((v.shape[0], n), v.dtype).at[:, idx].set(v)


def make_ktt_matvec(kind: str):
    """Returns ``matvec(carry, v)`` computing ``(K_tt + σ²I) v``.

    The carry is the pytree ``(params, feats, train_idx)`` — every traced
    value rides inside it so the function itself is closure-free w.r.t.
    tracers, as required by the custom-VJP solvers in ..linalg (their
    backward passes differentiate through this carry).
    """

    def matvec(carry, v):
        params, feats, train_idx = carry
        f = P.modulator(kind, params, feats.max_walk_length)
        u = feats.rmatvec(f, _expand(v, train_idx, feats.num_nodes))
        kv = feats.matvec(f, u)[train_idx]
        return kv + P.noise_variance(params) * v

    return matvec


def make_ktt_matvec_bm(kind: str):
    """Batch-major ``(K_tt + σ²I) V`` for V (B, n_train) — the TPU-preferred
    convention (long axis on the 128 lanes; see features *_bm docs). 1-D
    inputs are accepted and routed through a (1, n) row internally, so the
    same matvec serves single-vector solves and their custom-VJP backwards.
    """

    def matvec(carry, v):
        if v.ndim == 1:
            return matvec(carry, v[None, :])[0]
        params, feats, train_idx = carry
        f = P.modulator(kind, params, feats.max_walk_length)
        u = feats.rmatvec_bm(f, _expand_bm(v, train_idx, feats.num_nodes))
        kv = feats.matvec_bm(f, u)[:, train_idx]
        return kv + P.noise_variance(params) * v

    return matvec


def make_ktt_matvec_bm_masked(kind: str):
    """Masked batch-major Gram matvec for PADDED observation sets.

    The BO loop grows its observation set every iteration; tracing shapes on
    the live size would recompile the CG/MLL graphs on every retrain
    (reference pays this implicitly in eager torch; under jit it is a
    ~minutes-per-BO-run tax at 1e6 nodes). Instead observations ride a
    fixed-capacity buffer with a 0/1 mask m, and the padded operator is
        Ã = M A M + (I − M),  M = diag(m)
    — block-diagonal, so padded dims are independent unit-variance
    Gaussians: they contribute 0 to the MLL quadratic (padded y = 0) and
    log 1 = 0 to the SLQ logdet, and CG on Ã solves the real block exactly.
    Expansion scatters use .add (padded slots duplicate node 0 with value 0,
    which must not clobber a real observation at node 0).
    """

    def matvec(carry, v):
        if v.ndim == 1:
            return matvec(carry, v[None, :])[0]
        params, feats, train_idx, mask = carry
        vm = v * mask[None, :]
        f = P.modulator(kind, params, feats.max_walk_length)
        expanded = jnp.zeros((v.shape[0], feats.num_nodes), v.dtype).at[
            :, train_idx
        ].add(vm)
        u = feats.rmatvec_bm(f, expanded)
        kv = feats.matvec_bm(f, u)[:, train_idx] * mask[None, :]
        return kv + P.noise_variance(params) * vm + (v - vm)

    return matvec


def make_gram_matvec_bm():
    """Batch-major ``(K_tt + σ²I) V`` over a PRE-CONTRACTED Φ operator.

    carry = (phi, noise_var, train_idx) with phi from features.contract —
    the modulator fold (an 820 MB stencil read at the N=1e6 flagship) happens
    once outside the CG/Lanczos loop instead of twice per iteration.
    Gradients flow through the carry (phi.w / phi.f are traced values).
    """

    def matvec(carry, v):
        if v.ndim == 1:
            return matvec(carry, v[None, :])[0]
        phi, noise_var, train_idx = carry
        u = phi.rmatvec_bm(_expand_bm(v, train_idx, phi.num_nodes))
        kv = phi.matvec_bm(u)[:, train_idx]
        return kv + noise_var * v

    return matvec


def make_gram_matvec_bm_masked():
    """Masked padded-capacity variant (see make_ktt_matvec_bm_masked) over a
    pre-contracted Φ. carry = (phi, noise_var, train_idx, mask)."""

    def matvec(carry, v):
        if v.ndim == 1:
            return matvec(carry, v[None, :])[0]
        phi, noise_var, train_idx, mask = carry
        vm = v * mask[None, :]
        expanded = jnp.zeros((v.shape[0], phi.num_nodes), v.dtype).at[
            :, train_idx
        ].add(vm)
        kv = phi.matvec_bm(phi.rmatvec_bm(expanded))[:, train_idx] * mask[None, :]
        return kv + noise_var * vm + (v - vm)

    return matvec


def _fused_gram_solve_bm(phi, noise_var, node_mask, b_solve, settings):
    """Route a full-space masked Gram solve through the fused padded CG
    (pallas_kernels/gram.py) when the layout and shape allow; None → caller
    falls back to the generic batched_cg path.

    Non-differentiable (the fused kernels carry no VJP rules) — prediction
    solves only; training solves keep cg_solve's adjoint path. Batches above
    the 16-row launch cap split into independent chunked solves (the systems
    are independent; the weight tables were re-read per 16-row chunk in the
    old path too). ``periodic=True`` unconditionally: correct for every
    stencil, costs one pad-mirroring copy per product (gram.py docstring).
    """
    from ..features import ContractedStencil

    if not isinstance(phi, ContractedStencil):
        return None
    from ..pallas_kernels import gram

    s, n = phi.w.shape
    bsz = b_solve.shape[0]
    chunk = min(bsz, gram._MAX_BATCH)
    if not gram.gram_cg_applicable(n, s, chunk, phi.offsets):
        return None
    outs = []
    for i in range(0, bsz, chunk):
        piece = b_solve[i : i + chunk]
        pad = chunk - piece.shape[0]
        if pad:
            piece = jnp.concatenate(
                [piece, jnp.zeros((pad, n), piece.dtype)], axis=0
            )
        res = gram.gram_cg(
            phi, noise_var, node_mask, piece,
            tol=settings.cg_tol, max_iters=settings.cg_max_iters,
            periodic=True,
        )
        if res is None:
            return None
        outs.append(res.x[: chunk - pad] if pad else res.x)
    return jnp.concatenate(outs, axis=0)


def make_gram_matvec_bm_full():
    """FULL-node-space masked Gram matvec: zero gathers/scatters per
    iteration. carry = (phi, noise_var, node_mask) with node_mask a 0/1
    f32 (N,) marking train nodes.

    The operator is ``Ã = M K M + σ² M + (I − M)`` with M = diag(mask) —
    block-diagonal, so CG/Lanczos started from vectors supported on the
    train block stay there and solve the real (K_tt + σ²I) system exactly,
    while padded dims are inert identity (log 1 = 0 in SLQ).

    Why: the compact train-space operator pays a (B, n_train)→(B, N)
    scatter and an (N)→(n_train) gather per iteration; at n_train = 500k
    those dominate a stencil matvec that is otherwise pure rolls. Full-space
    state makes every loop op rolls + elementwise.
    """

    def matvec(carry, v):
        if v.ndim == 1:
            return matvec(carry, v[None, :])[0]
        phi, noise_var, node_mask = carry
        vm = v * node_mask[None, :]
        kv = phi.matvec_bm(phi.rmatvec_bm(vm)) * node_mask[None, :]
        return kv + noise_var * vm + (v - vm)

    return matvec


@partial(jax.jit, static_argnames=("kind", "settings", "full_space"))
def mll_cg(
    feats: Features,
    params: Dict,
    train_idx: jnp.ndarray,
    y: jnp.ndarray,
    key: jax.Array,
    kind: str = "free",
    settings: CGSettings = CGSettings(),
    mask: Optional[jnp.ndarray] = None,
    num_real: Optional[jnp.ndarray] = None,
    full_space: bool = False,
) -> jnp.ndarray:
    """Stochastic estimate of the log marginal likelihood for big N.

    ``-0.5 (yᵀA⁻¹y + logdet A + n log 2π)`` with the quadratic term via a
    differentiable CG solve (implicit-diff VJP) and the logdet via SLQ with
    Rademacher probes (gradient = probe-averaged trace identity). This is the
    estimator GPyTorch's ExactMarginalLogLikelihood computes under forced-CG
    settings (SURVEY §3.2), as two explicit JAX primitives.

    Everything runs batch-major (B, N): probes are (P, n) rows and the
    single-vector quad solve rides a (1, n) row, keeping the long node axis
    on the TPU's 128 lanes (see features *_bm docs for the 16× rationale).
    The modulator is contracted into the Φ operator ONCE (features.contract)
    so the loop bodies never re-fold it.

    ``mask``/``num_real`` enable padded fixed-capacity observation buffers
    (see make_ktt_matvec_bm_masked): padded entries of y must be 0, and
    ``num_real`` (a traced f32 scalar) replaces the static n in the 2π term.

    ``full_space=True`` runs the solves in the full node space through the
    block-diagonal masked operator (make_gram_matvec_bm_full): zero
    gathers/scatters per CG/Lanczos iteration — the fast path when n_train
    is a sizable fraction of N (the scaling protocol trains on N/2).
    Requires distinct train node ids (duplicate observations of one node
    would merge; keep the compact path for those).
    """
    n = y.shape[0]
    f = P.modulator(kind, params, feats.max_walk_length)
    phi = contract(jax.lax.stop_gradient(feats), f)
    noise_var = P.noise_variance(params)
    n_term = (
        jnp.float32(n) if mask is None else jnp.asarray(num_real, jnp.float32)
    )
    if full_space:
        nn = feats.num_nodes
        ym = y if mask is None else y * mask
        live = mask if mask is not None else jnp.ones((n,), jnp.float32)
        node_mask = jnp.minimum(
            jnp.zeros((nn,), jnp.float32).at[train_idx].add(live), 1.0
        )
        y_solve = jnp.zeros((nn,), jnp.float32).at[train_idx].add(ym)
        matvec = make_gram_matvec_bm_full()
        carry = (phi, noise_var, node_mask)
        probes = (
            rademacher_probes(key, nn, settings.num_probes).T
            * node_mask[None, :]
        )
    elif mask is None:
        matvec = make_gram_matvec_bm()
        carry = (phi, noise_var, train_idx)
        y_solve = y
        probes = rademacher_probes(key, n, settings.num_probes).T  # (P, n)
    else:
        matvec = make_gram_matvec_bm_masked()
        carry = (phi, noise_var, train_idx, mask)
        y_solve = y
        probes = rademacher_probes(key, n, settings.num_probes).T
    alpha = cg_solve(
        matvec, carry, y_solve, settings.cg_tol, settings.cg_max_iters, 0
    )
    quad = y_solve @ alpha
    logdet = slq_logdet(
        matvec,
        carry,
        probes,
        settings.num_lanczos_iters,
        settings.cg_tol,
        settings.cg_max_iters,
        0,
    )
    return -0.5 * (quad + logdet + n_term * _LOG2PI)


@partial(
    jax.jit, static_argnames=("kind", "num_samples", "settings", "full_space")
)
def pathwise_predict(
    feats: Features,
    params: Dict,
    train_idx: jnp.ndarray,
    y: jnp.ndarray,
    test_idx: jnp.ndarray,
    key: jax.Array,
    kind: str = "free",
    num_samples: int = 64,
    settings: CGSettings = CGSettings(),
    mask: Optional[jnp.ndarray] = None,
    full_space: bool = False,
) -> jnp.ndarray:
    """Matheron-rule posterior samples at test nodes → (num_samples, n_test).

    Mirrors reference SparseGraphGP.predict (sparse_grf_model.py:21-45):
        f_post(x*) = f_prior(x*) + K*,t (K_tt + σ²I)⁻¹ (y − f_prior(t) − ε)
    with prior function samples f_prior = ε₁ Φᵀ and one batched CG solve for
    all sample paths at once. Runs batch-major (S, N) throughout (see
    features *_bm docs); the ε draws are transposed from the historical
    (N, S) shapes so the sample paths are the same draws as the column-major
    path (results agree up to float reassociation). The modulator is folded
    into the Φ operator once (features.contract), outside the CG loop.

    ``full_space=True``: the residual solve rides the full-node-space masked
    operator (zero per-iteration gathers/scatters; see
    make_gram_matvec_bm_full). Requires distinct train node ids.
    """
    f = P.modulator(kind, params, feats.max_walk_length)
    phi = contract(feats, f)
    n = feats.num_nodes
    nt = feats.num_target_nodes
    noise_var = P.noise_variance(params)
    noise_std = jnp.sqrt(noise_var)
    k1, k2 = jax.random.split(key)

    eps1 = jax.random.normal(k1, (nt, num_samples), dtype=jnp.float32).T
    prior_all = phi.matvec_bm(eps1)  # (S, N) — prior sample paths Φ ε₁
    f_train_prior = prior_all[:, train_idx]  # (S, n)
    f_test_prior = prior_all[:, test_idx]  # (S, n_te)
    eps2 = noise_std * jax.random.normal(
        k2, (train_idx.shape[0], num_samples), dtype=jnp.float32
    ).T

    b = y[None, :] - (f_train_prior + eps2)  # (S, n)
    if mask is not None:
        # Padded fixed-capacity observations (see make_ktt_matvec_bm_masked):
        # padded residuals are zeroed, so their CG solution components stay 0
        # and the correction only sums real observations.
        b = b * mask[None, :]
    if full_space:
        live = mask if mask is not None else jnp.ones(
            (train_idx.shape[0],), jnp.float32
        )
        node_mask = jnp.minimum(
            jnp.zeros((n,), jnp.float32).at[train_idx].add(live), 1.0
        )
        b_solve = jnp.zeros((b.shape[0], n), b.dtype).at[:, train_idx].add(b)
        v_fused = _fused_gram_solve_bm(
            phi, noise_var, node_mask, b_solve, settings
        )
        if v_fused is not None:
            correction = phi.matvec_bm(phi.rmatvec_bm(v_fused))[:, test_idx]
            return f_test_prior + correction
        matvec = make_gram_matvec_bm_full()
        carry = (phi, noise_var, node_mask)
    elif mask is None:
        matvec = make_gram_matvec_bm()
        carry = (phi, noise_var, train_idx)
        b_solve = b
    else:
        matvec = make_gram_matvec_bm_masked()
        carry = (phi, noise_var, train_idx, mask)
        b_solve = b
    v = batched_cg(
        matvec,
        carry,
        b_solve,
        tol=settings.cg_tol,
        max_iters=settings.cg_max_iters,
        batch_axis=0,
    ).x  # (S, n) — or (S, N) already expanded in full space

    # K_test,train v = Φ_te Φ_trᵀ v, assembled from full-graph products.
    # (.add expansion: padded train slots duplicate node 0 with value 0.)
    if full_space:
        v_full = v
    else:
        v_full = jnp.zeros((v.shape[0], n), v.dtype).at[:, train_idx].add(v)
    correction = phi.matvec_bm(phi.rmatvec_bm(v_full))[:, test_idx]
    return f_test_prior + correction


class PosteriorSummary(NamedTuple):
    mean: jnp.ndarray
    var: jnp.ndarray


def summarize_samples(samples: jnp.ndarray) -> PosteriorSummary:
    """Mean/variance across pathwise sample axis (reference
    wind_experiment.py:300-309 reduces 200 samples the same way)."""
    return PosteriorSummary(
        mean=jnp.mean(samples, axis=0), var=jnp.maximum(jnp.var(samples, axis=0), 1e-12)
    )


@dataclasses.dataclass
class FitResult:
    params: Dict
    losses: jnp.ndarray


@partial(
    jax.jit,
    static_argnames=(
        "kind", "settings", "num_steps", "learning_rate", "full_space"
    ),
)
def _fit_run(
    feats,
    train_idx,
    y,
    mask,
    num_real,
    k_loop,
    p0,
    kind: str,
    settings: CGSettings,
    num_steps: int,
    learning_rate: float,
    full_space: bool = False,
):
    """Module-level jitted Adam loop. A per-call ``@jax.jit`` closure (the
    previous shape of this code) defeats jax's compilation cache — every
    ``fit`` call retraced the whole CG/SLQ training graph even at identical
    shapes, a multi-second tax per BO retrain. Keyed here on the static
    hyperparameters, one compile serves the whole sweep."""
    opt = optax.adam(learning_rate)

    def step(carry, step_key):
        p, state = carry
        loss, grads = jax.value_and_grad(
            lambda q: -mll_cg(
                feats, q, train_idx, y, step_key, kind=kind,
                settings=settings, mask=mask, num_real=num_real,
                full_space=full_space,
            )
        )(p)
        updates, state = opt.update(grads, state, p)
        p = optax.apply_updates(p, updates)
        return (p, state), loss

    keys = jax.random.split(k_loop, num_steps)
    (p, _), losses = jax.lax.scan(step, (p0, opt.init(p0)), keys)
    return p, losses


@partial(
    jax.jit,
    static_argnames=("kind", "settings", "learning_rate", "full_space"),
)
def _fit_step(
    feats,
    train_idx,
    y,
    mask,
    num_real,
    step_key,
    p,
    opt_state,
    kind: str,
    settings: CGSettings,
    learning_rate: float,
    full_space: bool = False,
):
    """One jitted Adam step on the CG marginal likelihood.

    The host loop over this (fit's default) replaces the all-in-one scanned
    program for large unstructured graphs: the fused _fit_run executable at
    the facebook shape (N=22470, E'=18M CSC) deterministically faulted the
    TPU runtime, while the identical math as per-step dispatches runs
    cleanly — and the step executable is cached across every retrain of a
    BO run, so the host loop costs only dispatch latency."""
    opt = optax.adam(learning_rate)
    loss, grads = jax.value_and_grad(
        lambda q: -mll_cg(
            feats, q, train_idx, y, step_key, kind=kind, settings=settings,
            mask=mask, num_real=num_real, full_space=full_space,
        )
    )(p)
    updates, opt_state = opt.update(grads, opt_state, p)
    return optax.apply_updates(p, updates), opt_state, loss


def fit(
    feats: Features,
    train_idx: jnp.ndarray,
    y: jnp.ndarray,
    *,
    kind: str = "free",
    key: Optional[jax.Array] = None,
    init: Optional[Dict] = None,
    learning_rate: float = 0.1,
    num_steps: int = 50,
    settings: CGSettings = CGSettings(),
    mask: Optional[jnp.ndarray] = None,
    num_real: Optional[jnp.ndarray] = None,
    full_space: Optional[bool] = None,
    scan_loop: bool = False,
) -> FitResult:
    """Adam ascent of the CG marginal likelihood (reference protocol: Adam
    lr=0.1, 50 epochs — run_scaling_experiment.py:606-611).

    ``mask``/``num_real`` support padded fixed-capacity observation buffers
    (single compile across a growing BO run; see make_ktt_matvec_bm_masked).

    ``full_space`` selects the full-node-space masked solver (no per-
    iteration gathers/scatters; see make_gram_matvec_bm_full). Default
    (None): auto — on when the train set is ≥ an eighth of the graph, where
    the scatter/gather tax dominates; off for sparse observation sets (BO)
    whose compact state is far smaller, and off when duplicate train ids
    may occur (mask is not None means a BO-style padded buffer, which pads
    with duplicated node 0 — those are masked, so full space stays exact,
    but real duplicates from revisits are possible: stay compact).

    ``scan_loop``: run the whole Adam loop as ONE scanned program
    (_fit_run) instead of the default host loop over jitted steps
    (_fit_step). The host loop is the safe default — the fused executable
    faulted the TPU runtime at large unstructured-graph shapes — and costs
    only per-step dispatch; opt into the scan when dispatch latency
    dominates (tiny graphs, many steps) or the loop must live inside a
    larger jitted program.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    k_init, k_loop = jax.random.split(key)
    if init is None:
        init = P.init_params(kind, feats.max_walk_length, k_init)
    if mask is not None and num_real is None:
        num_real = jnp.sum(mask)
    if full_space is None:
        full_space = (
            mask is None and train_idx.shape[0] * 8 >= feats.num_nodes
        )
        if full_space:
            # The full-space operator scatters y/CG state with .at[].add —
            # duplicate train ids (repeated observations of one node) would
            # silently merge, changing the MLL vs the compact path. train_idx
            # is concrete here (fit is called outside jit): verify.
            ti = np.asarray(train_idx)
            if np.unique(ti).size != ti.shape[0]:
                full_space = False
    elif full_space:
        ti = np.asarray(train_idx)
        if np.unique(ti).size != ti.shape[0]:
            raise ValueError(
                "full_space=True requires distinct train node ids "
                "(duplicates would merge in the scatter; use the compact "
                "path for repeated observations)"
            )
    if scan_loop:
        trained, losses = _fit_run(
            feats, train_idx, y, mask, num_real, k_loop, init,
            kind, settings, num_steps, learning_rate, full_space,
        )
        return FitResult(params=trained, losses=losses)

    opt_state = optax.adam(learning_rate).init(init)
    keys = jax.random.split(k_loop, num_steps)
    p = init
    losses = []
    for i in range(num_steps):
        p, opt_state, loss = _fit_step(
            feats, train_idx, y, mask, num_real, keys[i], p, opt_state,
            kind, settings, learning_rate, full_space,
        )
        losses.append(loss)
    return FitResult(params=p, losses=jnp.stack(losses))
