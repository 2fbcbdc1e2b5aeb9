"""HMC over GRF-GP hyperparameter posteriors (modulator vector / β, σ_f, noise).

NEW capability relative to the reference (no MCMC exists anywhere in it —
SURVEY §0 end note): full Bayesian treatment of the kernel hyperparameters
instead of point ML-II estimates. Because the step matrices are fixed after
sampling, each leapfrog step's log-posterior evaluation is just a contraction
+ Cholesky (dense path) — ideal for many-chain vmap.

Design:
  * vectorized leapfrog under ``lax.scan``; whole sampler is one jitted scan,
  * chains via ``jax.vmap`` — shard the chain axis over a device mesh with
    pjit for multi-chip scaling (see ..shard),
  * per-chain dual-averaging step-size adaptation during warmup (Nesterov
    dual averaging as in Hoffman & Gelman 2014, Algorithm 5), with fixed
    path length (HMC, not NUTS tree-building — TPU-friendly static shapes).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

LogProbFn = Callable[[Dict], jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class HMCConfig:
    num_warmup: int = 200
    num_samples: int = 300
    num_leapfrog: int = 16
    initial_step_size: float = 0.05
    target_accept: float = 0.8
    # dual averaging constants (Hoffman & Gelman 2014)
    gamma: float = 0.05
    t0: float = 10.0
    kappa: float = 0.75
    # diagonal mass-matrix adaptation (Stan-style windowed): estimate
    # per-dimension posterior variance (Welford) in warmup windows at 1/4,
    # 1/2, 3/4 of warmup; each freeze re-centers dual averaging so the step
    # size re-adapts under the new metric. Without it, unit mass forces one
    # step size across dimensions of very different posterior scale (raw
    # noise is data-pinned, β is broad) — measured split-R̂ up to 50 on
    # raw_noise in the hmc driver; a single mid-warmup freeze still left
    # R̂ ≈ 2 (the mass estimate came from collapsed-ε samples).
    adapt_mass: bool = True


class HMCResult(NamedTuple):
    samples: Dict  # pytree with leading axes (num_chains, num_samples)
    accept_rate: jnp.ndarray  # (num_chains,)
    step_size: jnp.ndarray  # (num_chains,) adapted step sizes
    log_probs: jnp.ndarray  # (num_chains, num_samples)
    # (num_chains, warmup+samples) per-iteration (step size, accept prob) —
    # the adaptation trace, for mixing diagnostics
    eps_trace: Optional[jnp.ndarray] = None
    accept_trace: Optional[jnp.ndarray] = None


def _flatten(params):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    shapes = [l.shape for l in leaves]
    sizes = [int(jnp.size(l)) for l in leaves]
    flat = jnp.concatenate([jnp.ravel(l) for l in leaves]) if leaves else jnp.zeros(0)
    return flat, (treedef, shapes, sizes)


def _unflatten(flat, spec):
    treedef, shapes, sizes = spec
    out, leaves = 0, []
    for shape, size in zip(shapes, sizes):
        leaves.append(flat[out : out + size].reshape(shape))
        out += size
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _leapfrog(grad_fn, q, p, step_size, num_steps, inv_mass):
    """Leapfrog with diagonal mass: H = −logp(q) + ½ pᵀ M⁻¹ p."""

    def body(carry, _):
        q, p = carry
        p = p + 0.5 * step_size * grad_fn(q)
        q = q + step_size * inv_mass * p
        p = p + 0.5 * step_size * grad_fn(q)
        return (q, p), None

    (q, p), _ = jax.lax.scan(body, (q, p), None, length=num_steps)
    return q, p


def sample(
    log_prob_fn: LogProbFn,
    init_params: Dict,
    key: jax.Array,
    config: HMCConfig = HMCConfig(),
    num_chains: int = 4,
    mesh=None,
) -> HMCResult:
    """Run ``num_chains`` HMC chains (vmapped) with dual-averaging warmup.

    ``log_prob_fn(params_pytree) -> scalar`` is the unnormalized log
    posterior (e.g. exact.mll + prior terms). Chains start from
    ``init_params`` jittered with per-chain noise.

    With ``mesh`` given, the chain axis is sharded over the mesh devices
    (chains are embarrassingly parallel — zero collectives; the north-star
    multi-chip HMC requirement, SURVEY §7 M6). ``num_chains`` is padded up to
    a mesh-size multiple internally (extra chains computed then sliced off).
    Sharded and unsharded runs use the same per-chain keys but may diverge
    trajectory-wise (XLA compiles differently-partitioned programs and HMC
    amplifies rounding) — they are statistically equivalent, not bitwise.
    """
    flat0, spec = _flatten(init_params)
    dim = flat0.shape[0]

    def logp_flat(q):
        return log_prob_fn(_unflatten(q, spec))

    grad_fn = jax.grad(logp_flat)

    def one_chain(chain_key):
        k_init, k_run = jax.random.split(chain_key)
        q0 = flat0 + 0.01 * jax.random.normal(k_init, (dim,))

        adapt_ok = config.adapt_mass and config.num_warmup >= 20
        # Stan-style windowed warmup: mass re-estimation + dual-averaging
        # reset at these iterations. A single half-warmup freeze bootstraps
        # the mass from samples drawn at a COLLAPSED step size (anisotropy
        # shrinks ε before any variance is visible — measured ε ≈ 3e-3 and
        # split-R̂ up to 2.7 on the 400-node driver); alternating
        # (ε-adapt → mass-freeze → ε re-adapt) windows let each round's mass
        # open up the next round's step size.
        wu = config.num_warmup
        boundaries = (
            [wu // 4, wu // 2, (3 * wu) // 4] if adapt_ok else []
        )

        def hmc_step(state, step_input):
            (q, log_eps, h_bar, log_eps_bar, mu, accepts, it, wt,
             w_mean, w_m2, w_cnt, inv_mass) = state
            step_key, is_warmup = step_input
            k_mom, k_acc = jax.random.split(step_key)
            eps = jnp.exp(log_eps)
            # momentum p ~ N(0, M) with M = inv_mass⁻¹ (diagonal)
            p0 = jax.random.normal(k_mom, (dim,)) / jnp.sqrt(inv_mass)
            q_new, p_new = _leapfrog(
                grad_fn, q, p0, eps, config.num_leapfrog, inv_mass
            )
            h0 = logp_flat(q) - 0.5 * jnp.sum(inv_mass * p0**2)
            h1 = logp_flat(q_new) - 0.5 * jnp.sum(inv_mass * p_new**2)
            log_accept = jnp.minimum(h1 - h0, 0.0)
            log_accept = jnp.where(jnp.isfinite(log_accept), log_accept, -jnp.inf)
            accept = jnp.log(jax.random.uniform(k_acc, ())) < log_accept
            q = jnp.where(accept, q_new, q)

            # Welford accumulation since the last window boundary.
            if adapt_ok:
                w_cnt_new = w_cnt + 1.0
                delta = q - w_mean
                w_mean_new = w_mean + delta / w_cnt_new
                w_m2_new = w_m2 + delta * (q - w_mean_new)
                w_mean = jnp.where(is_warmup, w_mean_new, w_mean)
                w_m2 = jnp.where(is_warmup, w_m2_new, w_m2)
                w_cnt = jnp.where(is_warmup, w_cnt_new, w_cnt)
                at_switch = is_warmup & jnp.any(
                    jnp.stack([it == b - 1 for b in boundaries])
                )
                est_var = w_m2 / jnp.maximum(w_cnt - 1.0, 1.0)
                # regularize toward unit (Stan's shrinkage) and floor
                est_var = jnp.maximum(0.9 * est_var + 0.1, 1e-4)
                inv_mass = jnp.where(at_switch, est_var, inv_mass)
                # window reset: restart Welford AND dual averaging around the
                # current step size (the new mass changes what ε means)
                w_mean = jnp.where(at_switch, jnp.zeros_like(w_mean), w_mean)
                w_m2 = jnp.where(at_switch, jnp.zeros_like(w_m2), w_m2)
                w_cnt = jnp.where(at_switch, 0.0, w_cnt)
                h_bar = jnp.where(at_switch, 0.0, h_bar)
                mu = jnp.where(at_switch, jnp.log(10.0) + log_eps, mu)
                wt = jnp.where(at_switch, 0.0, wt)

            # dual averaging (only during warmup; t counts within-window so
            # each mass freeze re-adapts ε, but the ε̄ average is weighted by
            # the GLOBAL iteration — a per-window reset of the averaging
            # weight made the final step size hostage to the last window's
            # realization, and a late divergence streak (heavy posterior
            # tails blow up leapfrog at moderate ε) collapsed it to 1e-3
            # with on-target accept: the round-3 published non-mixing)
            a_prob = jnp.exp(log_accept)
            t = wt + 1.0
            eta = 1.0 / (t + config.t0)
            h_bar_new = (1 - eta) * h_bar + eta * (config.target_accept - a_prob)
            log_eps_new = mu - jnp.sqrt(t) / config.gamma * h_bar_new
            x_eta = (it + 1.0) ** (-config.kappa)
            log_eps_bar_new = x_eta * log_eps_new + (1 - x_eta) * log_eps_bar

            log_eps = jnp.where(is_warmup, log_eps_new, log_eps_bar)
            h_bar = jnp.where(is_warmup, h_bar_new, h_bar)
            log_eps_bar = jnp.where(is_warmup, log_eps_bar_new, log_eps_bar)
            accepts = accepts + jnp.where(is_warmup, 0.0, accept.astype(jnp.float32))
            return (
                q, log_eps, h_bar, log_eps_bar, mu, accepts, it + 1.0,
                wt + 1.0, w_mean, w_m2, w_cnt, inv_mass,
            ), (q, logp_flat(q), jnp.exp(log_eps), a_prob)

        total = config.num_warmup + config.num_samples
        keys = jax.random.split(k_run, total)
        warm = jnp.arange(total) < config.num_warmup
        init_state = (
            q0,
            jnp.log(config.initial_step_size),
            jnp.zeros(()),
            jnp.log(config.initial_step_size),
            jnp.log(10.0 * config.initial_step_size),
            jnp.zeros(()),
            jnp.zeros(()),
            jnp.zeros(()),
            jnp.zeros((dim,)),
            jnp.zeros((dim,)),
            jnp.zeros(()),
            jnp.ones((dim,)),
        )
        (qf, log_eps, _, log_eps_bar, _, accepts, *_), (qs, lps, eps_tr, a_tr) = jax.lax.scan(
            hmc_step, init_state, (keys, warm)
        )
        qs = qs[config.num_warmup :]
        lps = lps[config.num_warmup :]
        return qs, lps, accepts / config.num_samples, jnp.exp(log_eps_bar), eps_tr, a_tr

    run_chains = jax.jit(jax.vmap(one_chain))
    if mesh is None:
        chain_keys = jax.random.split(key, num_chains)
        qs, lps, acc, eps, eps_tr, a_tr = run_chains(chain_keys)
    else:
        from jax.sharding import NamedSharding, PartitionSpec

        nd = mesh.devices.size
        padded = ((num_chains + nd - 1) // nd) * nd
        chain_keys = jax.random.split(key, padded)
        sharding = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
        chain_keys = jax.device_put(chain_keys, sharding)
        qs, lps, acc, eps, eps_tr, a_tr = run_chains(chain_keys)
        if padded != num_chains:
            qs, lps, acc, eps, eps_tr, a_tr = (
                qs[:num_chains], lps[:num_chains], acc[:num_chains],
                eps[:num_chains], eps_tr[:num_chains], a_tr[:num_chains]
            )
    samples = jax.vmap(jax.vmap(lambda q: _unflatten(q, spec)))(qs)
    return HMCResult(samples=samples, accept_rate=acc, step_size=eps,
                     log_probs=lps, eps_trace=eps_tr, accept_trace=a_tr)


def refine_mode(
    log_prob_fn: LogProbFn,
    init_params: Dict,
    num_steps: int = 100,
) -> Tuple[Dict, jnp.ndarray]:
    """L-BFGS ascent of ``log_prob_fn`` from ``init_params`` → (mode, -logp
    trace). Polish the mode before :func:`sample_laplace`: an Adam ML-II
    point can sit off the posterior mode along near-flat directions, and the
    Hessian there mis-scales the whitening (measured: ε collapsed to 2e-4
    and split-R̂(raw_noise) = 50 without this)."""
    import optax

    neg = lambda q: -log_prob_fn(q)
    opt = optax.lbfgs()

    @jax.jit
    def run(p0):
        vg = optax.value_and_grad_from_state(neg)

        def step(carry, _):
            p, st = carry
            v, g = vg(p, state=st)
            up, st = opt.update(g, st, p, value=v, grad=g, value_fn=neg)
            return (optax.apply_updates(p, up), st), v

        (p, _), vs = jax.lax.scan(
            step, (p0, opt.init(p0)), None, length=num_steps
        )
        return p, vs

    return run(init_params)


def sample_laplace(
    log_prob_fn: LogProbFn,
    mode_params: Dict,
    key: jax.Array,
    config: HMCConfig = HMCConfig(),
    num_chains: int = 4,
    mesh=None,
) -> HMCResult:
    """HMC in the Laplace-whitened space around a posterior mode.

    GP hyperparameter posteriors are severely anisotropic in the raw
    (softplus-inverse) coordinates — the likelihood pins the noise variance
    orders of magnitude harder than β — so dual averaging collapses the step
    size to the stiffest direction (measured: ε ≈ 2e-4 and split-R̂ ≈ 23 on
    raw_noise in the hmc driver). Given the ML-II mode q*, this whitens with
    the Hessian: q = q* + Σ^{1/2} z where Σ = (−∇²logp(q*))⁻¹ (eigenvalue-
    clipped), and runs standard HMC on z — near the mode the z-posterior is
    ≈ N(0, I), so one step size serves every direction. Returns samples
    mapped back to the original parameter pytree.
    """
    flat0, spec = _flatten(mode_params)
    dim = flat0.shape[0]

    def logp_flat(q):
        return log_prob_fn(_unflatten(q, spec))

    h = jax.hessian(logp_flat)(flat0)
    prec = -0.5 * (h + h.T)
    evals, evecs = jnp.linalg.eigh(prec)
    # RELATIVE eigenvalue floor. The round-3 absolute clip (1e-6) let a
    # near-flat / not-fully-converged mode direction blow the whitened scale
    # up to 1/sqrt(1e-6) = 1000: a z-step of 0.2 then moved raw params by
    # ~200, dual averaging collapsed ε to ~2e-4 globally, and the stiff
    # raw_noise dimension stopped mixing (published split-R̂ = 50). Bounding
    # the condition number at 1e4 caps the scale spread at 100×, which the
    # mass-matrix adaptation then finishes off.
    evals_raw = evals
    evals = jnp.maximum(evals, jnp.maximum(1e-4 * jnp.max(evals), 1e-10))
    sqrt_cov = evecs * (1.0 / jnp.sqrt(evals))[None, :]  # Σ^{1/2} (sym-free form)
    import os as _os

    if _os.environ.get("GRAPHGP_HMC_DEBUG"):
        import numpy as _np

        print(
            "sample_laplace: precision eigvals (raw)",
            _np.asarray(evals_raw),
            "clipped", _np.asarray(evals),
            flush=True,
        )

    def log_prob_z(zp):
        return logp_flat(flat0 + sqrt_cov @ zp["z"])

    res = sample(
        log_prob_z,
        {"z": jnp.zeros((dim,), jnp.float32)},
        key,
        config=config,
        num_chains=num_chains,
        mesh=mesh,
    )
    zs = res.samples["z"]  # (chains, draws, dim)
    qs = flat0[None, None, :] + jnp.einsum("ij,csj->csi", sqrt_cov, zs)
    samples = jax.vmap(jax.vmap(lambda q: _unflatten(q, spec)))(qs)
    return HMCResult(
        samples=samples,
        accept_rate=res.accept_rate,
        step_size=res.step_size,
        log_probs=res.log_probs,
        eps_trace=res.eps_trace,
        accept_trace=res.accept_trace,
    )


def split_rhat(x: jnp.ndarray) -> jnp.ndarray:
    """Split-chain potential-scale-reduction R-hat (Gelman et al. / BDA3).

    x: (num_chains, num_draws, *param_shape) → R-hat with shape *param_shape.
    Each chain is split in half (2C half-chains) to detect within-chain
    drift as well as between-chain disagreement.
    """
    c, s = x.shape[:2]
    half = s // 2
    chains = jnp.concatenate([x[:, :half], x[:, half : 2 * half]], axis=0)
    w = chains.var(axis=1, ddof=1).mean(axis=0)
    b = half * chains.mean(axis=1).var(axis=0, ddof=1)
    var_plus = (half - 1) / half * w + b / half
    return jnp.sqrt(var_plus / jnp.maximum(w, 1e-30))


def split_rhat_tree(samples: Dict) -> Dict:
    """Per-parameter split-chain R-hat over a samples pytree with leading
    (chains, draws) axes; returns a pytree of per-element R-hat arrays."""
    return jax.tree_util.tree_map(split_rhat, samples)


def make_gp_log_posterior(
    mll_fn: Callable[[Dict], jnp.ndarray],
    prior_std: float = 2.0,
    anchors: Optional[Dict[str, Tuple[float, float]]] = None,
) -> LogProbFn:
    """Posterior = mll + iid Gaussian prior over all (unconstrained) params.

    ``anchors``: optional {param_name: (center, std)} extra Gaussian factors
    on specific raw parameters. The GP noise direction has a likelihood
    PLATEAU as raw_noise → −∞ (softplus saturates, gradients vanish):
    chains that wander onto it freeze — leapfrog diverges there at any
    useful ε, collapsing the adapted step size for the whole run. A weak
    anchor at the ML-II noise (the same modeling choice as the reference's
    LogNormal prior on likelihood variance, ablation_study.py:66-74)
    removes the plateau without informing the bulk: the likelihood pins the
    noise far harder than the anchor does."""

    anchors = anchors or {}

    def log_prob(params):
        prior = sum(
            -0.5 * jnp.sum((leaf / prior_std) ** 2)
            for leaf in jax.tree_util.tree_leaves(params)
        )
        for name, (center, std) in anchors.items():
            prior = prior - 0.5 * jnp.sum(
                ((params[name] - center) / std) ** 2
            )
        return mll_fn(params) + prior

    return log_prob
