"""Adaptive-tempered Sequential Monte Carlo (SMC) sampler.

Beyond the reference suite (which has no particle methods at all): SMC
is the many-particle algorithm TPUs were built for — every stage is one
fused batch evaluation over N particles, resampling is a cumsum +
searchsorted gather, and the whole run compiles to a single bounded
`lax.while_loop`.  It complements the MCMC estimators already here:

  - a THIRD independent log-evidence estimator (alongside
    evidence.log_evidence's thermodynamic-integration and stepping-stone
    paths) with its own failure modes — cross-checking all three is the
    standard way to trust a marginal likelihood;
  - a sampler that handles multimodal posteriors without the long
    decorrelation times of a single tempered chain (the population
    carries all modes simultaneously; cf. tempering.parallel_tempering).

Algorithm (Del Moral, Doucet & Jasra 2006; adaptive ladder per Jasra et
al. 2011): particles start as PRIOR draws at beta=0 and anneal through
p_beta propto p0(x) * exp(beta * loglik(x)).  Each stage

  1. picks the next beta by bisection so the conditional ESS of the
     incremental weights w_i = exp(dbeta * ll_i) hits `target_ess * N`
     (the relative-ESS rule; dbeta is monotone in cESS so bisection on
     a fixed iteration count is exact to float tolerance),
  2. accumulates log Z += log mean_i exp(dbeta * ll_i)  (particles carry
     equal weights because stage 3 resamples every stage),
  3. systematically resamples (Kitagawa 1996: one uniform, stratified
     inverse-CDF — lower variance than multinomial, and on TPU it is a
     cumsum + searchsorted + gather),
  4. rejuvenates with `num_moves` Metropolis-adjusted Langevin steps
     targeting p_beta exactly (same proposal/acceptance algebra as
     langevin.mala_batched, inlined here because beta is a loop-carried
     traced value).  The step is lr = c * Var_pop (the pooled particle
     variance — the population itself tracks the shrinking posterior
     scale as beta grows, the standard SMC inner-kernel tuning trick),
     with the dimensionless c Robbins-Monro-adapted BETWEEN stages
     toward `target_accept` (within a stage the step is fixed, so every
     stage's kernel is exactly p_beta-invariant).

The loop is a `lax.while_loop` bounded by `max_stages`; per-stage
diagnostics are written into fixed-size buffers so the result is fully
jit-compatible.  All stage decisions (bisection, acceptance adaptation)
happen on-device — there is no host round-trip per stage.

Multi-device (SURVEY.md §2.9): pass `axis_name` when the particle axis
is sharded under `jax.shard_map` (see `parallel.smc_sharded`).  Every
per-particle random draw is keyed by the particle's GLOBAL index
(`fold_in(key, global_idx)`), stage decisions run on `all_gather`ed
(N,) log-lik vectors, and resampling gathers the global population —
so a sharded run produces the SAME stage ladder, log Z, and particles
as the single-device run (bit-for-bit when the batch potential is
row-independent, e.g. a vmapped per-particle potential).  The only
per-stage collectives are (N,)-vector gathers plus one particle
all_gather for resampling; everything else stays local.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.pytree import PyTree
from .base import batch_value_and_grad, langevin_noise_scale
from .langevin import _tree_sum_squares_per_chain, _tree_where_per_chain

__all__ = ["SMCResult", "smc", "systematic_resample"]


class SMCResult(NamedTuple):
    particles: PyTree         # (N, ...) final particles ~ posterior
    log_z: jax.Array          # SMC log-evidence estimate
    num_stages: jax.Array     # stages actually used (<= max_stages)
    betas: jax.Array          # (max_stages,) ladder visited; NaN past the end
    ess: jax.Array            # (max_stages,) conditional ESS at each stage
    accept_rate: jax.Array    # (max_stages,) mean MALA acceptance per stage
    step_sizes: jax.Array     # (max_stages,) rejuvenation step size used
    log_lik: jax.Array        # (N,) final per-particle log likelihood


def _resample_indices(key: jax.Array, log_weights: jax.Array) -> jax.Array:
    """Systematic (stratified single-uniform) resampling indices for the
    full population.  `log_weights` (N,) need not be normalized."""
    n = log_weights.shape[0]
    w = jax.nn.softmax(log_weights)
    cdf = jnp.cumsum(w)
    u = (jax.random.uniform(key, ()) + jnp.arange(n, dtype=w.dtype)) / n
    # guard the top edge against cumsum rounding (cdf[-1] may be <1-ulp)
    return jnp.minimum(jnp.searchsorted(cdf, u, side="left"), n - 1)


def systematic_resample(key: jax.Array, log_weights: jax.Array,
                        position: PyTree) -> PyTree:
    """Systematic resampling of a particle batch.  Returns the gathered
    pytree; every leaf's leading axis is permuted identically."""
    idx = _resample_indices(key, log_weights)
    return jax.tree.map(lambda l: jnp.take(l, idx, axis=0), position)


def _rowwise_normal(key: jax.Array, position: PyTree,
                    gidx: jax.Array) -> PyTree:
    """iid standard normals shaped like `position`, where row i of every
    leaf is drawn from fold_in(fold_in(key, leaf_index), gidx[i]) — the
    draw depends only on the particle's GLOBAL index, so local shards of
    a sharded population see exactly the single-device values."""
    leaves, treedef = jax.tree.flatten(position)
    out = []
    for li, leaf in enumerate(leaves):
        kl = jax.random.fold_in(key, li)
        row = lambda i, leaf=leaf, kl=kl: jax.random.normal(
            jax.random.fold_in(kl, i), leaf.shape[1:], leaf.dtype)
        out.append(jax.vmap(row)(gidx))
    return jax.tree.unflatten(treedef, out)


def _rowwise_uniform(key: jax.Array, gidx: jax.Array, dtype) -> jax.Array:
    """One U[0,1) per particle, keyed by the global particle index."""
    return jax.vmap(
        lambda i: jax.random.uniform(jax.random.fold_in(key, i), (),
                                     dtype))(gidx)


def _pooled_variance(position):
    """Scalar population variance pooled over every dimension of every
    leaf (particles on axis 0) — the scale proxy for the MALA step."""
    leaves = jax.tree.leaves(position)
    tot = sum(jnp.sum(jnp.var(l, axis=0)) for l in leaves)
    dims = sum(int(np.prod(l.shape[1:])) for l in leaves)
    return tot / dims


def _conditional_ess(dbeta, ll):
    """ESS of incremental weights exp(dbeta*ll) from equal-weight
    particles: (sum w)^2 / sum w^2, computed in log space."""
    lw = dbeta * ll
    a = 2.0 * jax.scipy.special.logsumexp(lw)
    b = jax.scipy.special.logsumexp(2.0 * lw)
    return jnp.exp(a - b)


def _next_beta(beta, ll, target, bisect_iters=40):
    """Largest dbeta in (0, 1-beta] with cESS(dbeta) >= target, by
    bisection (cESS is monotone nonincreasing in dbeta)."""
    hi0 = 1.0 - beta

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        ok = _conditional_ess(mid, ll) >= target
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

    full = _conditional_ess(hi0, ll) >= target
    lo, _ = jax.lax.fori_loop(0, bisect_iters, body,
                              (jnp.zeros_like(hi0), hi0))
    dbeta = jnp.where(full, hi0, lo)
    # never stall: if even a tiny dbeta misses the target (pathological
    # weight degeneracy), still advance by the bisection floor
    return beta + jnp.maximum(dbeta, hi0 * 2.0 ** (-bisect_iters))


def smc(key: jax.Array,
        log_lik_batch: Callable[[PyTree], jax.Array],
        log_prior_batch: Callable[[PyTree], jax.Array],
        prior_particles: PyTree,
        *,
        num_moves: int = 5,
        target_ess: float = 0.5,
        step_scale: float = 0.5,
        target_accept: float = 0.57,
        adapt_rate: float = 1.0,
        max_stages: int = 100,
        axis_name: Optional[str] = None) -> SMCResult:
    """Sample the posterior p(x) propto p0(x) exp(loglik(x)) and estimate
    log Z = log int p0(x) exp(loglik(x)) dx by adaptive tempered SMC.

    `log_lik_batch` / `log_prior_batch` follow the fused batch-potential
    contract (leaves with leading particle axis N -> (N,) values), so the
    GP/MLP fused trajectory kernels drop in directly.

    `prior_particles` MUST be i.i.d. draws from the prior p0 (the beta=0
    population); with an unnormalized `log_prior_batch`, log_z is shifted
    by the prior's log-normalizer exactly as in evidence.log_evidence.

    `target_ess` in (0,1): relative conditional-ESS kept at each
    temperature step (0.5 is the standard default; higher = more, smaller
    stages).  The rejuvenation MALA step is
    `lr = step_scale * pooled-particle-variance`, with log(step_scale)
    adapted between stages by adapt_rate*(accept - target_accept).

    `axis_name`: set when running inside `jax.shard_map` with the
    particle axis sharded over that mesh axis (use `parallel.smc_sharded`
    rather than calling this directly).  Stage decisions then run on the
    gathered global population, and the result matches the single-device
    run (module docstring).
    """
    if not 0.0 < target_ess < 1.0:
        raise ValueError("target_ess must be in (0, 1)")
    leaves = jax.tree.leaves(prior_particles)
    if not leaves or leaves[0].ndim < 1:
        raise ValueError("prior_particles must carry a leading particle axis")
    n = leaves[0].shape[0]                      # LOCAL particle count

    if axis_name is None:
        gather = lambda v: v
        gather_tree = lambda t: t
        offset = jnp.zeros((), jnp.int32)
    else:
        gather = lambda v: jax.lax.all_gather(v, axis_name, tiled=True)
        gather_tree = lambda t: jax.tree.map(
            lambda l: jax.lax.all_gather(l, axis_name, tiled=True), t)
        offset = (jax.lax.axis_index(axis_name) * n).astype(jnp.int32)
    gidx = offset + jnp.arange(n, dtype=jnp.int32)

    ll0 = log_lik_batch(prior_particles)
    dtype = ll0.dtype
    n_total = gather(ll0).shape[0]              # GLOBAL particle count
    target = jnp.asarray(target_ess * n_total, dtype)

    def vag_for(beta):
        def pot_rows(x):
            return -(beta * log_lik_batch(x) + log_prior_batch(x))
        return batch_value_and_grad(pot_rows)

    def mala_sweep(key, beta, lr, position):
        """num_moves exact MALA steps targeting p_beta; returns the moved
        particles, their loglik, and the GLOBAL mean acceptance.  All
        per-particle randomness is keyed by the global particle index."""
        vag = vag_for(beta)
        u0, g0 = vag(position)

        def body(carry, k):
            pos, u, g = carry
            k_prop, k_mh = jax.random.split(k)
            noise = _rowwise_normal(k_prop, pos, gidx)
            prop = jax.tree.map(
                lambda p, gr, nz: p - lr * gr - langevin_noise_scale(lr) * nz,
                pos, g, noise)
            u_new, g_new = vag(prop)
            log_alpha = u - u_new
            rev = jax.tree.map(lambda po, pn, gn: po - pn + lr * gn,
                               pos, prop, g_new)
            fwd = jax.tree.map(lambda pn, po, go: pn - po + lr * go,
                               prop, pos, g)
            log_alpha += -1.0 / (4 * lr) * _tree_sum_squares_per_chain(rev)
            log_alpha -= -1.0 / (4 * lr) * _tree_sum_squares_per_chain(fwd)
            accept = jnp.isfinite(log_alpha) & (
                jnp.log(_rowwise_uniform(k_mh, gidx, dtype)) < log_alpha)
            pos = _tree_where_per_chain(accept, prop, pos)
            u = jnp.where(accept, u_new, u)
            g = _tree_where_per_chain(accept, g_new, g)
            return (pos, u, g), jnp.mean(gather(accept.astype(dtype)))

        (pos, _, _), accs = jax.lax.scan(
            body, (position, u0, g0), jax.random.split(key, num_moves))
        return pos, log_lik_batch(pos), jnp.mean(accs)

    nan = jnp.full((max_stages,), jnp.nan, dtype)

    class Carry(NamedTuple):
        key: jax.Array
        position: PyTree
        ll: jax.Array
        beta: jax.Array
        log_z: jax.Array
        log_step: jax.Array
        stage: jax.Array
        betas: jax.Array
        ess: jax.Array
        accept: jax.Array
        steps: jax.Array

    def cond(c):
        return (c.beta < 1.0) & (c.stage < max_stages)

    def body(c):
        k_res, k_mov, k_next = jax.random.split(c.key, 3)
        ll_all = gather(c.ll)                   # (n_total,)
        beta_new = _next_beta(c.beta, ll_all, target)
        dbeta = beta_new - c.beta
        lw_all = dbeta * ll_all
        log_z = c.log_z + jax.scipy.special.logsumexp(lw_all) - jnp.log(
            jnp.asarray(n_total, dtype))
        ess_now = _conditional_ess(dbeta, ll_all)
        # resample from the GLOBAL population: indices are computed on the
        # gathered weights (identical on every device), each device takes
        # its own slice of the index vector
        idx_all = _resample_indices(k_res, lw_all)
        pos_all = gather_tree(c.position)
        # one gather builds the resampled GLOBAL population; the local
        # shard is its rows [offset, offset + n)
        pos_res_all = jax.tree.map(lambda l: jnp.take(l, idx_all, axis=0),
                                   pos_all)
        position = jax.tree.map(
            lambda l: jax.lax.dynamic_slice_in_dim(l, offset, n, axis=0),
            pos_res_all)
        # step scale from the GLOBAL resampled population's pooled variance
        lr = jnp.exp(c.log_step) * _pooled_variance(pos_res_all)
        position, ll, acc = mala_sweep(k_mov, beta_new, lr, position)
        log_step = c.log_step + adapt_rate * (acc - target_accept)
        i = c.stage
        return Carry(k_next, position, ll, beta_new, log_z, log_step,
                     i + 1,
                     c.betas.at[i].set(beta_new.astype(dtype)),
                     c.ess.at[i].set(ess_now),
                     c.accept.at[i].set(acc),
                     c.steps.at[i].set(lr))

    init = Carry(key, prior_particles, ll0, jnp.zeros((), dtype),
                 jnp.zeros((), dtype), jnp.log(jnp.asarray(step_scale, dtype)),
                 jnp.zeros((), jnp.int32), nan, nan, nan, nan)
    c = jax.lax.while_loop(cond, body, init)

    return SMCResult(particles=c.position, log_z=c.log_z,
                     num_stages=c.stage, betas=c.betas, ess=c.ess,
                     accept_rate=c.accept, step_sizes=c.steps,
                     log_lik=c.ll)
