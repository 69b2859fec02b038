"""Marginal-likelihood (model evidence) estimation over a power posterior.

Beyond the reference suite: the reference has no model-comparison
machinery at all (its closest instrument is the per-run loss pickle,
reference scripts/vanderpol/gp.py:383-387) — it sweeps inducing-grid
sizes M across an 81-config SLURM array (gen_configs.py:65-70) and
compares fits by eye.  Evidence is the principled replacement: the
power-posterior path

    p_beta(x)  propto  p0(x) * exp(beta * loglik(x)),    0 = beta_0 < ... < beta_{K-1} = 1

is sampled with K rungs * C chains as ONE fused batch (rows = K*C through
the standard batch-potential contract — a single fused forward+backward
per step covers every rung), each rung running exact per-rung MALA (fixed
per-rung step size during the measurement window, so reversibility per
rung is preserved).  Two estimators are computed from the same draws:

  - thermodynamic integration (TI, a.k.a. path sampling; Gelman & Meng
    1998):  log Z = int_0^1 E_beta[loglik] dbeta, trapezoid over the rungs;
  - stepping stone (SS; Xie et al. 2011, Syst. Biol. 60(2)):
    log Z = sum_k log E_{beta_k}[ exp((beta_{k+1}-beta_k) * loglik) ],
    evaluated with a per-rung log-sum-exp (unbiased bridge per rung given
    exact rung samples; dominates TI's quadrature bias on coarse ladders).

`adapt_step=True` Robbins-Monro-adapts each rung's MALA step toward
`target_accept` DURING WARMUP only (the measured window runs the frozen
steps, so every rung's kernel stays exactly p_beta-invariant) — on
posteriors whose scale shrinks orders of magnitude from prior to
posterior (ODE posteriors), a single hand-tuned ladder step is either
frozen at the cold rungs or diffusive at the hot ones.

Both estimators come with delete-one-chain jackknife standard errors
(`ti_se`/`ss_se`): chains are independent, so the jackknife over chains
is an honest MC error bar that also handles SS's nonlinear pooled
logsumexp (a naive per-chain spread overestimates SS's error by ~1000x
on heavy-tailed bridges — single-chain SS is Jensen-biased low).

MEASURED LIMITATION (2026-08-20, tiny GP-VDP posterior, M=3): TI is the
wrong estimator for ODE posteriors under diffuse field priors.  Its
integrand E_beta[loglik] spans -1.3e5 (prior) to -80 (posterior) with
Var_beta[ll] ~ (1e5)^2 at every hot rung, so the MC error of each rung
mean is O(1e3) at any affordable draw count and no ladder (power-law
K=8..24, log-spaced K=24..56 down to beta=1e-6) moves the estimate off
-3000±1000 when the truth is -91; the Friel-Hurn-Wyse variance
correction amplifies the rung-variance noise and is worse (-4e3..-4e4).
The jackknife ti_se reports this honestly.  Rank models by
`log_z_ss` cross-checked against `samplers.smc` (both landed within
0.3 nats of each other and of Laplace on the same posterior); treat
`log_z_ti` as a diagnostic only.

`log_prior` must be NORMALIZED if an absolute evidence is wanted; with an
unnormalized prior the result is shifted by its (unknown) log-normalizer,
which still cancels in model comparisons sharing the same prior family.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.pytree import PyTree, tree_random_normal
from .base import batch_value_and_grad
from .langevin import _tree_sum_squares_per_chain, _tree_where_per_chain

__all__ = ["EvidenceResult", "evidence_reliability",
           "fit_gaussian_reference", "log_evidence", "log_evidence_gss",
           "power_ladder"]


def power_ladder(num_rungs: int, power: float = 5.0) -> jax.Array:
    """beta_k = (k/(K-1))^power, k = 0..K-1: the standard evidence ladder
    (Xie et al. 2011 recommend concentrating rungs near beta=0, where
    E_beta[loglik] changes fastest; power ~ 3-5 matches their qbeta(0.3)
    prescription)."""
    if num_rungs < 2:
        raise ValueError("need at least 2 rungs")
    k = np.arange(num_rungs, dtype=np.float64)
    return jnp.asarray((k / (num_rungs - 1)) ** power, jnp.float32)


class EvidenceResult(NamedTuple):
    log_z_ti: jax.Array        # trapezoid thermodynamic-integration estimate
    log_z_ss: jax.Array        # stepping-stone estimate
    betas: jax.Array           # (K,) the ladder actually used
    mean_log_lik: jax.Array    # (K,) E_{beta_k}[loglik] (MC estimate)
    accept_rate: jax.Array     # (K,) per-rung MALA acceptance over sampling
    log_lik_draws: jax.Array   # (S, K, C) retained loglik draws
    ti_se: jax.Array           # per-chain-spread SE of log_z_ti
    ss_se: jax.Array           # per-chain-spread SE of log_z_ss
    step_sizes: jax.Array      # (K,) per-rung MALA steps used for sampling
    num_nonfinite: jax.Array   # retained draws with non-finite loglik
    #                            (exploded ODE solves at hot rungs; they
    #                            enter the estimators as a finite floor
    #                            max_ll - 1e4, i.e. zero bridge weight)


def _check_betas(betas) -> np.ndarray:
    b = np.asarray(betas, np.float64)
    if b.ndim != 1 or b.size < 2:
        raise ValueError("betas must be a 1-D ladder with >= 2 entries")
    if abs(b[0]) > 1e-8 or abs(b[-1] - 1.0) > 1e-6:
        raise ValueError("power-posterior ladder runs beta_0 = 0 (prior) "
                         "to beta_{K-1} = 1 (posterior)")
    if np.any(np.diff(b) <= 0):
        raise ValueError("betas must be strictly increasing")
    return b


def log_evidence(key: jax.Array,
                 log_lik_batch: Callable[[PyTree], jax.Array],
                 log_prior_batch: Callable[[PyTree], jax.Array],
                 init_position: PyTree,
                 betas=None,
                 *,
                 num_rungs: int = 16,
                 step_size=1e-2,
                 num_warmup: int = 500,
                 num_samples: int = 1000,
                 thin: int = 1,
                 adapt_step: bool = False,
                 target_accept: float = 0.57,
                 adapt_rate: float = 0.25) -> EvidenceResult:
    """Estimate log Z = log int p0(x) exp(loglik(x)) dx.

    `log_lik_batch` / `log_prior_batch` follow the fused batch-potential
    contract: leaves with a leading chain axis R -> (R,) values.
    `init_position` carries a leading chain axis C (chains per rung); the
    K*C replica rows are tiled from it and separate during warmup.
    `step_size`: scalar, or a (K,) array of per-rung MALA step sizes.
    With `adapt_step=True` these are the INITIAL steps; each rung's log
    step is nudged `adapt_rate * (accept_k - target_accept)` per warmup
    iteration and frozen for the measured window (exactness preserved:
    the sampling kernel is fixed-step MALA per rung).
    """
    if betas is None:
        betas = power_ladder(num_rungs)
    betas_np = _check_betas(betas)
    K = int(betas_np.size)
    betas = jnp.asarray(betas_np, jnp.float32)

    leaves = jax.tree.leaves(init_position)
    if not leaves or leaves[0].ndim < 1:
        raise ValueError("init_position must carry a leading chain axis")
    C = leaves[0].shape[0]
    R = K * C

    pos_rows = jax.tree.map(
        lambda l: jnp.tile(l, (K,) + (1,) * (l.ndim - 1)), init_position)
    beta_rows = jnp.repeat(betas, C)                              # (K*C,)

    def potential_rows(x_rows):
        ll = log_lik_batch(x_rows)
        lp = log_prior_batch(x_rows)
        return -(beta_rows.astype(ll.dtype) * ll + lp)

    vag = batch_value_and_grad(potential_rows)

    s0 = jnp.asarray(step_size, jnp.float32)
    if s0.ndim == 0:
        s0 = jnp.full((K,), s0)
    if s0.shape != (K,):
        raise ValueError("step_size must be scalar or shape (K,)")

    def mala_step(k, pos, u, g, log_s):
        """One exact MALA step per row with per-rung step s = exp(log_s):
        proposal p - s*g - sqrt(2s)*xi, MH term ||.||^2/(4s) — identical
        algebra to langevin.mala_batched with lr=1, precond=s."""
        s_rows = jnp.repeat(jnp.exp(log_s), C)                    # (R,)

        def srow(x):
            return s_rows.reshape((R,) + (1,) * (x.ndim - 1)).astype(x.dtype)

        k_prop, k_mh = jax.random.split(k)
        noise = tree_random_normal(k_prop, pos)
        prop = jax.tree.map(
            lambda p, gr, nz:
                p - srow(p) * gr - jnp.sqrt(2.0 * srow(p)) * nz,
            pos, g, noise)
        u_new, g_new = vag(prop)
        log_alpha = u - u_new
        rev = jax.tree.map(lambda po, pn, gn: po - pn + srow(po) * gn,
                           pos, prop, g_new)
        fwd = jax.tree.map(lambda pn, po, go: pn - po + srow(pn) * go,
                           prop, pos, g)

        def weighted_sq(tree):
            return _tree_sum_squares_per_chain(jax.tree.map(
                lambda x: x / jnp.sqrt(srow(x)), tree))

        log_alpha += -0.25 * weighted_sq(rev)
        log_alpha -= -0.25 * weighted_sq(fwd)
        accept = jnp.isfinite(log_alpha) & (
            jnp.log(jax.random.uniform(k_mh, (R,))) < log_alpha)
        pos = _tree_where_per_chain(accept, prop, pos)
        u = jnp.where(accept, u_new, u)
        g = _tree_where_per_chain(accept, g_new, g)
        acc_k = jnp.mean(accept.astype(jnp.float32).reshape(K, C), axis=1)
        return pos, u, g, acc_k

    if num_samples % thin:
        raise ValueError("num_samples must be a multiple of thin")
    n_keep = num_samples // thin

    def warm_body(carry, k):
        pos, u, g, log_s = carry
        pos, u, g, acc_k = mala_step(k, pos, u, g, log_s)
        if adapt_step:
            log_s = log_s + adapt_rate * (acc_k - target_accept)
        return (pos, u, g, log_s), None

    def samp_body(carry, k):
        def inner(c, kk):
            pos, u, g, log_s = c
            pos, u, g, acc_k = mala_step(kk, pos, u, g, log_s)
            return (pos, u, g, log_s), acc_k
        carry, accs = jax.lax.scan(inner, carry, jax.random.split(k, thin))
        ll = log_lik_batch(carry[0])                             # (K*C,)
        return carry, (ll, jnp.mean(accs, axis=0))

    k_warm, k_samp = jax.random.split(key)
    u0, g0 = vag(pos_rows)
    carry = (pos_rows, u0, g0, jnp.log(s0))
    carry, _ = jax.lax.scan(warm_body, carry,
                            jax.random.split(k_warm, num_warmup))
    carry, (lls, accs) = jax.lax.scan(samp_body, carry,
                                      jax.random.split(k_samp, n_keep))
    steps_used = jnp.exp(carry[3])

    lls = lls.reshape(n_keep, K, C)                               # (S, K, C)
    accs = jnp.mean(accs, axis=0)                                 # (K,)
    # Exploded ODE solves at hot rungs return -inf/nan logliks; raw -inf
    # poisons every logsumexp downstream (0 * -inf in the bridge, -inf
    # pooled A_k -> nan jackknife).  Floor them 1e4 nats below the best
    # finite draw — exactly zero bridge weight at float precision — and
    # report the count so consumers can judge the rung health.
    finite = jnp.isfinite(lls)
    num_nonfinite = jnp.sum(~finite)
    # ADVICE r4: when EVERY retained draw is non-finite the max over an
    # all-False mask is -inf and the floor ll_best - 1e4 stays -inf —
    # log_z_ss/ss_se would come out -inf/NaN "despite" the floor.  Use a
    # finite fallback so the arithmetic stays clean, and NaN-flag the SS
    # estimate below (like TI) — a floor-only estimate has no meaning.
    any_finite = jnp.any(finite)
    ll_best = jnp.where(any_finite,
                        jnp.max(jnp.where(finite, lls, -jnp.inf)), 0.0)
    lls = jnp.where(finite, lls, ll_best - 1e4)
    mean_ll = jnp.mean(lls, axis=(0, 2))                          # (K,)

    db = betas[1:] - betas[:-1]                                   # (K-1,)
    log_z_ti = jnp.sum(db * 0.5 * (mean_ll[:-1] + mean_ll[1:]))
    # the floor is exactly zero weight in the SS logsumexps but enters
    # TI's arithmetic rung means at full weight — a floored TI estimate
    # would be a silently floor-dependent number, so report NaN instead
    log_z_ti = jnp.where(num_nonfinite > 0,
                         jnp.asarray(jnp.nan, log_z_ti.dtype), log_z_ti)

    # stepping stone: rung k's draws bridge beta_k -> beta_{k+1}
    bridge = db[None, :, None] * lls[:, :-1, :]                   # (S,K-1,C)
    log_z_ss = jnp.sum(
        jax.scipy.special.logsumexp(bridge, axis=(0, 2))
        - jnp.log(float(n_keep * C)))
    # no finite draw anywhere -> the estimate is pure floor; flag it
    log_z_ss = jnp.where(any_finite, log_z_ss,
                         jnp.asarray(jnp.nan, log_z_ss.dtype))

    # delete-one-chain jackknife standard errors (chains are independent;
    # the jackknife handles the SS estimator's nonlinear pooled logsumexp
    # correctly, where a naive per-chain spread wildly overestimates —
    # single-chain SS estimates are Jensen-biased low on heavy-tailed
    # bridge weights, exactly the ODE-posterior regime)
    mean_ll_c = jnp.mean(lls, axis=0)                             # (K, C)
    ti_c = jnp.sum(db[:, None] * 0.5
                   * (mean_ll_c[:-1, :] + mean_ll_c[1:, :]), axis=0)  # (C,)
    ti_jack = (jnp.sum(ti_c) - ti_c) / float(C - 1)               # (C,)
    ti_se = jnp.sqrt(float(C - 1) / C
                     * jnp.sum((ti_jack - jnp.mean(ti_jack)) ** 2))
    # SS jackknife from per-(rung, chain) logsumexps over draws:
    # L[k, c] = lse_s bridge[s, k, c];  pooled-without-c per rung =
    # A_k + log1p(-exp(L[k, c] - A_k)) with A_k = lse_c L[k, c]
    L_kc = jax.scipy.special.logsumexp(bridge, axis=0)            # (K-1, C)
    A_k = jax.scipy.special.logsumexp(L_kc, axis=1, keepdims=True)
    frac = jnp.exp(jnp.minimum(L_kc - A_k, 0.0))
    # dtype-aware clamp: 1 - 1e-12 rounds to 1.0 in f32 (the TPU ladder
    # dtype), and log1p(-1) = -inf turned the jackknife SE into NaN
    # whenever one chain dominated a rung's bridge weight
    top = 1.0 - 16.0 * jnp.finfo(frac.dtype).eps
    without_c = A_k + jnp.log1p(-jnp.minimum(frac, top))          # (K-1, C)
    ss_jack = jnp.sum(without_c - jnp.log(float(n_keep * (C - 1))),
                      axis=0)                                     # (C,)
    ss_se = jnp.sqrt(float(C - 1) / C
                     * jnp.sum((ss_jack - jnp.mean(ss_jack)) ** 2))

    return EvidenceResult(log_z_ti=log_z_ti, log_z_ss=log_z_ss,
                          betas=betas, mean_log_lik=mean_ll,
                          accept_rate=accs, log_lik_draws=lls,
                          ti_se=ti_se, ss_se=ss_se,
                          step_sizes=steps_used,
                          num_nonfinite=num_nonfinite)


def fit_gaussian_reference(draws: PyTree, *, min_std: float = 1e-6):
    """Fit a diagonal-Gaussian reference distribution to posterior draws
    (leaves with a leading draw axis) for `log_evidence_gss`.

    Returns (log_ref_batch, sample_fn): `log_ref_batch` maps a batch
    pytree (leading axis R) to NORMALIZED (R,) log densities;
    `sample_fn(key, n)` draws n iid reference samples.  Per-coordinate
    std is floored at `min_std` (collapsed coordinates would otherwise
    make the reference density improper).
    """
    leaves, treedef = jax.tree.flatten(draws)
    mus = [jnp.mean(l, axis=0) for l in leaves]
    sds = [jnp.maximum(jnp.std(l, axis=0), min_std) for l in leaves]
    dims = sum(int(np.prod(l.shape[1:])) for l in leaves)
    log_norm = -0.5 * dims * np.log(2.0 * np.pi) \
        - sum(float(jnp.sum(jnp.log(s))) for s in sds)

    def log_ref_batch(position: PyTree) -> jax.Array:
        ls = jax.tree.leaves(position)
        quad = sum(
            jnp.sum(((l - m[None]) / s[None]) ** 2,
                    axis=tuple(range(1, l.ndim)))
            for l, m, s in zip(ls, mus, sds))
        return -0.5 * quad + log_norm

    def sample_fn(key: jax.Array, n: int) -> PyTree:
        ks = jax.random.split(key, len(leaves))
        out = [m[None] + s[None] * jax.random.normal(
            k, (n,) + l.shape[1:], l.dtype)
            for k, l, m, s in zip(ks, leaves, mus, sds)]
        return jax.tree.unflatten(treedef, out)

    return log_ref_batch, sample_fn


def log_evidence_gss(key: jax.Array,
                     log_lik_batch: Callable[[PyTree], jax.Array],
                     log_prior_batch: Callable[[PyTree], jax.Array],
                     reference_draws: PyTree,
                     *,
                     num_chains: Optional[int] = None,
                     min_std: float = 1e-6,
                     **ladder_kwargs) -> EvidenceResult:
    """GENERALIZED stepping stone (Fan et al. 2011, Mol. Biol. Evol.
    28(1)): estimate log Z by bridging from a NORMALIZED posterior-fitted
    reference g(x) instead of the prior,

        q_beta(x)  propto  g(x)^(1-beta) * [p0(x) exp(loglik(x))]^beta,

    which is exactly the `log_evidence` power path with the substitution
    lik' = loglik + log p0 - log g, prior' = log g — so the whole ladder
    (per-rung MALA, warmup adaptation, SS/TI + jackknife SEs) is reused
    verbatim and `log_z_ss` is an absolute log Z (g is normalized).

    WHY on ODE posteriors (measured 2026-08-21, GP-VDP, this repo):
    plain prior-bridged SS must equilibrate hot rungs in the PRIOR
    regime, where prior-scale fields explode trajectories — its estimate
    moved +292 nats from a quick to a full budget and still sat ~100
    nats from SMC.  With g fitted to SMC particles every rung lives in
    the data-fit regime: the bridge integrand log(lik*prior/g) has
    posterior-scale variance, rungs equilibrate immediately, and the SE
    is honest.

    `reference_draws`: posterior-typical draws (e.g. `smc(...)` final
    particles) used BOTH to fit g (`fit_gaussian_reference`) and to
    initialize the rung chains (first `num_chains` draws; default all).
    """
    log_ref, _ = fit_gaussian_reference(reference_draws, min_std=min_std)

    def lik_bridge(position):
        return (log_lik_batch(position) + log_prior_batch(position)
                - log_ref(position))

    init = reference_draws
    if num_chains is not None:
        init = jax.tree.map(lambda l: l[:num_chains], reference_draws)
    return log_evidence(key, lik_bridge, log_ref, init, **ladder_kwargs)


def evidence_reliability(*, log_z_ti, log_z_ss, ss_se, log_z_gss, gss_se,
                         log_z_smc, smc_se, log_z_laplace,
                         laplace_hessian_pd, waic_elpd,
                         ladder_nonfinite=0, gss_nonfinite=0,
                         disagree_sigma=3.0):
    """Machine-visible per-estimator reliability flags (VERDICT r4 #6).

    The measured estimator regime on GP-ODE posteriors (recorded in
    examples/evidence_model_selection.py and the round-4 record) was
    docstring-visible only; this encodes it so downstream model
    selection cannot silently rank by an estimator the docs call
    diagnostic-only.  Inputs are the numbers `run_evidence` already
    computes; returns
    {"estimators": {name: {"status", "reason"}}, "rank_by": [...]}.

    Statuses: "primary" (use for ranking), "ok" (agrees with a primary
    within `disagree_sigma` joint SEs), "budget_sensitive" /
    "disagrees" (detectable drift from the primaries — the prior-
    bridged SS moved +292 nats with budget on the GP-VDP posterior),
    "diagnostic_only" (known-biased estimator class on this posterior
    family), "inconsistent" (fails an internal sanity bound),
    "failed" (non-finite).
    """
    import math

    flags = {}

    def sigma_gap(a, a_se, b, b_se):
        # non-finite SEs (e.g. smc_se with a single repeat) contribute
        # nothing rather than poisoning the gap; an all-degenerate SE
        # falls back to 1 nat so the test is |a - b| in nats
        def comp(x):
            return x * x if math.isfinite(x) and x > 0.0 else 0.0

        se = math.sqrt(comp(a_se) + comp(b_se)) or 1.0
        return abs(a - b) / se

    smc_ok = math.isfinite(log_z_smc)
    flags["smc"] = (
        {"status": "primary",
         "reason": "prior-annealed population matches the exploding-"
                   "prior-field regime; repeat-spread SE"}
        if smc_ok else {"status": "failed", "reason": "non-finite log Z"})

    if not math.isfinite(log_z_gss) or gss_nonfinite:
        flags["gss"] = {"status": "failed" if not math.isfinite(log_z_gss)
                        else "budget_sensitive",
                        "reason": f"{int(gss_nonfinite)} non-finite "
                                  "bridge draws (floored to zero weight)"}
    elif smc_ok and sigma_gap(log_z_gss, gss_se, log_z_smc,
                              smc_se) > disagree_sigma:
        flags["gss"] = {"status": "disagrees",
                        "reason": "beyond %g sigma from SMC"
                                  % disagree_sigma}
    else:
        flags["gss"] = {"status": "primary",
                        "reason": "posterior-fitted normalized reference "
                                  "keeps every rung in the data-fit "
                                  "regime (Fan et al. 2011)"}

    if not math.isfinite(log_z_ss):
        flags["ss"] = {"status": "failed",
                       "reason": "non-finite (all draws floored or "
                                 "ladder degenerate)"}
    elif ladder_nonfinite:
        flags["ss"] = {"status": "budget_sensitive",
                       "reason": f"{int(ladder_nonfinite)} non-finite "
                                 "hot-rung draws floored to zero weight"}
    elif smc_ok and sigma_gap(log_z_ss, ss_se, log_z_smc,
                              smc_se) > disagree_sigma:
        flags["ss"] = {"status": "budget_sensitive",
                       "reason": "prior-bridged hot-rung equilibration "
                                 "drift detectable (beyond %g sigma "
                                 "from SMC; measured +292 nats with "
                                 "budget on GP-VDP)" % disagree_sigma}
    else:
        flags["ss"] = {"status": "ok",
                       "reason": "agrees with the primary estimators"}

    flags["ti"] = {"status": "diagnostic_only",
                   "reason": "arithmetic rung means carry large hot-rung "
                             "equilibration bias at practical budgets on "
                             "ODE posteriors (measured; NaN when any "
                             "draw was floored)"}

    if not math.isfinite(log_z_laplace) or not laplace_hessian_pd:
        flags["laplace"] = {"status": "failed",
                            "reason": "non-PD Hessian or non-finite"}
    elif math.isfinite(waic_elpd) and log_z_laplace > waic_elpd:
        flags["laplace"] = {"status": "inconsistent",
                            "reason": "log Z above the WAIC elpd bound "
                                      "(log Z <= elpd must hold; Laplace "
                                      "overestimates by hundreds of nats "
                                      "on thin/curved ODE posteriors)"}
    else:
        flags["laplace"] = {"status": "diagnostic_only",
                            "reason": "Gaussian curvature approximation"}

    rank_by = [k for k in ("smc", "gss") if flags[k]["status"] == "primary"]
    if not rank_by:  # degenerate runs: fall back to anything finite
        rank_by = [k for k in ("smc", "gss", "ss")
                   if flags[k]["status"] not in ("failed",)]
    return {"estimators": flags, "rank_by": rank_by}
