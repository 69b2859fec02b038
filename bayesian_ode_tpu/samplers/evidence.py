"""Marginal-likelihood (model evidence) estimation over a power posterior.

Beyond the reference suite: the reference has no model-comparison
machinery at all (its closest instrument is the per-run loss pickle,
reference scripts/vanderpol/gp.py:383-387), yet evidence is the standard
Bayesian answer to "which kernel / which prior / which field class fits
the data" — the question its config grids sweep by hand.  Here the
power-posterior path

    p_beta(x)  propto  p0(x) * exp(beta * loglik(x)),    0 = beta_0 < ... < beta_{K-1} = 1

is sampled with K rungs * C chains as ONE fused batch (rows = K*C through
the standard batch-potential contract — a single fused forward+backward
per step covers every rung), each rung running exact per-rung MALA (fixed
per-rung step size via the diagonal-metric form, so reversibility per
rung is preserved).  Two estimators are computed from the same draws:

  - thermodynamic integration (TI, a.k.a. path sampling; Gelman & Meng
    1998):  log Z = int_0^1 E_beta[loglik] dbeta, trapezoid over the rungs;
  - stepping stone (SS; Xie et al. 2011, Syst. Biol. 60(2)):
    log Z = sum_k log E_{beta_k}[ exp((beta_{k+1}-beta_k) * loglik) ],
    evaluated with a per-rung log-sum-exp (unbiased bridge per rung given
    exact rung samples; dominates TI's quadrature bias on coarse ladders).

`log_prior` must be NORMALIZED if an absolute evidence is wanted; with an
unnormalized prior the result is shifted by its (unknown) log-normalizer,
which still cancels in model comparisons sharing the same prior family.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.pytree import PyTree
from .langevin import mala_batched

__all__ = ["EvidenceResult", "log_evidence", "power_ladder"]


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
                 thin: int = 1) -> EvidenceResult:
    """Estimate log Z = log int p0(x) exp(loglik(x)) dx.

    `log_lik_batch` / `log_prior_batch` follow the fused batch-potential
    contract: leaves with a leading chain axis R -> (R,) values.
    `init_position` carries a leading chain axis C (chains per rung); the
    K*C replica rows are tiled from it and separate during warmup.
    `step_size`: scalar, or a (K,) array of per-rung MALA step sizes
    (hot rungs tolerate larger moves; each rung stays exact because its
    fixed step enters the MH correction via the diagonal metric).
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

    pos_rows = jax.tree.map(
        lambda l: jnp.tile(l, (K,) + (1,) * (l.ndim - 1)), init_position)
    beta_rows = jnp.repeat(betas, C)                              # (K*C,)

    def potential_rows(x_rows):
        ll = log_lik_batch(x_rows)
        lp = log_prior_batch(x_rows)
        return -(beta_rows.astype(ll.dtype) * ll + lp)

    s = jnp.asarray(step_size, jnp.float32)
    if s.ndim == 0:
        s = jnp.full((K,), s)
    if s.shape != (K,):
        raise ValueError("step_size must be scalar or shape (K,)")
    g_rows = jnp.repeat(s, C)
    precond = jax.tree.map(
        lambda l: g_rows.reshape((K * C,) + (1,) * (l.ndim - 1))
        .astype(l.dtype),
        pos_rows)
    # lr=1 with diagonal metric G = s_k reproduces per-rung MALA at step
    # s_k exactly (proposal -lr*G*g - sqrt(2*lr*G)*xi; G-weighted MH).
    kernel = mala_batched(potential_rows, 1.0, precond=precond)

    if num_samples % thin:
        raise ValueError("num_samples must be a multiple of thin")
    n_keep = num_samples // thin

    def warm_body(state, k):
        state, _ = kernel.step(k, state)
        return state, None

    def samp_body(state, k):
        def inner(state, kk):
            state, info = kernel.step(kk, state)
            return state, info
        state, info = jax.lax.scan(inner, state, jax.random.split(k, thin))
        ll = log_lik_batch(state.position)                       # (K*C,)
        acc = jnp.mean(info["accepted"].astype(jnp.float32), axis=0)
        return state, (ll, acc)

    k_warm, k_samp = jax.random.split(key)
    state = kernel.init(pos_rows)
    state, _ = jax.lax.scan(warm_body, state,
                            jax.random.split(k_warm, num_warmup))
    _, (lls, accs) = jax.lax.scan(samp_body, state,
                                  jax.random.split(k_samp, n_keep))

    lls = lls.reshape(n_keep, K, C)                               # (S, K, C)
    accs = jnp.mean(accs.reshape(n_keep, K, C), axis=(0, 2))      # (K,)
    mean_ll = jnp.mean(lls, axis=(0, 2))                          # (K,)

    db = betas[1:] - betas[:-1]                                   # (K-1,)
    log_z_ti = jnp.sum(db * 0.5 * (mean_ll[:-1] + mean_ll[1:]))

    # stepping stone: rung k's draws bridge beta_k -> beta_{k+1}
    bridge = db[None, :, None] * lls[:, :-1, :]                   # (S,K-1,C)
    log_z_ss = jnp.sum(
        jax.scipy.special.logsumexp(bridge, axis=(0, 2))
        - jnp.log(float(n_keep * C)))

    return EvidenceResult(log_z_ti=log_z_ti, log_z_ss=log_z_ss,
                          betas=betas, mean_log_lik=mean_ll,
                          accept_rate=accs, log_lik_draws=lls)
