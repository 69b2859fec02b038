"""Predictive model comparison: WAIC and PSIS-LOO from posterior draws.

Beyond the reference suite (which compares models by eyeballing per-run
loss pickles, reference scripts/vanderpol/gp.py:383-387): these are the
standard *predictive* complements to the marginal-likelihood estimators
in evidence.py / smc.py — evidence answers "which prior+model generated
the data", expected-log-predictive-density (elpd) answers "which model
predicts new data best", and unlike evidence it needs only posterior
draws of the POINTWISE log likelihood, no extra sampling.

  - `waic`  (Watanabe 2010): elpd ~= lppd - p_waic with
    p_waic = sum_n Var_s[log p(y_n | theta_s)].
  - `psis_loo` (Vehtari, Gelman & Gabry 2017): leave-one-out elpd by
    importance sampling with Pareto-smoothed weights — the raw LOO
    ratios 1/p(y_n|theta_s) have heavy right tails; the largest
    M = min(0.2 S, 3 sqrt(S)) weights are replaced by expected order
    statistics of a generalized Pareto fit (Zhang & Stephens 2009
    profile posterior-mean estimator, vectorized over data points).
    The per-point shape khat is the reliability diagnostic: khat > 0.7
    flags draws that cannot support the n-th deletion (same threshold
    as arviz/loo).
  - `compare`: paired elpd difference with its standard error.

Everything is pure jnp on an (S, N) matrix (draws x data points) — S
and N are static, the GPD fit is a fixed-size grid posterior, so the
whole diagnostic jits and vmaps over model batches if needed.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ElpdResult", "CompareResult", "waic", "psis_loo", "compare",
           "gpd_fit"]


class ElpdResult(NamedTuple):
    elpd: jax.Array          # expected log pointwise predictive density
    se: jax.Array            # standard error of elpd (sqrt(N * var_n))
    p_eff: jax.Array         # effective number of parameters
    pointwise: jax.Array     # (N,) per-point elpd contributions
    pareto_k: jax.Array      # (N,) PSIS khat (NaN for waic)


class CompareResult(NamedTuple):
    elpd_diff: jax.Array     # elpd_a - elpd_b
    se_diff: jax.Array       # paired SE of the difference
    better: jax.Array        # elpd_diff > 0


def _canon(log_lik: jax.Array) -> jax.Array:
    ll = jnp.asarray(log_lik)
    if ll.ndim == 3:          # (S, C, N) chains folded into draws
        ll = ll.reshape(-1, ll.shape[-1])
    if ll.ndim != 2:
        raise ValueError("log_lik must be (S, N) or (S, C, N)")
    return ll


def _se(pointwise: jax.Array) -> jax.Array:
    n = pointwise.shape[0]
    return jnp.sqrt(n * jnp.var(pointwise))


def waic(log_lik: jax.Array) -> ElpdResult:
    """WAIC from an (S, N) [or (S, C, N)] pointwise log-likelihood matrix."""
    ll = _canon(log_lik)
    s = ll.shape[0]
    lppd = jax.scipy.special.logsumexp(ll, axis=0) - jnp.log(float(s))
    p = jnp.var(ll, axis=0, ddof=1)
    pointwise = lppd - p
    return ElpdResult(jnp.sum(pointwise), _se(pointwise), jnp.sum(p),
                      pointwise, jnp.full(ll.shape[1], jnp.nan, ll.dtype))


def gpd_fit(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Generalized-Pareto (k, sigma) for exceedances `x` (ASCENDING sort,
    all > 0) by the Zhang & Stephens (2009) quadrature posterior mean —
    no optimizer, fixed grid, jit/vmap-safe.  Sign convention: heavy
    tails have k > 0 (Vehtari et al. 2017 eq. 12)."""
    x = jnp.asarray(x)
    n = x.shape[0]
    m = 30 + int(np.sqrt(n))
    j = jnp.arange(1, m + 1, dtype=x.dtype)
    quart = x[int(n / 4 + 0.5) - 1]
    b = 1.0 / x[-1] + (1.0 - jnp.sqrt(m / (j - 0.5))) / (3.0 * quart)
    k_b = jnp.mean(jnp.log1p(-b[:, None] * x[None, :]), axis=1)     # (m,)
    prof = n * (jnp.log(-b / k_b) - k_b - 1.0)
    w = jax.nn.softmax(prof)
    b_post = jnp.sum(b * w)
    # with theta = b: xi_hat = mean log1p(-b x); b < 0 <=> heavy tail
    # <=> k > 0 directly in this parameterization
    k_post = jnp.mean(jnp.log1p(-b_post * x))
    sigma = -k_post / b_post
    # weakly-informative prior nudge toward k=0.5 (arviz/loo regularize
    # identically; stabilizes small tails)
    k_post = (n * k_post + 5.0) / (n + 10.0)
    return k_post, sigma


def _psis_one(ll_n: jax.Array, tail: int) -> tuple[jax.Array, jax.Array]:
    """Pareto-smooth the LOO log-weights for ONE data point.

    ll_n: (S,) log p(y_n|theta_s).  Raw log-weights are -ll_n; the top
    `tail` order statistics are replaced by GPD quantiles fitted to the
    exceedances over the (S-tail)-th weight, then capped at the raw max
    (Vehtari et al. 2017 §3.2).  Returns (normalized log-weights, khat).
    """
    s = ll_n.shape[0]
    lw = -ll_n
    lw = lw - jnp.max(lw)                       # overflow guard (exp below)
    order = jnp.argsort(lw)
    lw_sorted = lw[order]
    cut = lw_sorted[s - tail - 1]               # tail threshold (log scale)
    exceed = jnp.exp(lw_sorted[s - tail:]) - jnp.exp(cut)
    k, sigma = gpd_fit(exceed)
    # expected order statistics: inverse GPD cdf at p = (i-1/2)/tail
    p = (jnp.arange(1, tail + 1, dtype=lw.dtype) - 0.5) / tail
    safe_k = jnp.where(jnp.abs(k) < 1e-6, 1.0, k)
    q = jnp.where(jnp.abs(k) < 1e-6,
                  -jnp.log1p(-p) * sigma,
                  sigma / safe_k * (jnp.power(1.0 - p, -k) - 1.0))
    smoothed = jnp.log(jnp.exp(cut) + q)
    smoothed = jnp.minimum(smoothed, lw_sorted[-1])   # cap at raw max
    lw_new = lw_sorted.at[s - tail:].set(smoothed)
    # undo the sort
    lw_out = jnp.zeros_like(lw_new).at[order].set(lw_new)
    lw_out = lw_out - jax.scipy.special.logsumexp(lw_out)
    return lw_out, k


def psis_loo(log_lik: jax.Array) -> ElpdResult:
    """PSIS-LOO elpd from an (S, N) [or (S, C, N)] pointwise
    log-likelihood matrix.  `pareto_k[n] > 0.7` means point n's LOO
    estimate is unreliable (refit without the point, or use waic/K-fold).
    """
    ll = _canon(log_lik)
    s = ll.shape[0]
    tail = int(min(0.2 * s, 3.0 * np.sqrt(s)))
    if tail < 5:
        raise ValueError(f"need >= 25 draws for PSIS (tail={tail} < 5)")
    lw, k = jax.vmap(_psis_one, in_axes=(1, None), out_axes=(1, 0))(
        ll, tail)
    pointwise = jax.scipy.special.logsumexp(lw + ll, axis=0)        # (N,)
    lppd = jax.scipy.special.logsumexp(ll, axis=0) - jnp.log(float(s))
    p_eff = jnp.sum(lppd - pointwise)
    return ElpdResult(jnp.sum(pointwise), _se(pointwise), p_eff,
                      pointwise, k)


def compare(a: ElpdResult, b: ElpdResult) -> CompareResult:
    """Paired comparison: elpd_a - elpd_b with the SE of the pointwise
    differences (Vehtari et al. 2017 eq. 24 — paired, NOT the quadrature
    sum of the individual SEs)."""
    if a.pointwise.shape != b.pointwise.shape:
        raise ValueError("models must score the same data points")
    d = a.pointwise - b.pointwise
    return CompareResult(jnp.sum(d), _se(d), jnp.sum(d) > 0)
