"""Chain diagnostics: ESS, split R-hat, acceptance rates.

The reference computes none of these (SURVEY.md §5.5) despite the
effective-samples/sec north-star metric; standard definitions are used
(Gelman et al., BDA3 / Stan reference manual), FFT-based autocovariance
with Geyer's initial-monotone-sequence truncation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def autocovariance(x: jax.Array) -> jax.Array:
    """Biased autocovariance of a 1-D chain via FFT, normalized by n."""
    n = x.shape[0]
    xc = x - jnp.mean(x)
    # zero-pad to at least 2n for linear (non-circular) correlation
    m = int(2 ** jnp.ceil(jnp.log2(2 * n)))
    f = jnp.fft.rfft(xc, m)
    acov = jnp.fft.irfft(f * jnp.conj(f), m)[:n].real / n
    return acov


def ess(chains: jax.Array) -> jax.Array:
    """Effective sample size of (num_chains, num_samples) scalar draws.

    rho_t estimated from the multi-chain autocovariance (Stan's formula
    with between/within variances); truncated at the first negative sum of
    adjacent autocorrelation pairs (Geyer initial positive sequence).
    """
    chains = jnp.atleast_2d(chains)
    m, n = chains.shape
    acovs = jax.vmap(autocovariance)(chains)            # (m, n)
    mean_acov = jnp.mean(acovs, axis=0)
    w = mean_acov[0] * n / (n - 1.0)                    # within-chain var
    var_plus = w * (n - 1.0) / n
    if m > 1:
        var_plus = var_plus + jnp.var(jnp.mean(chains, axis=1), ddof=1)

    rho = 1.0 - (w - mean_acov) / var_plus              # (n,)

    # Geyer: sum pairs rho[2k+1] + rho[2k+2]; truncate at first negative.
    pair_len = (n - 1) // 2
    pairs = rho[1 : 1 + 2 * pair_len].reshape(pair_len, 2).sum(axis=1)
    good = jnp.cumprod(pairs > 0.0)
    # enforce monotone decrease (initial monotone sequence)
    pairs = jnp.minimum(pairs, jnp.minimum.accumulate(jnp.where(good, pairs, jnp.inf)))
    tau = 1.0 + 2.0 * jnp.sum(jnp.where(good, pairs, 0.0))
    return m * n / jnp.maximum(tau, 1e-12)


def split_rhat(chains: jax.Array) -> jax.Array:
    """Split-R-hat of (num_chains, num_samples) scalar draws."""
    chains = jnp.atleast_2d(chains)
    m, n = chains.shape
    half = n // 2
    split = jnp.concatenate([chains[:, :half], chains[:, half : 2 * half]], axis=0)
    sm, sn = split.shape
    chain_means = jnp.mean(split, axis=1)
    chain_vars = jnp.var(split, axis=1, ddof=1)
    B = sn * jnp.var(chain_means, ddof=1)
    W = jnp.mean(chain_vars)
    var_plus = (sn - 1.0) / sn * W + B / sn
    return jnp.sqrt(var_plus / W)


def acceptance_rate(infos) -> jax.Array:
    """Mean acceptance over the steps axis of an info pytree (last axis of
    stacked `accepted` flags)."""
    acc = infos["accepted"]
    return jnp.mean(acc.astype(jnp.float32), axis=-1)


def ess_per_param(positions: jax.Array) -> jax.Array:
    """ESS per flattened parameter: positions (num_chains, num_samples, P)
    -> (P,)."""
    return jax.vmap(lambda p: ess(p), in_axes=2)(positions)


def kernel_stein_discrepancy(samples: jax.Array, score_fn,
                             c: float = 1.0, beta: float = -0.5,
                             u_statistic: bool = False) -> jax.Array:
    """Kernel Stein discrepancy of (n, d) samples against an (unnormalized)
    target given by its score `score_fn(x) -> grad log p(x)` for (n, d) x.

    Uses the IMQ base kernel k(x,y) = (c^2 + ||x-y||^2)^beta with
    beta in (-1, 0), whose KSD detects non-convergence (Gorham & Mackey
    2017, "Measuring sample quality with kernels", Thm 8 — unlike RBF in
    d >= 3).  The Stein kernel is

      k_p(x,y) = k s(x)'s(y) + s(x)'grad_y k + s(y)'grad_x k
                 + tr(grad_x grad_y k),

    closed-form for IMQ.  Returns sqrt of the V-statistic mean by default
    (a biased-but-nonnegative estimate, zero iff sample == target in the
    infinite limit); `u_statistic=True` drops the diagonal and returns the
    SIGNED mean (unbiased for KSD^2; can be negative at small n).

    Complements ESS/R-hat: those measure mixing of the chain against
    itself, KSD measures distance to the *intended* target — it catches
    step-size bias in uncorrected SGLD-family samplers that ESS cannot.
    Cost/memory O(n^2 d): subsample long chains before calling.
    """
    if not (-1.0 < beta < 0.0):
        raise ValueError("beta must lie in (-1, 0) for a detecting IMQ KSD")
    x = jnp.atleast_2d(samples)
    n, d = x.shape
    s = score_fn(x)                                     # (n, d)
    if s.shape != x.shape:
        raise ValueError("score_fn must map (n, d) -> (n, d)")

    r = x[:, None, :] - x[None, :, :]                   # (n, n, d)
    r2 = jnp.sum(r * r, axis=-1)                        # (n, n)
    q = c * c + r2
    qb = q ** beta
    qb1 = q ** (beta - 1.0)

    ss = s @ s.T                                        # s(x)'s(y)
    # s(x)'grad_y k + s(y)'grad_x k = 2*beta*q^(beta-1) * r'(s(y) - s(x))
    sx_r = jnp.einsum("id,ijd->ij", s, r)               # s(x_i)'(x_i - x_j)
    sy_r = jnp.einsum("jd,ijd->ij", s, r)               # s(x_j)'(x_i - x_j)
    cross = 2.0 * beta * qb1 * (sy_r - sx_r)
    trace = -4.0 * beta * (beta - 1.0) * q ** (beta - 2.0) * r2 \
        - 2.0 * beta * d * qb1
    kp = qb * ss + cross + trace                        # (n, n)

    if u_statistic:
        off = jnp.sum(kp) - jnp.sum(jnp.diagonal(kp))
        return off / (n * (n - 1.0))
    return jnp.sqrt(jnp.maximum(jnp.mean(kp), 0.0))
