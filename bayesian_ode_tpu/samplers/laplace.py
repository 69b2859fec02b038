"""Laplace approximation: Gaussian posterior + evidence from a MAP fit.

Beyond the reference suite: the reference computes MAP points with
L-BFGS (optims/LBFGS.py, driven by scripts/vanderpol/gp.py run_optim) but
never uses the curvature at the mode.  The Laplace approximation is the
natural next step — expand U = -log posterior to second order at the
mode theta*:

    q(theta) = N(theta*, H^{-1}),     H = grad^2 U(theta*)
    log Z    ~= -U(theta*) + D/2 log(2 pi) - 1/2 log det H

giving a posterior approximation AND a third evidence estimator to
cross-check `samplers.evidence.log_evidence`'s TI / stepping-stone
numbers (exact whenever U is quadratic, e.g. the linear-regression toy).

The MAP fit reuses `optim.lbfgs_minimize` (one compiled scan); the dense
Hessian is two reverse sweeps on the flattened parameter vector (see the
inline note) — fine at the parameter counts these posteriors have
(tens; MLP fields ~100s).  For larger D, fit ADVI instead (samplers/vi.py).
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..optim.lbfgs import lbfgs_minimize
from ..utils.pytree import PyTree, ravel_pytree

__all__ = ["LaplaceResult", "laplace_approximation", "sample_laplace"]


class LaplaceResult(NamedTuple):
    mode: PyTree             # MAP point, original pytree structure
    mu: jax.Array            # (D,) flat MAP point
    prec_chol: jax.Array     # (D, D) lower L with H = L L^T (H = Hessian)
    log_evidence: jax.Array  # Laplace log Z (up to U's missing normalizer)
    potential_at_mode: jax.Array
    value_trace: jax.Array   # L-BFGS per-iteration potential values
    # False when the (jittered) Hessian at the terminus was not positive
    # definite (unconverged fit, saddle, flat direction > relative jitter):
    # prec_chol/log_evidence and every sample_laplace draw are then NaN.
    # Remedies: raise `jitter`, raise `max_iters`, or better init.
    hessian_pd: jax.Array    # () bool


def laplace_approximation(potential_fn: Callable[[PyTree], jax.Array],
                          init_position: PyTree,
                          max_iters: int = 200,
                          *,
                          jitter: float = 1e-8,
                          **lbfgs_kwargs) -> LaplaceResult:
    """Fit the Laplace approximation to exp(-U) starting from
    `init_position`.  `jitter` scales an identity ridge added to the
    Hessian (relative to its mean diagonal) before the Cholesky — guards
    flat directions; it perturbs log Z by O(jitter)."""
    mode, value, trace, _ = lbfgs_minimize(potential_fn, init_position,
                                           max_iters=max_iters,
                                           **lbfgs_kwargs)
    mu, unravel = ravel_pytree(mode)
    d = mu.shape[0]
    # Reverse-over-reverse Hessian: `jax.hessian` (jacfwd of jacrev) would
    # push a JVP through the potential, which fails on custom_vjp solves
    # (odeint_adjoint); two reverse sweeps stay within what every
    # potential here supports.
    hess = jax.jacrev(jax.grad(lambda v: potential_fn(unravel(v))))(mu)
    hess = 0.5 * (hess + hess.T)
    ridge = jitter * jnp.mean(jnp.diagonal(hess)) * jnp.eye(d, dtype=mu.dtype)
    chol = jnp.linalg.cholesky(hess + ridge)
    # cholesky returns NaNs (not an exception) on a non-PD input under
    # jit — surface that as a flag instead of silently poisoning
    # log_evidence and every downstream draw (ADVICE r2).
    hessian_pd = jnp.all(jnp.isfinite(chol))
    log_det = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
    log_z = -value + 0.5 * d * jnp.log(2.0 * jnp.pi) - 0.5 * log_det
    return LaplaceResult(mode=mode, mu=mu, prec_chol=chol,
                         log_evidence=log_z, potential_at_mode=value,
                         value_trace=trace, hessian_pd=hessian_pd)


def sample_laplace(result: LaplaceResult, key: jax.Array, num_samples: int
                   ) -> PyTree:
    """Draw from N(theta*, H^{-1}); chain-major pytree out.  With
    H = L L^T, samples are theta* + L^{-T} eps."""
    _, unravel = ravel_pytree(result.mode)
    d = result.mu.shape[0]
    eps = jax.random.normal(key, (d, num_samples), result.mu.dtype)
    zs = result.mu[:, None] + jax.scipy.linalg.solve_triangular(
        result.prec_chol.T, eps, lower=False)
    return jax.vmap(unravel)(zs.T)
