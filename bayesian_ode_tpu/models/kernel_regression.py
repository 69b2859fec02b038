"""Nonparametric GP (kernel-regression) ODE vector field on an inducing grid.

Reference: scripts/vanderpol/gp.py:41-71 (kernel + model), 98-116
(gradient-matching init, whitening), 342-353 (posterior).  The vector field
is

    f(X) = K(X, Z) Kzz^{-1} L U = K(X, Z) L^{-T} U

with a whitened weight matrix U (M^2, D), learnable per-dimension log noise
`logsn`, and a fixed M x M inducing grid Z spanning the data range.  All
static quantities (Z, L^{-T}) are precomputed once; the RHS is two small
matmuls — under vmap over chains this becomes a batched GEMM feeding the
MXU (see ops/ for the fused Pallas variant).
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


def rbf(X1, X2, sf, ell, precision=None):
    """K = sf^2 exp(-||x/ell - x'/ell||^2 / 2) (gp.py:41-54).

    `precision` matters on TPU: matmuls default to bfloat16 passes, whose
    rounding noise lands in adaptive solvers' error estimates and collapses
    the step size (measured 45x NFE inflation at rtol=1e-7).  Pass
    jax.lax.Precision.HIGHEST (or set jax.default_matmul_precision
    ("float32")) for adaptive solves; the default is fine for fixed-grid
    rk4 + SG-MCMC throughput runs, which tolerate gradient noise.
    """
    X1 = X1 / ell
    X2 = X2 / ell
    cross = jnp.matmul(X1, X2.T, precision=precision)
    d2 = (
        jnp.sum(X1**2, -1)[..., :, None]
        + jnp.sum(X2**2, -1)[..., None, :]
        - 2.0 * cross
    )
    return sf**2 * jnp.exp(-d2 / 2.0)


class GPVectorFieldStatic(NamedTuple):
    """Fixed (non-learnable) pieces of the model."""
    Z: jax.Array          # (M^2, 2) inducing grid
    KzzinvL: jax.Array    # (M^2, M^2) = Kzz^{-1} L = L^{-T}
    Kzzinv: jax.Array     # (M^2, M^2), used by the prior term
    sf: float
    ell: float


def make_inducing_grid(Y, M: int) -> jax.Array:
    """M x M grid covering the observed data range (gp.py:98-103).
    Y: (N, T, 2) observations (concrete numpy-able array)."""
    import numpy as np

    Yn = np.asarray(Y)
    xv = np.linspace(Yn[..., 0].min(), Yn[..., 0].max(), M)
    yv = np.linspace(Yn[..., 1].min(), Yn[..., 1].max(), M)
    xg, yg = np.meshgrid(xv, yv)
    return jnp.asarray(np.stack([xg.T.flatten(), yg.T.flatten()], axis=1))


def make_static(Z, sf: float, ell: float) -> GPVectorFieldStatic:
    Kzz = rbf(Z, Z, sf, ell)
    L = jnp.linalg.cholesky(Kzz)
    Kzzinv = jnp.linalg.inv(Kzz)
    return GPVectorFieldStatic(Z=Z, KzzinvL=Kzzinv @ L, Kzzinv=Kzzinv,
                               sf=sf, ell=ell)


def gradient_matching_init(Y, t, static: GPVectorFieldStatic) -> jax.Array:
    """Whitened U0 from finite-difference slope regression (gp.py:107-114):
    regress (Y_{k+1}-Y_k)/dt onto the grid, then whiten with L^{-1}."""
    Y = jnp.asarray(Y)
    dt = t[1] - t[0]
    F = ((Y[:, 1:, :] - Y[:, :-1, :]) / dt).reshape(-1, Y.shape[-1])
    Zdata = Y[:, :-1, :].reshape(-1, Y.shape[-1])
    Kxz = rbf(static.Z, Zdata, static.sf, static.ell)
    Kdd = rbf(Zdata, Zdata, static.sf, static.ell)
    Kddinv = jnp.linalg.inv(Kdd + 0.2 * jnp.eye(Kdd.shape[0], dtype=Kdd.dtype))
    U0 = Kxz @ (Kddinv @ F)
    L = jnp.linalg.cholesky(rbf(static.Z, static.Z, static.sf, static.ell))
    Linv = jnp.linalg.inv(L)
    return Linv @ U0


def init_params(Y, t, static: GPVectorFieldStatic, noise: float):
    """{'U': whitened weights, 'logsn': per-dim log noise} (gp.py:58-60)."""
    D = jnp.asarray(Y).shape[-1]
    return {
        "U": gradient_matching_init(Y, t, static),
        "logsn": jnp.full((D,), jnp.log(noise)),
    }


def vector_field(params, static: GPVectorFieldStatic, t, X):
    """f(X) = K(X, Z) (Kzz^{-1} L) U for X (..., 2) (gp.py:69-71)."""
    T = rbf(X, static.Z, static.sf, static.ell) @ static.KzzinvL
    return T @ params["U"]


def precompute_weights(params, static: GPVectorFieldStatic) -> jax.Array:
    """A = (Kzz^{-1} L) U, constant across a solve — hoisting it halves the
    per-RHS matmul work (the reference recomputes K(X,Z) Kzz^{-1}L U every
    evaluation, gp.py:69-71)."""
    return static.KzzinvL @ params["U"]


def vector_field_fast(A, static: GPVectorFieldStatic, t, X, precision=None):
    """f(X) = K(X, Z) A with precomputed A (M^2, D); see rbf() on the
    `precision` choice."""
    return jnp.matmul(
        rbf(X, static.Z, static.sf, static.ell, precision), A,
        precision=precision,
    )


class GPLogDensity(NamedTuple):
    """Normalized log-density decomposition of the GP-ODE model — the
    pieces Bayesian model comparison needs (evidence ladders sample
    beta*log_lik + log_prior; WAIC/PSIS-LOO need pointwise log-liks).
    Every callable takes a single {'U', 'logsn'} position; vmap for the
    batch-potential contract."""
    log_lik: Callable        # params -> () normalized Gaussian loglik
    log_prior: Callable      # params -> () normalized log prior
    pointwise_log_lik: Callable  # params -> (N*T,) per-(traj, time) loglik
    potential: Callable      # params -> -(log_lik + log_prior)
    sample_prior: Callable   # (key, n) -> {'U': (n,P,D), 'logsn': (n,D)}


def make_log_density_parts(static: GPVectorFieldStatic, x0, t, Y,
                           odeint_fn: Callable, *, precision=None,
                           logsn_mu: float = None,
                           logsn_sd: float = 1.0,
                           noise: float = 0.1) -> GPLogDensity:
    """NORMALIZED log-likelihood / log-prior split of the GP-ODE posterior
    (model of make_potential, gp.py:342-353) for evidence estimation
    (samplers.log_evidence / samplers.smc / samplers.laplace_approximation)
    and predictive comparison (samplers.waic / samplers.psis_loo).

      log_lik(params) = sum_{n,t,d} log N(Y_ntd | xode_ntd, exp(logsn_d))
      log_prior       = sum_d log N(U[:, d] | 0, Kzz)
                      + sum_d log N(logsn_d | logsn_mu, logsn_sd^2)

    Deliberate deviations from the reference, both REQUIRED for a
    well-defined evidence:
      - the reference's potential has NO logsn prior (implicit improper
        flat, gp.py:342-353); an improper prior makes log Z infinite and
        the beta=0 rung unsample-able, so a proper Gaussian prior
        N(logsn_mu, logsn_sd^2) is added (logsn_mu defaults to
        log(noise), the driver's data-noise initialization scale);
      - all 2*pi / log-det normalizers are kept, so log Z values are
        absolute and comparable ACROSS inducing-grid sizes M (the whole
        point of the M-selection workflow, reference
        gen_configs.py:65-70).

    The U prior matches the potential's quirk (Kzz^{-1} applied to the
    WHITENED U, gp.py:350 parity): U[:, d] ~ N(0, Kzz), whose normalizer
    uses log det Kzz.  `pointwise_log_lik` groups by (trajectory, time)
    — N*T points, each the D-dim observation vector's loglik — the
    deletion unit for PSIS-LOO.
    """
    Y = jnp.asarray(Y)
    D = Y.shape[-1]
    NT = Y.shape[0] * Y.shape[1]
    P = static.Z.shape[0]
    mu0 = jnp.log(noise) if logsn_mu is None else jnp.asarray(logsn_mu)
    sd0 = jnp.asarray(logsn_sd)
    Kzz = rbf(static.Z, static.Z, static.sf, static.ell)
    L = jnp.linalg.cholesky(Kzz)
    logdet_Kzz = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    log2pi = jnp.log(2.0 * jnp.pi)

    def _solve(params):
        A = precompute_weights(params, static)
        xode = odeint_fn(
            lambda tt, X: vector_field_fast(A, static, tt, X, precision),
            x0, t)
        return jnp.moveaxis(xode, 0, 1)            # (N, T, D)

    def pointwise_log_lik(params):
        xode = _solve(params)
        sn2 = jnp.exp(params["logsn"]) ** 2        # (D,)
        pt = (-0.5 * (Y - xode) ** 2 / sn2
              - params["logsn"] - 0.5 * log2pi)    # (N, T, D)
        return jnp.sum(pt, axis=-1).reshape(NT)

    def log_lik(params):
        return jnp.sum(pointwise_log_lik(params))

    def log_prior(params):
        U = params["U"]
        quad = jnp.trace(U.T @ (static.Kzzinv @ U))
        lp_u = -0.5 * quad - 0.5 * D * logdet_Kzz - 0.5 * P * D * log2pi
        r = (params["logsn"] - mu0) / sd0
        lp_sn = (-0.5 * jnp.sum(r * r)
                 - D * jnp.log(sd0) - 0.5 * D * log2pi)
        return lp_u + lp_sn

    def potential(params):
        return -(log_lik(params) + log_prior(params))

    def sample_prior(key, n):
        k_u, k_sn = jax.random.split(key)
        eps = jax.random.normal(k_u, (n, P, D), L.dtype)
        U = jnp.einsum("pq,nqd->npd", L, eps)      # cols ~ N(0, Kzz)
        logsn = mu0 + sd0 * jax.random.normal(k_sn, (n, D), L.dtype)
        return {"U": U, "logsn": logsn}

    return GPLogDensity(log_lik=log_lik, log_prior=log_prior,
                        pointwise_log_lik=pointwise_log_lik,
                        potential=potential, sample_prior=sample_prior)


def make_potential(static: GPVectorFieldStatic, x0, t, Y,
                   odeint_fn: Callable, add_prior: bool = True,
                   precision=None) -> Callable:
    """Negative log posterior of the GP-ODE model (gp.py:342-353):

        U(params) = sum (Y - x_ode)^2 / (2 exp(logsn)^2)
                  + numel(Y) * sum(logsn) / D
                  + tr(U^T Kzz^{-1} U) / 2

    `odeint_fn(func, x0, t)` chooses solver and gradient engine (the
    reference uses rk4 + adjoint, gp.py:346).  With add_prior=False returns
    the plain sum of squared errors (monitoring variant).

    `precision` sets the RHS matmul precision (see rbf()): pass
    jax.lax.Precision.HIGHEST whenever odeint_fn is an ADAPTIVE solver —
    bf16 matmul error inflates adaptive NFE ~45x on TPU; fixed-grid
    solvers keep the fast default.

    Note: the trace prior applies Kzz^{-1} to the *whitened* U, replicating
    the reference (gp.py:350) for behavioral parity.
    """
    Y = jnp.asarray(Y)
    D = Y.shape[-1]
    numel = Y.size

    def potential(params):
        A = precompute_weights(params, static)
        xode = odeint_fn(
            lambda tt, X: vector_field_fast(A, static, tt, X, precision),
            x0, t
        )
        xode = jnp.moveaxis(xode, 0, 1)  # (T, N, 2) -> (N, T, 2)
        if not add_prior:
            return jnp.sum((Y - xode) ** 2)
        sn2 = jnp.exp(params["logsn"]) ** 2
        loss = jnp.sum((Y - xode) ** 2 / (2.0 * sn2))
        loss += numel * jnp.sum(params["logsn"]) / D
        loss += jnp.trace(params["U"].T @ (static.Kzzinv @ params["U"])) / 2.0
        return loss

    return potential
