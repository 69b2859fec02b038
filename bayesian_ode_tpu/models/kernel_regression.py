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
