"""Bayesian inference for SDE models: Euler-Maruyama transition
pseudo-likelihood potentials plugging into the framework's sampler
contract.

This is the SDE counterpart of models/kernel_regression.make_potential
(reference gp.py:342-353): where the ODE model solves a deterministic
trajectory and charges a Gaussian OBSERVATION likelihood, the SDE model
charges the Gaussian TRANSITION density of the Euler-Maruyama
discretization between consecutive observations,

    y_{k+1} | y_k ~ N(y_k + f(t_k, y_k) dt_k,  g(t_k, y_k)^2 dt_k)

(diagonal noise), which is the standard tractable pseudo-likelihood for
discretely-observed diffusions (exact for linear SDEs as dt -> 0; the
npde lineage's NPSDE variant fits drift and diffusion through exactly
this factorization).  Everything is elementwise over pytree leaves and
jit/vmap/grad-transparent, so every sampler and the L-BFGS MAP path
consume these potentials unchanged.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..models.kernel_regression import (
    GPVectorFieldStatic,
    precompute_weights,
    rbf,
    vector_field_fast,
)
from ..utils.pytree import PyTree

__all__ = [
    "em_log_likelihood",
    "make_sde_potential",
    "make_gp_sde_potential",
    "make_gp_sde_potential_batched",
]

_LOG_2PI = 1.8378770664093453


def em_log_likelihood(drift: Callable, diffusion: Callable, ts, Y: PyTree):
    """Sum of Euler-Maruyama transition log-densities along observations.

    ts: (T,) observation times (strictly increasing); Y: pytree whose
    leaves carry a leading time axis (T, ...) — extra axes (replicate
    trajectories, state dims) are summed over.  Diagonal noise: the
    diffusion returns a pytree shaped like one observation.
    """
    ts = jnp.asarray(ts)
    dts = ts[1:] - ts[:-1]                       # (T-1,)

    Y0 = jax.tree.map(lambda y: y[:-1], Y)
    Y1 = jax.tree.map(lambda y: y[1:], Y)

    def trans(t, dt, y0, y1):
        f = drift(t, y0)
        g = diffusion(t, y0)

        def one(y0_, y1_, f_, g_):
            dt_ = jnp.asarray(dt, y0_.dtype)
            var = g_ * g_ * dt_
            resid = y1_ - y0_ - f_ * dt_
            return -0.5 * jnp.sum(
                resid * resid / var + jnp.log(var) + _LOG_2PI)

        lls = jax.tree.map(one, y0, y1, f, g)
        return sum(jax.tree.leaves(lls))

    lls = jax.vmap(trans)(ts[:-1], dts, Y0, Y1)
    return jnp.sum(lls)


def make_sde_potential(drift_of_params: Callable,
                       diffusion_of_params: Callable, ts, Y: PyTree,
                       log_prior: Optional[Callable] = None) -> Callable:
    """potential(params) = -em_log_likelihood - log_prior(params): the
    standard sampler-contract closure (samplers/base.py) for Bayesian
    drift/diffusion inference.

    drift_of_params(params)/diffusion_of_params(params) return the
    (t, y) -> pytree field closures.
    """
    ts = jnp.asarray(ts)

    def potential(params):
        ll = em_log_likelihood(drift_of_params(params),
                               diffusion_of_params(params), ts, Y)
        lp = 0.0 if log_prior is None else log_prior(params)
        return -(ll + lp)

    return potential


def make_gp_sde_potential(static: GPVectorFieldStatic, ts, Y,
                          add_prior: bool = True,
                          precision=None) -> Callable:
    """NPSDE: nonparametric GP drift on the inducing grid + learnable
    per-dimension constant diffusion.

    The drift is the SAME whitened kernel-regression field as the ODE
    model (models/kernel_regression.vector_field_fast; reference
    gp.py:41-71) — params {"U": (M^2, D), "logsd": (D,)} — with diffusion
    exp(logsd) per state dimension, the npde NPSDE parameterization
    (reference notebooks/npde_tensorflow.ipynb) under the EM transition
    likelihood.  Y: (R, T, D) replicate trajectories observed at ts.

    The prior matches the ODE posterior's: tr(U^T Kzz^{-1} U)/2 on the
    whitened weights (gp.py:350).
    """
    Y = jnp.asarray(Y)
    ts = jnp.asarray(ts)
    # em_log_likelihood wants the time axis leading: (R, T, D) -> (T, R, D)
    Yt = jnp.moveaxis(Y, 1, 0)

    def potential(params):
        A = precompute_weights({"U": params["U"]}, static)
        sd = jnp.exp(params["logsd"])              # (D,)

        def drift(t, y):
            return vector_field_fast(A, static, t, y, precision)

        def diffusion(t, y):
            return jnp.broadcast_to(sd.astype(y.dtype), y.shape)

        ll = em_log_likelihood(drift, diffusion, ts, Yt)
        pot = -ll
        if add_prior:
            pot += jnp.trace(params["U"].T @ (static.Kzzinv @ params["U"])) / 2.0
        return pot

    return potential


def make_gp_sde_potential_batched(static: GPVectorFieldStatic, ts, Y,
                                  add_prior: bool = True,
                                  precision=None) -> Callable:
    """`make_gp_sde_potential` for an entire chain batch in one call — the
    fused batch-potential contract (samplers.sgld_batched and friends):
    params leaves carry a leading chain axis, {"U": (C, M^2, D),
    "logsd": (C, D)}, and the return is the (C,) potential vector.

    The TPU formulation: the EM transition likelihood needs the drift only
    AT THE DATA POINTS, and the kernel matrix K(X, Z) is shared by every
    chain (the data is fixed), so the whole batch's drifts collapse into

        F = K(X, Z) @ (Kzz^{-1} L) @ U_c   for all c at once,

    one (N, M^2) x (M^2, C*D) matmul (N = R*(T-1) transitions) — pure MXU
    work with no per-chain loop, no ODE solve, and no Pallas needed: XLA
    fuses the residual/variance elementwise tail into the matmul epilogue.
    Unlike the ODE potentials there is no adaptive controller downstream,
    so the default (bf16-pass) matmul precision is safe for SG-MCMC; pass
    `precision=jax.lax.Precision.HIGHEST` for exact-MH samplers if desired.
    """
    Y = jnp.asarray(Y)                              # (R, T, D)
    ts = jnp.asarray(ts)
    R, T, D = Y.shape
    X0 = Y[:, :-1, :].reshape(-1, D)                # (N, D), N = R*(T-1)
    X1 = Y[:, 1:, :].reshape(-1, D)
    dts = jnp.broadcast_to(ts[1:] - ts[:-1], (R, T - 1)).reshape(-1)  # (N,)
    Kxz = rbf(X0, static.Z, static.sf, static.ell, precision)  # (N, M^2)
    dY = X1 - X0                                    # (N, D)
    N = X0.shape[0]

    def potential(params):
        U = params["U"]                             # (C, M^2, D)
        A = jnp.einsum("ij,cjd->cid", static.KzzinvL, U,
                       precision=precision)
        F = jnp.einsum("ni,cid->cnd", Kxz, A, precision=precision)
        var = (jnp.exp(2.0 * params["logsd"])[:, None, :]
               * dts[None, :, None])                # (C, N, D) via broadcast
        resid = dY[None] - F * dts[None, :, None]
        ll = -0.5 * jnp.sum(resid * resid / var + jnp.log(var) + _LOG_2PI,
                            axis=(1, 2))            # (C,)
        pot = -ll
        if add_prior:
            pot += 0.5 * jnp.einsum("cid,ij,cjd->c", U, static.Kzzinv, U,
                                    precision=precision)
        return pot

    return potential
