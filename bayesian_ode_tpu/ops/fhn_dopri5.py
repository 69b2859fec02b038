"""FitzHugh-Nagumo parameter inference on the public fused engine.

FOURTH field through `ops.fused_field`, and the first MECHANISTIC one:
instead of an approximating GP/MLP/y^3-net field (the reference's
configurations), the unknowns are the three physical parameters of the
FitzHugh-Nagumo oscillator itself — the canonical Bayesian ODE
parameter-inference benchmark (Ramsay et al. 2007; Girolami & Calderhead
2011 §9 run exactly this posterior with RMHMC).  The reference simulates
FHN as a ground-truth data generator only (scripts/vanderpol/gp.py:31-33)
and approximates its field; direct theta inference is the capability a
Bayesian-ODE user reaches for first, and here it runs fused: C chains,
each with its own (a, b, c), one whole adaptive dopri5 solve + discrete
adjoint per kernel launch.

Classic parameterization (V = membrane voltage, R = recovery):

    V' = c (V - V^3/3 + R)
    R' = -(V - a + b R) / c          theta = (a, b, c), truth (0.2, 0.2, 3)

Per-chain weights ride the lane axis as three (1, C) blocks — the
smallest registration the engine supports (W = 3 rows vs the spiral's
~250), so the backward Mosaic stack is negligible and large tiles are
free.  Gradient semantics are the frozen-step-mesh discrete adjoint at
tolerance; the `store_steps` budget caveat of ops/gp_dopri5_grad.py
applies — probe with `fhn_dopri5_solve_stats`.

Measured (one v5e chip, 2026-08-21, scripts/bench_fhn_fused.py): 6.48M
fused pSGLD steps/s at dopri5 rtol=1e-7 on 10,112 chains (each step =
whole adaptive solve over t in [0, 5], worst chain 41 accepted+rejected
steps, mean NFE 236) vs 295k for the generic vmapped bounded-backprop
path at the SAME chain count — 22x (unlike the spiral comparison, the
3-parameter state fits the generic path at 10k chains, so this ratio is
per-chain honest).
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp

from ..models.fhn_inference import vector_field as _fhn_vector_field
from .fused_field import (
    FusedField,
    fused_dopri5_stats,
    fused_dopri5_trajectory,
)

_THIRD = 1.0 / 3.0


def _point_rhs(x, y, a, b, c, inv_c):
    s = x - x * x * x * _THIRD + y          # V' = c s
    q = x - a + b * y                       # R' = -q / c
    return c * s, -q * inv_c, s, q


def _fhn_factory(N: int, RP: int):
    """rhs + per-point VJP over the packed (a, b, c) rows (the FusedField
    callbacks; same plane contract as ops/spiral_dopri5._spiral_factory)."""

    def rhs(sx, sy, w):
        a, b, c = w
        inv_c = 1.0 / c
        outx, outy = [], []
        for n in range(N):
            fx, fy, _, _ = _point_rhs(sx[n:n + 1], sy[n:n + 1],
                                      a, b, c, inv_c)
            outx.append(fx)
            outy.append(fy)
        pad = jnp.zeros_like(outx[0])
        return (jnp.concatenate(outx + [pad] * (RP - N), 0),
                jnp.concatenate(outy + [pad] * (RP - N), 0))

    def rhs_vjp(sx, sy, cx, cy, w, wbar):
        a, b, c = w
        ga, gb, gc = wbar
        inv_c = 1.0 / c
        xb_rows, yb_rows = [], []
        for n in range(N):
            x = sx[n:n + 1]
            y = sy[n:n + 1]
            cxn = cx[n:n + 1]
            cyn = cy[n:n + 1]
            _, _, s, q = _point_rhs(x, y, a, b, c, inv_c)
            # d fy/da = 1/c ; d fy/db = -y/c ; d fy/dc = q/c^2
            # d fx/dc = s
            ga = ga + cyn * inv_c
            gb = gb - cyn * y * inv_c
            gc = gc + cxn * s + cyn * q * inv_c * inv_c
            # d fx/dx = c (1 - x^2) ; d fx/dy = c
            # d fy/dx = -1/c        ; d fy/dy = -b/c
            xb_rows.append(cxn * c * (1.0 - x * x) - cyn * inv_c)
            yb_rows.append(cxn * c - cyn * b * inv_c)
        pad = jnp.zeros_like(xb_rows[0])
        return (jnp.concatenate(xb_rows + [pad] * (RP - N), 0),
                jnp.concatenate(yb_rows + [pad] * (RP - N), 0),
                (ga, gb, gc))

    return rhs, rhs_vjp


def _fhn_rhs_ref(packed, pts):
    """Plain-XLA reference of the same field over (C, N, 2) points (the
    Hairer initial step + parity tests)."""
    a, b, c = (w.T[:, :, None] for w in packed)       # (C, 1, 1)
    x = pts[..., 0:1]                                 # (C, N, 1)
    y = pts[..., 1:2]
    fx = c * (x - x * x * x * _THIRD + y)
    fy = -(x - a + b * y) / c
    return jnp.concatenate([fx, fy], axis=-1)


@lru_cache(maxsize=None)
def fhn_field() -> FusedField:
    """The FitzHugh-Nagumo theta-field registered with the public fused
    engine (nothing is static beyond the engine's own sizes)."""

    def make_rhs(w, N, RP):
        rhs, _ = _fhn_factory(N, RP)
        return lambda sx, sy: rhs(sx, sy, w)

    def make_rhs_vjp(w, N, RP):
        _, rhs_vjp = _fhn_factory(N, RP)

        def vjp(sx, sy, cx, cy, wbar):
            return rhs_vjp(sx, sy, cx, cy, w, wbar)

        return vjp

    return FusedField(n_weights=3, n_wbar=3, make_rhs=make_rhs,
                      make_rhs_vjp=make_rhs_vjp, rhs_ref=_fhn_rhs_ref)


# the generic-engine counterpart of the fused path (and the parity
# reference in tests) lives with the other model fields
fhn_vector_field = _fhn_vector_field


def _pack_theta(theta):
    """{'a','b','c'} of (C,) -> three (1, C) float32 lane blocks.  Plain
    differentiable jnp ops: the engine's packed-layout cotangents are
    transposed back automatically."""
    f32 = jnp.float32
    return (theta["a"].astype(f32)[None, :],
            theta["b"].astype(f32)[None, :],
            theta["c"].astype(f32)[None, :])


def fhn_dopri5_trajectory(theta, x0, ts, rtol=1e-7, atol=1e-9,
                          safety=0.9, ifactor=10.0, dfactor=0.2,
                          max_steps=100_000, store_steps=128,
                          controller="i", tile=256, interpret=False,
                          method="dopri5"):
    """Adaptive dopri5 trajectories of the per-chain FHN field,
    differentiable w.r.t. theta and x0 (discrete adjoint).

    theta: {'a','b','c'} arrays of shape (C,); x0 (N, 2) shared initial
    points; ts (T,) increasing.  Returns (T, C, N, 2)."""
    return fused_dopri5_trajectory(
        fhn_field(), _pack_theta(theta), x0, ts, rtol=rtol, atol=atol,
        safety=safety, ifactor=ifactor, dfactor=dfactor,
        max_steps=max_steps, store_steps=store_steps,
        controller=controller, tile=tile, interpret=interpret,
        method=method)


def fhn_dopri5_solve_stats(theta, x0, ts, **opts):
    """(trajectory, stats) with the per-tile lockstep `n_iterations` the
    `store_steps` gradient budget must cover."""
    return fused_dopri5_stats(fhn_field(), _pack_theta(theta), x0, ts,
                              **opts)


def make_fused_fhn_potential_dopri5(x0, ts, X, noise=0.1,
                                    prior_loc=(0.0, 0.0, 3.0),
                                    prior_scale=(1.0, 1.0, 1.0),
                                    rtol=1e-7, atol=1e-9,
                                    max_steps=100_000, store_steps=128,
                                    controller="i", tile=256,
                                    interpret=None):
    """Batched FHN posterior potential: Gaussian likelihood at known
    observation noise + independent Gaussian priors on (a, b, c) —
    the Ramsay/Girolami benchmark posterior.  X is (N, T, 2)
    observations; `jax.grad` flows through the discrete adjoint.

    Note c must stay positive (the field divides by it); the default
    prior keeps chains initialized near the truth well away from 0 —
    sample log c externally if a heavier-tailed prior is needed.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    X = jnp.asarray(X, jnp.float32)
    inv_two_noise_sq = 0.5 / float(noise) ** 2
    loc = jnp.asarray(prior_loc, jnp.float32)
    scale = jnp.asarray(prior_scale, jnp.float32)

    def potential_batch(theta):
        traj = fhn_dopri5_trajectory(
            theta, x0, ts, rtol=rtol, atol=atol, max_steps=max_steps,
            store_steps=store_steps, controller=controller, tile=tile,
            interpret=interpret)
        xode = jnp.transpose(traj, (1, 2, 0, 3))       # (C, N, T, 2)
        sse = jnp.sum((X[None] - xode) ** 2, axis=(1, 2, 3))
        th = jnp.stack([theta["a"], theta["b"], theta["c"]], axis=-1)
        prior = 0.5 * jnp.sum(((th - loc) / scale) ** 2, axis=-1)
        return inv_two_noise_sq * sse + prior

    return potential_batch
