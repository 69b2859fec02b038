"""Spiral neural-ODE field on the public fused adaptive engine.

VERDICT r4 #2's acceptance case: a THIRD vector field through
`ops.fused_field` with no new kernel body — this file is only the field
registration (~60 lines of rhs / hand-written VJP / XLA reference) plus
packing and a posterior-potential convenience.  The model is the
reference spiral demo's learned dynamics (neuralode_examples/
ode_demo.py:111-128, mirrored in models/spiral.py):

    f(y) = W2^T tanh(W1^T y^3 + b1) + b2,    y in R^2, H hidden

with PER-CHAIN weights riding the lane axis (the Bayesian posterior
configuration: C chains, each its own field sample, SSE + L2 potential —
the same contract as ops/mlp_dopri5.py).  Gradient semantics are the
frozen-step-mesh discrete adjoint at tolerance; the `store_steps` budget
caveat of ops/gp_dopri5_grad.py applies — probe with
`spiral_dopri5_solve_stats`.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp

from .fused_field import (
    FusedField,
    fused_dopri5_stats,
    fused_dopri5_trajectory,
)


def _tanh(a):
    return jnp.tanh(a)


def _point_forward(x, y, w):
    """One trajectory point (1, C) -> (fx, fy) and the VJP residuals."""
    (w1x, w1y, b1, w2x, w2y, b2x, b2y) = w
    u = x * x * x
    v = y * y * y
    a1 = w1x * u + w1y * v + b1              # (H, C)
    h = _tanh(a1)
    fx = jnp.sum(w2x * h, 0, keepdims=True) + b2x
    fy = jnp.sum(w2y * h, 0, keepdims=True) + b2y
    return fx, fy, (u, v, h)


def _spiral_factory(N: int, RP: int):
    """rhs + per-point VJP over the packed spiral weights (the
    FusedField callbacks; same plane contract as ops/mlp_rk4's
    _mlp_factory)."""

    def rhs(sx, sy, w):
        outx, outy = [], []
        for n in range(N):
            fx, fy, _ = _point_forward(sx[n : n + 1], sy[n : n + 1], w)
            outx.append(fx)
            outy.append(fy)
        pad = jnp.zeros_like(outx[0])
        return (jnp.concatenate(outx + [pad] * (RP - N), 0),
                jnp.concatenate(outy + [pad] * (RP - N), 0))

    def rhs_vjp(sx, sy, cx, cy, w, wbar):
        (w1x, w1y, b1, w2x, w2y, b2x, b2y) = w
        (gw1x, gw1y, gb1, gw2x, gw2y, gb2x, gb2y) = wbar
        xb_rows, yb_rows = [], []
        for n in range(N):
            x = sx[n : n + 1]
            y = sy[n : n + 1]
            cxn = cx[n : n + 1]
            cyn = cy[n : n + 1]
            u = x * x * x
            v = y * y * y
            a1 = w1x * u + w1y * v + b1
            h = _tanh(a1)

            gb2x = gb2x + cxn
            gb2y = gb2y + cyn
            gw2x = gw2x + h * cxn
            gw2y = gw2y + h * cyn
            hb = w2x * cxn + w2y * cyn            # (H, C)
            a1b = hb * (1.0 - h * h)              # tanh'(a) = 1 - tanh^2
            gb1 = gb1 + a1b
            gw1x = gw1x + u * a1b
            gw1y = gw1y + v * a1b
            # d(y^3)/dy = 3 y^2
            xb_rows.append(3.0 * x * x
                           * jnp.sum(w1x * a1b, 0, keepdims=True))
            yb_rows.append(3.0 * y * y
                           * jnp.sum(w1y * a1b, 0, keepdims=True))
        pad = jnp.zeros_like(xb_rows[0])
        xb = jnp.concatenate(xb_rows + [pad] * (RP - N), 0)
        yb = jnp.concatenate(yb_rows + [pad] * (RP - N), 0)
        return xb, yb, (gw1x, gw1y, gb1, gw2x, gw2y, gb2x, gb2y)

    return rhs, rhs_vjp


def _spiral_rhs_ref(packed, pts):
    """Plain-XLA reference (same math as models.spiral.vector_field on
    per-chain weights) for the Hairer initial step and parity tests."""
    (w1x, w1y, b1, w2x, w2y, b2x, b2y) = packed
    N = pts.shape[-2]
    x = pts[..., 0].T                            # (N, C)
    y = pts[..., 1].T
    fx_rows, fy_rows = [], []
    for n in range(N):
        fx, fy, _ = _point_forward(x[n : n + 1], y[n : n + 1], packed)
        fx_rows.append(fx)
        fy_rows.append(fy)
    fx = jnp.concatenate(fx_rows, 0)
    fy = jnp.concatenate(fy_rows, 0)
    return jnp.stack([fx.T, fy.T], axis=-1)      # (C, N, 2)


@lru_cache(maxsize=None)
def spiral_field() -> FusedField:
    """The spiral y^3-MLP field registered with the public fused engine
    (H is carried by the packed block shapes; nothing else is static)."""

    def make_rhs(w, N, RP):
        rhs, _ = _spiral_factory(N, RP)
        return lambda sx, sy: rhs(sx, sy, w)

    def make_rhs_vjp(w, N, RP):
        _, rhs_vjp = _spiral_factory(N, RP)

        def vjp(sx, sy, cx, cy, wbar):
            return rhs_vjp(sx, sy, cx, cy, w, wbar)

        return vjp

    return FusedField(n_weights=7, n_wbar=7, make_rhs=make_rhs,
                      make_rhs_vjp=make_rhs_vjp, rhs_ref=_spiral_rhs_ref)


def _pack_weights(params):
    """models.spiral per-chain params {'w1' (C, 2, H), 'b1' (C, H),
    'w2' (C, H, 2), 'b2' (C, 2)} -> lane-major packed tuple.  Plain
    differentiable jnp ops: the engine's packed-layout cotangents are
    transposed back automatically."""
    f32 = jnp.float32
    w1 = params["w1"].astype(f32)
    b1 = params["b1"].astype(f32)
    w2 = params["w2"].astype(f32)
    b2 = params["b2"].astype(f32)
    return (w1[:, 0, :].T, w1[:, 1, :].T, b1.T,
            w2[:, :, 0].T, w2[:, :, 1].T,
            b2[:, 0][None, :], b2[:, 1][None, :])


def spiral_dopri5_trajectory(params, x0, ts, rtol=1e-7, atol=1e-9,
                             safety=0.9, ifactor=10.0, dfactor=0.2,
                             max_steps=100_000, store_steps=128,
                             controller="i", tile=128, interpret=False,
                             method="dopri5"):
    """Adaptive dopri5 trajectories of the per-chain spiral field,
    differentiable w.r.t. params and x0 (discrete adjoint).

    params: models.spiral init_params dict with a leading chain axis C;
    x0 (N, 2) shared; ts (T,) increasing.  Returns (T, C, N, 2)."""
    return fused_dopri5_trajectory(
        spiral_field(), _pack_weights(params), x0, ts, rtol=rtol,
        atol=atol, safety=safety, ifactor=ifactor, dfactor=dfactor,
        max_steps=max_steps, store_steps=store_steps,
        controller=controller, tile=tile, interpret=interpret,
        method=method)


def spiral_dopri5_solve_stats(params, x0, ts, **opts):
    """(trajectory, stats) with the per-tile lockstep `n_iterations` the
    `store_steps` gradient budget must cover."""
    return fused_dopri5_stats(spiral_field(), _pack_weights(params), x0,
                              ts, **opts)


def make_fused_spiral_potential_dopri5(x0, ts, X, reg: float = 0.5,
                                       rtol=1e-7, atol=1e-9,
                                       max_steps=100_000, store_steps=128,
                                       controller="i", tile=128,
                                       interpret=None):
    # tile=128 default: measured fastest for this field (2026-08-21,
    # v5e, H=50, 10,240 chains, pSGLD fwd+bwd: 2.89M steps/s at 128 vs
    # 2.74M at 256, 2.33M at 512 — the H*... backward stack rewards the
    # smallest legal tile)
    """Batched spiral posterior potential (SSE + L2 prior, the
    mlp_dopri5 convention) with the solve at adaptive dopri5 tolerance
    through the fused engine; `jax.grad` flows through the discrete
    adjoint.  X is (N, T, 2) observations."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    X = jnp.asarray(X, jnp.float32)

    def potential_batch(params):
        traj = spiral_dopri5_trajectory(
            params, x0, ts, rtol=rtol, atol=atol, max_steps=max_steps,
            store_steps=store_steps, controller=controller, tile=tile,
            interpret=interpret)
        xode = jnp.transpose(traj, (1, 2, 0, 3))       # (C, N, T, 2)
        loss = jnp.sum((X[None] - xode) ** 2, axis=(1, 2, 3))
        l2 = (jnp.sum(params["w1"] ** 2, axis=(1, 2))
              + jnp.sum(params["b1"] ** 2, axis=1)
              + jnp.sum(params["w2"] ** 2, axis=(1, 2))
              + jnp.sum(params["b2"] ** 2, axis=1))
        return loss + reg * l2

    return potential_batch
