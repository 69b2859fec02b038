"""Differentiable whole-solve fused dopri5 for the MLP field.

Round 2 hand-adapted the recording/replay kernel bodies
(ops/fused_adaptive.py) to the reference's NN mean-function baseline

    f(x) = W3^T elu(W2^T elu(W1^T x + b1) + b2) + b3

(notebooks/jai/nn.ipynb cell 4); round 5 rebased it onto the PUBLIC
fused-field engine (ops/fused_field.py) — this module is now just the
field registration (rhs / rhs_vjp / XLA reference, reusing
ops/mlp_rk4._mlp_factory's hand-written layer VJPs) plus the packing and
potential conveniences.  Numerics are identical to the hand-written
adapter: the engine transplants its implementation verbatim, and the
forward-parity / f64-gradient-truth / off-grid-tile gates in
tests/test_pallas_ops.py pin it.

Discrete-adjoint semantics (frozen step mesh at tolerance) and the
`store_steps` budget caveat are documented in ops/gp_dopri5_grad.py and
apply unchanged: gradients are valid only while every tile's lockstep
iteration count fits the record buffer — probe with
`mlp_dopri5_solve_stats`.
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
from .mlp_rk4 import _elu, _mlp_factory, _pack_weights


def _w_rows(H: int) -> int:
    """Total packed weight rows: w1x/w1y/b1/b2/w3x/w3y (H each), w2 (H*H),
    b3x/b3y (1 each)."""
    return 6 * H + H * H + 2


def _mlp_rhs_ref(packed, pts, H):
    """Plain-XLA reference of the packed MLP field over (C, N, 2) points
    (same math as models.mlp.mlp_vector_field) — Hairer initial step +
    parity tests."""
    (w1x, w1y, b1, w2, b2, w3x, w3y, b3x, b3y) = packed
    N = pts.shape[-2]
    x = pts[..., 0].T                            # (N, C)
    y = pts[..., 1].T
    fx_rows, fy_rows = [], []
    for n in range(N):
        a1 = w1x * x[n : n + 1] + w1y * y[n : n + 1] + b1
        h1 = _elu(a1)
        a2 = jnp.concatenate(
            [jnp.sum(w2[j * H : (j + 1) * H] * h1, 0, keepdims=True)
             for j in range(H)], 0) + b2
        h2 = _elu(a2)
        fx_rows.append(jnp.sum(w3x * h2, 0, keepdims=True) + b3x)
        fy_rows.append(jnp.sum(w3y * h2, 0, keepdims=True) + b3y)
    fx = jnp.concatenate(fx_rows, 0)             # (N, C)
    fy = jnp.concatenate(fy_rows, 0)
    return jnp.stack([fx.T, fy.T], axis=-1)      # (C, N, 2)


def _mlp_stack_rows(H):
    """Calibrated backward-stack model (r2 measurement): per-point MLP
    temporaries (a1/h1/a2/h2 + h1b/a2b chains, ~6 H-row slots each) stay
    live across the UNROLLED N-point python loop in rhs_vjp, so the
    stack scales with N, not just RP."""

    def rows(W, N, TP, RP):
        return 6 * W + 40 * RP + 12 * TP + 36 * H * max(N, 1)

    return rows


@lru_cache(maxsize=None)
def mlp_field(H: int) -> FusedField:
    """The MLP vector field registered with the public fused engine —
    one instance per hidden width (lru_cache keeps the jit caches warm)."""

    def make_rhs(w, N, RP):
        rhs, _ = _mlp_factory(H, N, RP)
        return lambda sx, sy: rhs(sx, sy, w)

    def make_rhs_vjp(w, N, RP):
        _, rhs_vjp = _mlp_factory(H, N, RP)

        def vjp(sx, sy, cx, cy, wbar):
            return rhs_vjp(sx, sy, cx, cy, w, wbar)

        return vjp

    return FusedField(
        n_weights=9, n_wbar=9, make_rhs=make_rhs,
        make_rhs_vjp=make_rhs_vjp,
        rhs_ref=lambda packed, pts: _mlp_rhs_ref(packed, pts, H),
        bwd_stack_rows=_mlp_stack_rows(H))


def mlp_dopri5_trajectory(params, x0, ts, rtol=1e-7, atol=1e-9,
                          safety=0.9, ifactor=10.0, dfactor=0.2,
                          max_steps=100_000, store_steps=128,
                          controller="i", tile=256, interpret=False):
    """Adaptive dopri5 trajectories of the MLP field, differentiable
    w.r.t. params and x0 through a hand-written discrete adjoint.

    params: models.mlp layer list with leading chain axis C (exactly
    [2, H, H, 2] sizes); x0 (N, 2) shared; ts (T,) increasing.  Returns
    (T, C, N, 2).  Any C >= 1 (padded to the tile internally).  Gradients
    require max(n_accepted + n_rejected) <= store_steps per chain.
    """
    H = params[0]["w"].shape[-1]
    packed = _pack_weights(params, params[0]["w"].shape[0], H)
    return fused_dopri5_trajectory(
        mlp_field(H), packed, x0, ts, rtol=rtol, atol=atol, safety=safety,
        ifactor=ifactor, dfactor=dfactor, max_steps=max_steps,
        store_steps=store_steps, controller=controller, tile=tile,
        interpret=interpret)


def mlp_dopri5_solve_stats(params, x0, ts, rtol=1e-7, atol=1e-9,
                           safety=0.9, ifactor=10.0, dfactor=0.2,
                           max_steps=100_000, store_steps=128,
                           controller="i", tile=256, interpret=False):
    """Forward solve returning (trajectory, stats) where stats carries the
    per-tile lockstep iteration count `n_iterations` (C,) — the quantity
    the `store_steps` gradient budget must cover.  Use it to size
    `store_steps` before a long sampling run."""
    H = params[0]["w"].shape[-1]
    packed = _pack_weights(params, params[0]["w"].shape[0], H)
    return fused_dopri5_stats(
        mlp_field(H), packed, x0, ts, rtol=rtol, atol=atol, safety=safety,
        ifactor=ifactor, dfactor=dfactor, max_steps=max_steps,
        store_steps=store_steps, controller=controller, tile=tile,
        interpret=interpret)


def make_fused_mlp_potential_dopri5(x0, ts, X, reg: float = 0.5,
                                    rtol=1e-7, atol=1e-9,
                                    max_steps=100_000, store_steps=128,
                                    controller="i", tile=256,
                                    interpret=None):
    """Batched MLP posterior potential (SSE + L2 prior, nn.ipynb cell 6)
    with the solve at adaptive dopri5 tolerance through the fused
    differentiable whole-solve kernel; `jax.grad` flows through the
    hand-written discrete adjoint.  Matches models.mlp.make_potential with
    solve=odeint(method='dopri5') numerically."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    X = jnp.asarray(X, jnp.float32)

    def potential_batch(params):
        traj = mlp_dopri5_trajectory(params, x0, ts, rtol=rtol, atol=atol,
                                     max_steps=max_steps,
                                     store_steps=store_steps,
                                     controller=controller, tile=tile,
                                     interpret=interpret)
        xode = jnp.transpose(traj, (1, 2, 0, 3))       # (C, N, T, 2)
        loss = jnp.sum((X[None] - xode) ** 2, axis=(1, 2, 3))
        l2 = sum(
            jnp.sum(layer["w"].reshape(layer["w"].shape[0], -1) ** 2, axis=1)
            + jnp.sum(layer["b"] ** 2, axis=1)
            for layer in params
        )
        return loss + reg * l2

    return potential_batch
