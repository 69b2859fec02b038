"""GP vector field registered with the PUBLIC fused engine.

The hand-written GP adapters (ops/gp_dopri5.py whole-solve forward,
ops/gp_dopri5_grad.py recording/replay custom VJP) remain the production
path — their (MP, 1) shared-block BlockSpecs avoid materializing the
inducing grid per chain.  This registration routes the SAME field
callbacks through `ops.fused_field`, which buys two things:

  1. an engine-level consistency gate: the public engine reproduces the
     generic integrator (and hence the hand-written adapter) to solver
     tolerance on the dopri5 path (tests/test_fused_field.py; the two
     engines' Hairer initial-step arithmetic differs in operation order,
     so agreement is at O(rtol), not bitwise);
  2. solver-agnostic solves for the GP posterior: `method="tsit5"` (or
     any `_check_tableau`-accepted pair) with the discrete adjoint, which
     the hand-written adapter does not expose (VERDICT r4 #8).

Weights: packed = (ax, ay, zx, zy) with chains on lanes; only (ax, ay)
receive cotangents (zx/zy are the shared inducing grid, replicated
across lanes here — the price of the generic per-chain BlockSpec).
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
from .gp_dopri5 import _FAR, _make_rhs, _pad8
from .gp_dopri5_grad import _make_rhs_vjp


def _gp_rhs_ref(packed, pts, sf, ell):
    """Plain-XLA reference of the packed GP field over (C, N, 2) points
    (same math as models.kernel_regression.vector_field_fast on the
    lane-major layout)."""
    ax, ay, zx, zy = packed
    sf2 = sf * sf
    inv2ell2 = 0.5 / (ell * ell)
    N = pts.shape[-2]
    x = pts[..., 0].T                            # (N, C)
    y = pts[..., 1].T
    fx_rows, fy_rows = [], []
    for n in range(N):
        dx = x[n : n + 1] - zx                   # (MP, C)
        dy = y[n : n + 1] - zy
        K = sf2 * jnp.exp(-(dx * dx + dy * dy) * inv2ell2)
        fx_rows.append(jnp.sum(K * ax, 0, keepdims=True))
        fy_rows.append(jnp.sum(K * ay, 0, keepdims=True))
    fx = jnp.concatenate(fx_rows, 0)
    fy = jnp.concatenate(fy_rows, 0)
    return jnp.stack([fx.T, fy.T], axis=-1)      # (C, N, 2)


@lru_cache(maxsize=None)
def gp_field(sf: float, ell: float) -> FusedField:
    """The GP field as a public-engine registration (one instance per
    kernel hyperparameter pair, lru_cached for jit-cache stability)."""

    def make_rhs(w, N, RP):
        ax, ay, zx, zy = w
        return _make_rhs(sf, ell, N, RP, ax, ay, zx, zy)

    def make_rhs_vjp(w, N, RP):
        ax, ay, zx, zy = w
        raw = _make_rhs_vjp(sf, ell, N, RP, ax, ay, zx, zy)

        def vjp(sx, sy, cx, cy, wbar):
            ubx, uby, dax, day = raw(sx, sy, cx, cy)
            return ubx, uby, (wbar[0] + dax, wbar[1] + day)

        return vjp

    return FusedField(
        n_weights=4, n_wbar=2, make_rhs=make_rhs,
        make_rhs_vjp=make_rhs_vjp,
        rhs_ref=lambda packed, pts: _gp_rhs_ref(packed, pts, sf, ell))


def _pack(A, Z):
    """A (C, M, 2) + shared inducing grid Z (M, 2) -> lane-major packed
    (ax, ay, zx, zy) with the M axis padded to the 8-row sublane tile.
    Differentiable in A (zx/zy receive zero cotangent by n_wbar)."""
    f32 = jnp.float32
    C, M = A.shape[0], A.shape[1]
    MP = _pad8(M)
    pad = jnp.zeros((C, MP - M), f32)
    ax = jnp.concatenate([A[:, :, 0].astype(f32), pad], axis=1).T
    ay = jnp.concatenate([A[:, :, 1].astype(f32), pad], axis=1).T
    # pad inducing rows with the _FAR sentinel exactly like the
    # hand-written kernels (K at pad rows is then identically zero)
    zpad = jnp.full((MP - M,), _FAR, f32)
    zx = jnp.broadcast_to(
        jnp.concatenate([Z[:, 0].astype(f32), zpad])[:, None], (MP, C))
    zy = jnp.broadcast_to(
        jnp.concatenate([Z[:, 1].astype(f32), zpad])[:, None], (MP, C))
    return ax, ay, zx, zy


def gp_field_trajectory(A, x0, ts, static, rtol=1e-7, atol=1e-9,
                        method="dopri5", **opts):
    """Adaptive trajectories of the GP field through the PUBLIC fused
    engine — solver-agnostic (`method` in {"dopri5", "tsit5"}),
    differentiable w.r.t. A and x0.  A (C, M, 2); x0 (N, 2); ts (T,);
    returns (T, C, N, 2).  The dopri5 path agrees with
    ops.gp_dopri5_grad.gp_dopri5_trajectory to integrator tolerance
    (same field callbacks and step arithmetic; the Hairer initial-step
    op order differs)."""
    field = gp_field(float(static.sf), float(static.ell))
    return fused_dopri5_trajectory(field, _pack(A, static.Z), x0, ts,
                                   rtol=rtol, atol=atol, method=method,
                                   **opts)


def gp_field_solve_stats(A, x0, ts, static, method="dopri5", **opts):
    """(trajectory, stats) through the public engine — `n_iterations`
    sizes the `store_steps` gradient budget."""
    field = gp_field(float(static.sf), float(static.ell))
    return fused_dopri5_stats(field, _pack(A, static.Z), x0, ts,
                              method=method, **opts)
