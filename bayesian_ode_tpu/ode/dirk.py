"""Diagonally-implicit Runge-Kutta (SDIRK/ESDIRK) stepping for stiff ODEs.

The reference framework is nonstiff-only (torchdiffeq/_impl has no implicit
methods — SURVEY.md §2.1); these solvers extend the framework beyond
reference parity so stiff vector fields (chemical kinetics, relaxation
oscillators at large mu) integrate in tens of steps instead of millions.

TPU-first design: the per-step work is a small dense Jacobian
(`jax.jacfwd`, n RHS evals for state dimension n), ONE LU factorization of
M = I - h*gamma*J reused across all implicit stages (the SDIRK property:
every implicit stage shares the diagonal gamma), and fixed-length masked
simplified-Newton iterations per stage — a constant-shape program that
jits, vmaps (per-chain independent step control, batched LU), shards, and
reverse-differentiates (the Newton loop is a bounded `lax.scan`, so
`options={"mode": "bounded"}` backprop works unchanged).

Methods:
  - `sdirk4`: Hairer & Wanner's 5-stage, order-4 L-stable SDIRK
    (gamma = 1/4; Solving ODEs II, Table IV.6.5) with its order-3 embedded
    error weights.  The workhorse for tight tolerances.
  - `trbdf2`: the TR-BDF2 ESDIRK (Hosea & Shampine formulation,
    gamma = 2 - sqrt(2)): explicit first stage, order 2, L-stable, with
    the order-3 embedded error estimator.  Cheap and robust at loose
    tolerances; the classic circuit-simulation method.

Both are stiffly accurate (b equals the last row of A), so y1 is the last
stage value and f(t1, y1) equals the last stage derivative — giving the
FSAL slope for free and both endpoint slopes for the cubic-Hermite dense
output ("hermite" interp kind in ode/adaptive.py).

The embedded error difference is O(h^3) for both pairs and is used RAW by
default: Shampine's M^{-1} filter (Hairer & Wanner IV.8) is available via
options={"error_filter": "shampine"} but measured to hide
Prothero-Robinson order reduction at lam*h >> 1 (numbers at the filter
site in dirk_step), so raw is the default.

All tableau constants are verified against the Butcher order conditions in
tests/test_implicit.py, so a transcription error cannot pass CI.
"""
from __future__ import annotations

import math
from typing import Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from ..utils.pytree import PyTree, tree_where
from .runge_kutta import AdaptiveState, _cast
from .step_control import error_ratio, optimal_step_size, pi_step_size


class DIRKTableau(NamedTuple):
    """Diagonally-implicit RK tableau with embedded error weights.

    c:       stage times (length s, INCLUDING the first stage).
    A:       full s x s lower-triangular stage matrix (row i has i+1
             meaningful entries; the diagonal A[i][i] is 0 for an explicit
             first stage, gamma for implicit stages).
    b:       solution weights (== A[-1] for the stiffly accurate methods
             here).
    b_error: b - b_hat, weights of the embedded error estimate.
    order:   order of the error ESTIMATE + 1 exponent convention used by
             the step controller (matches the explicit tableaus: dopri5
             passes 5 for its O(h^5) local-error estimate; both pairs here
             have O(h^3) estimates and pass 3).
    gamma:   the shared implicit diagonal value.
    """

    c: Sequence[float]
    A: Sequence[Sequence[float]]
    b: Sequence[float]
    b_error: Sequence[float]
    order: int
    gamma: float


# Hairer & Wanner, Solving ODEs II (1996), Table IV.6.5: the L-stable
# 5-stage SDIRK of order 4 with gamma = 1/4 and its order-3 embedded pair
# (error weights e = b - b_hat).  Rational constants transcribed exactly;
# order conditions through order 4 (b) and 3 (b_hat) are asserted in
# tests/test_implicit.py::test_tableau_order_conditions.
SDIRK4 = DIRKTableau(
    c=[1 / 4, 3 / 4, 11 / 20, 1 / 2, 1.0],
    A=[
        [1 / 4, 0.0, 0.0, 0.0, 0.0],
        [1 / 2, 1 / 4, 0.0, 0.0, 0.0],
        [17 / 50, -1 / 25, 1 / 4, 0.0, 0.0],
        [371 / 1360, -137 / 2720, 15 / 544, 1 / 4, 0.0],
        [25 / 24, -49 / 48, 125 / 16, -85 / 12, 1 / 4],
    ],
    b=[25 / 24, -49 / 48, 125 / 16, -85 / 12, 1 / 4],
    b_error=[-3 / 16, -27 / 32, 25 / 32, 0.0, 1 / 4],
    order=3,
    gamma=1 / 4,
)

_SQRT2 = math.sqrt(2.0)
_D = 1.0 - _SQRT2 / 2.0  # gamma/2 for gamma = 2 - sqrt(2)

# TR-BDF2 as a 3-stage ESDIRK (Hosea & Shampine 1996): trapezoidal step to
# t0 + (2-sqrt(2))h then BDF2 to t1; explicit first stage, L-stable,
# stiffly accurate, order 2 with an order-3 embedded estimator.
TRBDF2 = DIRKTableau(
    c=[0.0, 2.0 - _SQRT2, 1.0],
    A=[
        [0.0, 0.0, 0.0],
        [_D, _D, 0.0],
        [_SQRT2 / 4.0, _SQRT2 / 4.0, _D],
    ],
    b=[_SQRT2 / 4.0, _SQRT2 / 4.0, _D],
    b_error=[
        _SQRT2 / 4.0 - (1.0 - _SQRT2 / 4.0) / 3.0,
        _SQRT2 / 4.0 - (3.0 * _SQRT2 / 4.0 + 1.0) / 3.0,
        _D - _D / 3.0,
    ],
    order=3,
    # the shared IMPLICIT STAGE DIAGONAL is gamma/2 = 1 - sqrt(2)/2 in the
    # ESDIRK form (the method's "gamma = 2 - sqrt(2)" names c[1], not the
    # diagonal); using 2 - sqrt(2) here builds the wrong Newton/filter
    # matrix M — it still converges (M is only a preconditioner) but at a
    # measured ~43% step-rejection rate vs ~3% with the correct value
    gamma=_D,
)

DIRK_TABLEAUS = {"sdirk4": SDIRK4, "trbdf2": TRBDF2}


def _newton_stage(f_vec, ti, r, a_ii_dt, lu_piv, z0, rtol, atol, iters,
                  kappa):
    """Solve z = r + a_ii_dt * f(ti, z) by simplified Newton.

    Fixed-length masked scan (bounded work); converged lanes freeze.
    Returns (z, converged).
    """

    def body(carry, _):
        z, done = carry
        g = z - a_ii_dt * f_vec(ti, z) - r
        dz = jax.scipy.linalg.lu_solve(lu_piv, g)
        z_new = z - dz
        scale = atol + rtol * jnp.abs(z_new)
        eta = jnp.sqrt(jnp.mean(jnp.square(dz / scale)))
        z = jnp.where(done, z, z_new)
        done = done | (eta <= kappa)
        return (z, done), None

    (z, done), _ = jax.lax.scan(
        body, (z0, jnp.asarray(False)), None, length=iters
    )
    return z, done


def _implicit_stage(f_vec, ti, r, a_ii_dt, lu_piv, z0, rtol, atol, iters,
                    kappa):
    """Differentiable implicit-stage solve via `lax.custom_root`.

    The primal is `_newton_stage` (frozen-Jacobian LU Newton), but
    derivatives come from the implicit function theorem on the stage
    residual g(z) = z - a_ii_dt*f(ti, z) - r: the tangent solve
    materializes the EXACT stage Jacobian (jacfwd, n RHS evals — only
    traced under differentiation) and solves it densely.  Unrolling the
    truncated simplified-Newton iterations instead is catastrophically
    wrong for stiff fields: the derivative of the truncated map diverges
    from the IFT derivative as stiffness grows (observed 20% error for
    sdirk4 and 1e21 blow-up for trbdf2 on y' = -500(y - cos t)).
    """

    def g_res(zv):
        return zv - a_ii_dt * f_vec(ti, zv) - r

    def solve_fn(_, z0v):
        z, ok = _newton_stage(f_vec, ti, r, a_ii_dt, lu_piv, z0v, rtol,
                              atol, iters, kappa)
        # bool aux trips custom_root's JVP rule (bool tangent vs float0);
        # carry it as a float and rebool outside
        return z, ok.astype(z0v.dtype)

    def tangent_solve(g_lin, y):
        return jnp.linalg.solve(jax.jacfwd(g_lin)(y), y)

    z, ok = jax.lax.custom_root(g_res, z0, solve_fn, tangent_solve,
                                has_aux=True)
    return z, jax.lax.stop_gradient(ok) > 0.5


def dirk_step(func: Callable, state: AdaptiveState, tableau: DIRKTableau,
              interp_kind: str, cfg) -> AdaptiveState:
    """One accept/reject adaptive DIRK step (drop-in for `adaptive_step`).

    Work per step: one n x n Jacobian (jacfwd), one LU factorization,
    `cfg.newton_iters` Newton iterations per implicit stage (each a
    triangular solve + one RHS eval).  A stage that fails to converge
    forces rejection with a shrunken next dt, like an error-test failure.
    """
    from .adaptive import _INTERP  # local import avoids a module cycle

    _, fit, _ = _INTERP[interp_kind]
    y0, f0, t0 = state.y1, state.f1, state.t1
    # Frozen-mesh differentiation (same semantics as the fused
    # recording/replay kernels, ops/fused_adaptive.py): the step mesh is
    # treated as data under AD.  Differentiating through the adaptive
    # controller is catastrophic here — TR-BDF2's rejection-heavy dt
    # recursion amplifies the error-estimate's parameter sensitivity
    # multiplicatively over thousands of steps (observed O(1) gradient
    # error on y' = -500(y - cos t) whose true gradient is 3e-6).  The
    # bias of the frozen-mesh derivative is O(local error).
    dt = jax.lax.stop_gradient(state.dt)

    vec0, unravel = ravel_pytree(y0)
    f0_vec, _ = ravel_pytree(f0)
    n = vec0.shape[0]
    dtc = jnp.asarray(dt).astype(vec0.dtype)

    def f_vec(t, zv):
        return ravel_pytree(func(t, unravel(zv)))[0]

    # simplified Newton: Jacobian at the step start, one LU for all stages.
    # stop_gradient: the LU is an iteration/filter preconditioner only —
    # stage derivatives come from the IFT tangent solve (_implicit_stage),
    # so tracking J would add a useless second-derivative path through
    # jacfwd(func) in reverse mode.
    J = jax.lax.stop_gradient(jax.jacfwd(lambda zv: f_vec(t0, zv))(vec0))
    M = jnp.eye(n, dtype=vec0.dtype) - jax.lax.stop_gradient(
        dtc) * tableau.gamma * J
    lu_piv = jax.scipy.linalg.lu_factor(M)

    s = len(tableau.c)
    ks = []
    converged = jnp.asarray(True)
    nfe_step = n  # the Jacobian's RHS evaluations
    for i in range(s):
        row = tableau.A[i]
        ti = t0 + tableau.c[i] * dt
        r = vec0
        for j in range(i):
            if row[j] != 0.0:
                r = r + dtc * row[j] * ks[j]
        a_ii = row[i]
        if a_ii == 0.0:
            # explicit first stage (ESDIRK): k1 = f(t0, y0) = the FSAL slope
            ki = f0_vec
        else:
            z0 = r + dtc * a_ii * (ks[i - 1] if i > 0 else f0_vec)
            z, ok = _implicit_stage(
                f_vec, ti, r, dtc * a_ii, lu_piv, z0, cfg.rtol, cfg.atol,
                cfg.newton_iters, cfg.newton_kappa,
            )
            converged = converged & ok
            # k_i from the stage algebra (exact w.r.t. the converged z)
            ki = (z - r) / (dtc * a_ii)
            nfe_step += cfg.newton_iters
        ks.append(ki)

    y1_vec = vec0 + dtc * sum(b * k for b, k in zip(tableau.b, ks)
                              if b != 0.0)
    err_vec = dtc * sum(e * k for e, k in zip(tableau.b_error, ks)
                        if e != 0.0)
    if cfg.error_filter == "shampine":
        # M^{-1} err bounds the estimate on strong transients (Hairer &
        # Wanner IV.8), but at lam*h >> 1 it divides the quasi-static
        # tracking error by ~gamma*lam*h, blinding the controller to
        # Prothero-Robinson order reduction.  Measured on
        # y' = -lam(y - cos t), rtol=1e-6: filtered sdirk4 reads 1.0e-2
        # actual error at lam=1e6 (57 steps); raw reads 1.4e-7 (768
        # steps).  On Van der Pol mu=1000 (strong transients) raw costs
        # only 56 vs 33 accepted steps — hence raw is the default.
        err_vec = jax.scipy.linalg.lu_solve(lu_piv, err_vec)
    elif cfg.error_filter != "raw":
        raise ValueError(
            f"unknown error_filter {cfg.error_filter!r}; "
            "expected 'raw' or 'shampine'"
        )

    y1 = unravel(y1_vec)
    f1 = unravel(ks[-1])  # stiffly accurate: k_s = f(t1, y1)
    y1_error = unravel(err_vec)

    floor = cfg.ulp_floor if cfg.ulp_floor is not None else 32.0
    ratio = error_ratio(y1_error, cfg.rtol, cfg.atol, y0, y1, floor,
                        cfg.norm_weights)
    # part of the frozen mesh: accept/step-size decisions are data under AD
    ratio = jax.lax.stop_gradient(ratio)
    # Newton failure => reject and shrink (the controller's max-shrink cap
    # applies); 1e6 keeps the ratio finite through the controller's sqrt.
    ratio = jnp.where(converged, ratio, jnp.asarray(1e6, ratio.dtype))
    accept = ratio <= 1.0

    # interp fit consumes a stage list whose endpoints are (f0, f1); the
    # hermite fit only reads k[0] and k[-1]
    k_trees = [f0, f1]
    y_next = tree_where(accept, y1, y0)
    f_next = tree_where(accept, f1, f0)
    t_next = jnp.where(accept, t0 + dt, t0)
    coeff_next = tree_where(
        accept, fit(func, tableau, y0, y1, k_trees, t0, dt),
        state.interp_coeff
    )
    if cfg.controller not in ("i", "pi"):
        raise ValueError(
            f"unknown step controller {cfg.controller!r}; expected 'i' or 'pi'"
        )
    if cfg.controller == "pi":
        dt_next = pi_step_size(
            dt, ratio, state.err_prev, accept, cfg.safety, cfg.ifactor,
            cfg.dfactor, tableau.order,
        )
        err = jnp.sqrt(
            jnp.maximum(ratio, jnp.finfo(dt.dtype).tiny)
        ).astype(dt.dtype)
        err_prev_next = jnp.where(accept, err, state.err_prev)
    else:
        dt_next = optimal_step_size(
            dt, ratio, cfg.safety, cfg.ifactor, cfg.dfactor, tableau.order
        )
        err_prev_next = state.err_prev
    return AdaptiveState(
        y1=y_next,
        f1=f_next,
        t0=t0,
        t1=t_next,
        dt=dt_next,
        interp_coeff=coeff_next,
        nfe=state.nfe + nfe_step,
        n_accepted=state.n_accepted + accept.astype(state.n_accepted.dtype),
        n_rejected=state.n_rejected + (~accept).astype(state.n_rejected.dtype),
        comp=state.comp,
        err_prev=err_prev_next,
    )
