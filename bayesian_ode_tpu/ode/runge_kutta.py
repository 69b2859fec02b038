"""Generic explicit Runge-Kutta stepping over a Butcher tableau.

The stage loop is unrolled at trace time (6 stages for the 5(4) pairs) so XLA
fuses the whole step into a handful of elementwise kernels; `k` is kept as a
list of pytrees rather than a stacked array so arbitrary state pytrees work.

Parity target: torchdiffeq/_impl/rk_common.py:22-78.
"""
from __future__ import annotations

from typing import Callable, List, NamedTuple

import jax

from ..utils.pytree import PyTree
from .tableaus import ButcherTableau


class AdaptiveState(NamedTuple):
    """Carry of the adaptive stepping loop (== reference `_RungeKuttaState`,
    rk_common.py:8-19, plus an NFE counter and step accounting).

    y1:           state at the end of the last accepted step.
    f1:           RHS at (t1, y1)  (FSAL).
    t0, t1:       endpoints of the last accepted step.
    dt:           proposed size of the next step.
    interp_coeff: dense-output representation for [t0, t1]; for dopri5-style
                  methods a 5-element polynomial-coefficient pytree list, for
                  tsit5 the (y0, k) pair.
    nfe:          number of RHS evaluations so far (reference counts this via
                  wrapper classes, e.g. DETEST/run.py:11-19).
    n_accepted / n_rejected: adaptive step accounting.
    comp:         Kahan compensation tree (the low bits lost when adding the
                  step increment to y1); None unless
                  AdaptiveConfig.compensated.
    """

    y1: PyTree
    f1: PyTree
    t0: jax.Array
    t1: jax.Array
    dt: jax.Array
    interp_coeff: PyTree
    nfe: jax.Array
    n_accepted: jax.Array
    n_rejected: jax.Array
    comp: PyTree = None
    err_prev: jax.Array = None  # last ACCEPTED step's sqrt error ratio
    #                             (PI controller memory; None under "i")


def _cast(c, like):
    """Cast a time-dtype scalar into the state leaf dtype (the reference's
    `.type_as` discipline, rk_common.py:46-48): time stays f64 under x64
    while f32 states remain f32."""
    import jax.numpy as jnp

    return jnp.asarray(c).astype(like.dtype)


def runge_kutta_step(func: Callable, y0: PyTree, f0: PyTree, t0, dt,
                     tableau: ButcherTableau):
    """One explicit RK step with embedded error estimate.

    Returns (y1, f1, y1_error, y1_error_alt, k) where k is the list of
    stage derivatives with the endpoint slope f(t1, y1) last.
    y1_error_alt is the second embedded estimate for composite-error
    tableaus (DOPRI8's 3rd-order row; tableaus.ButcherTableau.c_error_alt)
    and None otherwise.  FSAL tableaus skip the final
    combine and reuse the last stage as f1 (rk_common.py:54-56); non-FSAL
    tableaus (fehlberg2, adaptive_heun) evaluate f1 fresh — one extra RHS
    call per step, counted via tableau.nfe_per_step — so the FSAL carry
    contract (state.f1 == f(t1, y1)) and the Hermite interpolant's
    endpoint-slope access (k[-1]) stay valid for every tableau.
    """
    k: List[PyTree] = [f0]
    for alpha_i, beta_i in zip(tableau.alpha, tableau.beta):
        ti = t0 + alpha_i * dt
        yi = jax.tree.map(
            lambda y, *ks: y + _cast(dt, y)
            * sum(b * k_ for b, k_ in zip(beta_i, ks) if b != 0),
            y0,
            *k,
        )
        k.append(func(ti, yi))

    # The error combine zips c_error (s+1 weights) against k, so the extra
    # non-FSAL endpoint slope appended below never enters the estimate.
    y1_error = jax.tree.map(
        lambda *ks: _cast(dt, ks[0])
        * sum(c * k_ for c, k_ in zip(tableau.c_error, ks) if c != 0),
        *k,
    )
    y1_error_alt = None
    if tableau.c_error_alt is not None:
        y1_error_alt = jax.tree.map(
            lambda *ks: _cast(dt, ks[0])
            * sum(c * k_ for c, k_ in zip(tableau.c_error_alt, ks) if c != 0),
            *k,
        )
    if tableau.is_fsal:
        y1 = yi
    else:
        y1 = jax.tree.map(
            lambda y, *ks: y + _cast(dt, y)
            * sum(c * k_ for c, k_ in zip(tableau.c_sol, ks) if c != 0),
            y0,
            *k,
        )
        k.append(func(t0 + dt, y1))
    f1 = k[-1]
    return y1, f1, y1_error, y1_error_alt, k


def rk4_step(func: Callable, t, dt, y: PyTree, k1: PyTree = None) -> PyTree:
    """Classic RK4 increment dt*(k1+2k2+2k3+k4)/6 (rk_common.py:64-69)."""
    if k1 is None:
        k1 = func(t, y)
    k2 = func(t + dt / 2, jax.tree.map(lambda y_, k_: y_ + _cast(dt, y_) * k_ / 2, y, k1))
    k3 = func(t + dt / 2, jax.tree.map(lambda y_, k_: y_ + _cast(dt, y_) * k_ / 2, y, k2))
    k4 = func(t + dt, jax.tree.map(lambda y_, k_: y_ + _cast(dt, y_) * k_, y, k3))
    return jax.tree.map(
        lambda a, b, c, d: (a + 2 * b + 2 * c + d) * (_cast(dt, a) / 6), k1, k2, k3, k4
    )


def rk4_alt_step(func: Callable, t, dt, y: PyTree, k1: PyTree = None) -> PyTree:
    """3/8-rule RK4 (smaller error constant; rk_common.py:72-78)."""
    if k1 is None:
        k1 = func(t, y)
    k2 = func(t + dt / 3, jax.tree.map(lambda y_, a: y_ + _cast(dt, y_) * a / 3, y, k1))
    k3 = func(
        t + dt * 2 / 3,
        jax.tree.map(lambda y_, a, b: y_ + _cast(dt, y_) * (-a / 3 + b), y, k1, k2),
    )
    k4 = func(
        t + dt, jax.tree.map(lambda y_, a, b, c: y_ + _cast(dt, y_) * (a - b + c), y, k1, k2, k3)
    )
    return jax.tree.map(
        lambda a, b, c, d: (a + 3 * b + 3 * c + d) * (_cast(dt, a) / 8), k1, k2, k3, k4
    )


def weighted_stage_sum(dt, weights, k: List[PyTree]) -> PyTree:
    """dt * sum_i weights[i] * k[i] over pytree stages."""
    return jax.tree.map(
        lambda *ks: _cast(dt, ks[0])
        * sum(w * k_ for w, k_ in zip(weights, ks) if _nonzero(w)),
        *k,
    )


def _nonzero(w) -> bool:
    return not (isinstance(w, (int, float)) and w == 0)
