"""Adaptive Runge-Kutta integration as a jittable state machine.

The reference drives adaptivity with Python-level `while` loops over eager
tensors (dopri5.py:85-92).  Here the same semantics — advance to each output
time with accept/reject adaptive steps, then evaluate dense output — are
expressed as `lax.scan` over output times around an inner step loop, so the
whole solve is one XLA computation that jits, vmaps (per-chain independent
step-size control) and shards.

Three inner-loop modes:
  - 'while'   (default): ONE `lax.while_loop` over solver steps for the
                whole solve; accepted steps emit the output times they
                crossed into a preallocated buffer.  Fastest, forward-mode
                differentiable (JVP of while_loop is supported), used by the
                continuous adjoint which never reverse-differentiates
                through solver internals.
  - 'while_scan': the same stepping as `lax.scan` over output times around
                an inner while loop per interval; identical results, kept
                as the reference structure for A/B timing.
  - 'bounded': a masked `lax.scan` over `max_steps_per_interval` iterations;
                reverse-mode differentiable, used for discrete
                backprop-through-the-solver (the reference's default autograd
                path through solver internals).

Parity targets: torchdiffeq/_impl/dopri5.py, tsit5.py, solvers.py:25-33.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..utils.pytree import PyTree, tree_where
from .interp import interp_evaluate, interp_fit
from .runge_kutta import (AdaptiveState, _cast as _cast_leaf,
                          runge_kutta_step, weighted_stage_sum)
from .step_control import (
    error_ratio,
    optimal_step_size,
    pi_step_size,
    select_initial_step,
)
from .tableaus import ButcherTableau, tsit5_interp_coeffs


@dataclasses.dataclass(frozen=True)
class AdaptiveConfig:
    rtol: float = 1e-7
    atol: float = 1e-9
    first_step: Optional[float] = None
    safety: float = 0.9
    ifactor: float = 10.0
    dfactor: float = 0.2
    max_num_steps: int = 2**20
    mode: str = "while"  # 'while' | 'while_scan' | 'bounded'
    max_steps_per_interval: int = 256  # only for 'bounded'
    # Kahan-compensated state carry: the low bits lost when committing each
    # step increment are accumulated and re-injected into the next step, so
    # long f32 integrations stop accumulating per-step rounding (~eps*|y|
    # per step otherwise).  Lets the error-ratio ulps floor drop from 32 to
    # 4, i.e. f32 TPU solves honestly resolve tolerances ~8x tighter.
    compensated: bool = False
    ulp_floor: Optional[float] = None  # default: 4 if compensated else 32
    # Step controller: "i" is the reference's memoryless controller
    # (misc.py:160-170, the parity default); "pi" opts into the
    # Gustafsson/Soderlind PI controller (step_control.pi_step_size) —
    # fewer rejections / lower NFE at the same accuracy, but step
    # decisions no longer match torchdiffeq.
    controller: str = "i"
    # Implicit (DIRK) solvers only: simplified-Newton iteration budget per
    # stage and the relative convergence threshold (Hairer & Wanner IV.8
    # recommend kappa in [1e-2, 1e-1]).  Ignored by explicit methods.
    newton_iters: int = 6
    newton_kappa: float = 0.1
    # Implicit solvers only: embedded error estimate treatment — "raw"
    # (default; sees Prothero-Robinson order reduction) or "shampine"
    # (M^{-1}-filtered; calmer on strong transients but blind to
    # quasi-static error at lam*h >> 1 — measurements in ode/dirk.py).
    error_filter: str = "raw"
    # Optional per-leaf error-norm weights (Python floats, same pytree
    # structure as the state); 0.0 removes a leaf from error control.
    # Used by odeint_adjoint's adjoint_options={"norm": "seminorm"} to
    # exclude accumulated parameter-gradient leaves from the backward
    # solve's step control (step_control.error_ratio docstring).
    norm_weights: Optional[PyTree] = None


# ---------------------------------------------------------------------------
# Dense output representations.
#
# dopri5: quartic polynomial coefficients fit from (y0, y1, y_mid, f0, f1)
#   with the DPS_C_MID midpoint weights (reference dopri5.py:39-45).
# tsit5:  the interval's (y0, k stages); evaluated with the Tsitouras
#   b_i(theta) polynomials (reference tsit5.py:30-48, with the y0-vs-f0 fix
#   noted in tableaus.tsit5_interp_coeffs).
# ---------------------------------------------------------------------------


def _quartic_interp_init(y0, f0):
    z = jax.tree.map(jnp.zeros_like, y0)
    return [z, z, z, z, y0]


def _quartic_interp_fit(func, tableau, y0, y1, k, t0, dt):
    y_mid = jax.tree.map(
        lambda y, inc: y + inc, y0, weighted_stage_sum(dt, tableau.c_mid, k)
    )
    return interp_fit(y0, y1, y_mid, k[0], k[-1], dt)


def _quartic_interp_eval(coeff, t0, t1, t):
    return interp_evaluate(coeff, t0, t1, t)


def _stages_interp_init(y0, f0):
    z = jax.tree.map(jnp.zeros_like, y0)
    return (y0, [z] * 7)


def _stages_interp_fit(func, tableau, y0, y1, k, t0, dt):
    return (y0, list(k))


def _stages_interp_eval(coeff, t0, t1, t):
    y0, k = coeff
    dt = t1 - t0
    denom = jnp.where(t1 == t0, jnp.ones_like(t1), t1 - t0)
    theta = jnp.where(t1 == t0, jnp.zeros_like(t), (t - t0) / denom)
    bs = tsit5_interp_coeffs(theta)
    return jax.tree.map(
        lambda y, *ks: y
        + jnp.asarray(dt).astype(y.dtype)
        * sum(b.astype(y.dtype) * k_ for b, k_ in zip(bs, ks)),
        y0,
        *k,
    )


def _hermite_interp_init(y0, f0):
    z = jax.tree.map(jnp.zeros_like, y0)
    return (y0, y0, z, z)


def _hermite_interp_fit(func, tableau, y0, y1, k, t0, dt):
    # cubic Hermite from the interval endpoints; k[0]/k[-1] are the
    # endpoint slopes (both available for the stiffly accurate DIRK
    # methods: f(t1, y1) is the last stage derivative)
    d0 = jax.tree.map(lambda f: jnp.asarray(dt).astype(f.dtype) * f, k[0])
    d1 = jax.tree.map(lambda f: jnp.asarray(dt).astype(f.dtype) * f, k[-1])
    return (y0, y1, d0, d1)


def _hermite_interp_eval(coeff, t0, t1, t):
    y0, y1, d0, d1 = coeff
    denom = jnp.where(t1 == t0, jnp.ones_like(t1), t1 - t0)
    th = jnp.where(t1 == t0, jnp.zeros_like(t), (t - t0) / denom)
    h00 = (1 + 2 * th) * (1 - th) ** 2
    h10 = th * (1 - th) ** 2
    h01 = th**2 * (3 - 2 * th)
    h11 = th**2 * (th - 1)
    return jax.tree.map(
        lambda a, b, da, db: h00.astype(a.dtype) * a
        + h10.astype(a.dtype) * da
        + h01.astype(a.dtype) * b
        + h11.astype(a.dtype) * db,
        y0, y1, d0, d1,
    )


def _dop853_interp_init(y0, f0):
    z = jax.tree.map(jnp.zeros_like, y0)
    return (y0, [z] * 7)


def _dop853_interp_fit(func, tableau, y0, y1, k, t0, dt):
    """Hairer's 7th-order dense output for DOP853 (dop853.f CONTD8).

    Three extra stages are evaluated at c in {0.1, 0.2, 7/9} of the step
    (so dense output costs 3 RHS evaluations per attempted step — counted
    in adaptive_step's NFE), then seven F coefficient trees are built:
    the first three from endpoint values/slopes, the last four from the
    published D-matrix contraction over all 16 stages.
    """
    from .tableaus import DOPRI8_DENSE

    ks = list(k)  # 13 FSAL stages; extended to 16 below
    for a_row, c in zip(DOPRI8_DENSE["a_extra"], DOPRI8_DENSE["c_extra"]):
        yi = jax.tree.map(
            lambda y, *kk: y + _cast_leaf(dt, y)
            * sum(a * k_ for a, k_ in zip(a_row, kk) if a != 0),
            y0,
            *ks,
        )
        ks.append(func(t0 + c * dt, yi))

    f_old, f_new = ks[0], ks[12]
    delta = jax.tree.map(lambda a, b: b - a, y0, y1)
    f0_list = [
        delta,
        jax.tree.map(lambda f, d: _cast_leaf(dt, f) * f - d, f_old, delta),
        jax.tree.map(
            lambda d, fo, fn: 2 * d - _cast_leaf(dt, d) * (fn + fo),
            delta, f_old, f_new,
        ),
    ]
    for d_row in DOPRI8_DENSE["d"]:
        f0_list.append(
            jax.tree.map(
                lambda *kk: _cast_leaf(dt, kk[0])
                * sum(dv * k_ for dv, k_ in zip(d_row, kk) if dv != 0),
                *ks,
            )
        )
    return (y0, f0_list)


def _dop853_interp_eval(coeff, t0, t1, t):
    y0, F = coeff
    denom = jnp.where(t1 == t0, jnp.ones_like(t1), t1 - t0)
    x = jnp.where(t1 == t0, jnp.zeros_like(t), (t - t0) / denom)
    # Alternating-Horner evaluation (dop853.f CONTD8 / the equivalent
    # scipy Dop853DenseOutput._call_impl recurrence):
    # y = y0 + x*(F0 + (1-x)*(F1 + x*(F2 + (1-x)*(F3 + x*(F4 + (1-x)*(F5 + x*F6))))))
    def leaf(y, *fs):
        xx = x.astype(y.dtype)
        acc = fs[6]
        for i, f in enumerate((fs[5], fs[4], fs[3], fs[2], fs[1], fs[0])):
            acc = f + acc * (xx if i % 2 == 0 else 1 - xx)
        return y + acc * xx

    return jax.tree.map(leaf, y0, *F)


_INTERP = {
    "quartic": (_quartic_interp_init, _quartic_interp_fit, _quartic_interp_eval),
    "stages": (_stages_interp_init, _stages_interp_fit, _stages_interp_eval),
    "hermite": (_hermite_interp_init, _hermite_interp_fit, _hermite_interp_eval),
    "dop853": (_dop853_interp_init, _dop853_interp_fit, _dop853_interp_eval),
}

# Extra RHS evaluations an interp fit itself spends per attempted step.
_INTERP_NFE = {"quartic": 0, "stages": 0, "hermite": 0, "dop853": 3}


def adaptive_step(func: Callable, state: AdaptiveState, tableau: ButcherTableau,
                  interp_kind: str, cfg: AdaptiveConfig) -> AdaptiveState:
    """One accept/reject adaptive RK step (reference dopri5.py:94-122).

    The step starts from the end of the last accepted step (state.y1 at
    state.t1) and either advances t1 by dt (accept) or shrinks dt (reject);
    all branching is `where`-based so rejected steps cost the same as
    accepted ones and vmapped chains stay in lockstep.
    """
    _, fit, _ = _INTERP[interp_kind]
    y0, f0, t0, dt, coeff = state.y1, state.f1, state.t1, state.dt, state.interp_coeff

    y1, f1, y1_error, y1_error_alt, k = runge_kutta_step(
        func, y0, f0, t0, dt, tableau)
    floor = cfg.ulp_floor if cfg.ulp_floor is not None else (
        4.0 if cfg.compensated else 32.0)
    ratio = error_ratio(y1_error, cfg.rtol, cfg.atol, y0, y1, floor,
                        cfg.norm_weights)
    if y1_error_alt is not None:
        # Composite 8(5,3) estimate (DOP853; Hairer & Wanner II.5): with
        # linear ratios e5/e3, err = e5^2/sqrt(e5^2 + 0.01 e3^2); in the
        # squared-ratio convention used throughout this module that is
        # r = r5^2/(r5 + 0.01 r3).  The damping makes the estimate scale
        # as O(h^8) so optimal_step_size's 1/order exponent is exact.
        ratio_alt = error_ratio(y1_error_alt, cfg.rtol, cfg.atol, y0, y1,
                                floor, cfg.norm_weights)
        denom = ratio + 0.01 * ratio_alt
        denom = jnp.maximum(denom, jnp.finfo(denom.dtype).tiny)
        ratio = ratio * ratio / denom
    accept = ratio <= 1.0

    comp_next = state.comp
    if cfg.compensated:
        # Re-commit the increment with the accumulated compensation folded
        # in, then recover this addition's lost low bits by fast-two-sum
        # (|y0| >> |increment| on any resolved step, so the branch-free
        # form is exact).  FSAL's f1 was evaluated at the uncompensated
        # y1 — an O(eps*|y|) perturbation, below the method error.
        dy = weighted_stage_sum(dt, tableau.c_sol, k)
        d_eff = jax.tree.map(lambda d, c: d + c, dy, state.comp)
        y1 = jax.tree.map(lambda y, d: y + d, y0, d_eff)
        comp1 = jax.tree.map(lambda d, s, y: d - (s - y), d_eff, y1, y0)
        comp_next = tree_where(accept, comp1, state.comp)

    y_next = tree_where(accept, y1, y0)
    f_next = tree_where(accept, f1, f0)
    t_next = jnp.where(accept, t0 + dt, t0)
    coeff_next = tree_where(accept, fit(func, tableau, y0, y1, k, t0, dt),
                            coeff)
    if cfg.controller not in ("i", "pi"):
        raise ValueError(
            f"unknown step controller {cfg.controller!r}; expected 'i' "
            "(reference parity) or 'pi' (Gustafsson)"
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
        nfe=state.nfe + tableau.nfe_per_step + _INTERP_NFE[interp_kind],
        n_accepted=state.n_accepted + accept.astype(state.n_accepted.dtype),
        n_rejected=state.n_rejected + (~accept).astype(state.n_rejected.dtype),
        comp=comp_next,
        err_prev=err_prev_next,
    )


def can_step(s: AdaptiveState):
    # Divergence guard: once the state/error goes non-finite every
    # step rejects, dt decays geometrically to NaN or exactly 0, and
    # no further iteration can make progress — without this guard a
    # diverged f32 solve spins out the full 2^20-step budget (for the
    # implicit solvers that is 2^20 LU factorizations; long enough
    # that the TPU runtime watchdog declares the worker dead).
    # reached_final_time=False reports the abort, as for budget
    # exhaustion.
    return jnp.isfinite(s.dt) & (s.dt > 0)


def init_adaptive_state(func: Callable, y0: PyTree, t0, tableau,
                        interp_kind: str, cfg: AdaptiveConfig) -> AdaptiveState:
    """Initial `AdaptiveState` at `t0` (shared by `integrate_adaptive` and
    the event-detection march in ode/events.py)."""
    init_interp, _, _ = _INTERP[interp_kind]
    f0 = func(t0, y0)
    if cfg.first_step is None:
        # order-1 matches the reference's hardcoded 4 for the 5(4) pairs
        # (dopri5.py:75) and scales the heuristic down for the low-order
        # tableaus instead of overshooting their first step.
        dt0 = select_initial_step(
            func, t0, y0, tableau.order - 1, cfg.rtol, cfg.atol, f0)
        nfe0 = jnp.asarray(2, jnp.int32)
    else:
        dt0 = jnp.asarray(cfg.first_step, t0.dtype)
        nfe0 = jnp.asarray(1, jnp.int32)

    return AdaptiveState(
        y1=y0,
        f1=f0,
        t0=t0,
        t1=t0,
        dt=dt0,
        interp_coeff=init_interp(y0, f0),
        nfe=nfe0,
        n_accepted=jnp.asarray(0, jnp.int32),
        n_rejected=jnp.asarray(0, jnp.int32),
        comp=jax.tree.map(jnp.zeros_like, y0) if cfg.compensated else None,
        err_prev=(jnp.ones((), dt0.dtype) if cfg.controller == "pi"
                  else None),
    )


def integrate_adaptive(func: Callable, y0: PyTree, ts: jax.Array,
                       tableau, interp_kind: str,
                       cfg: AdaptiveConfig,
                       step_impl: Callable = adaptive_step):
    """Integrate y' = func(t, y) emitting the solution at each time in `ts`.

    Returns (ys, stats) where ys stacks the solution along a new leading
    axis (ys[0] == y0) and stats carries NFE / step counts.

    `step_impl(func, state, tableau, interp_kind, cfg) -> state` selects
    the stepping engine: `adaptive_step` (explicit RK, the default) or
    `dirk.dirk_step` (implicit, with a DIRKTableau).
    """
    _, _, evaluate = _INTERP[interp_kind]

    t0 = ts[0]
    state0 = init_adaptive_state(func, y0, t0, tableau, interp_kind, cfg)

    def step_fn(s):
        return step_impl(func, s, tableau, interp_kind, cfg)

    _can_step = can_step

    if cfg.mode == "while":
        # Single while loop over solver steps; each accepted step emits
        # every output time it crossed into a preallocated buffer via an
        # inner while loop.  Identical step/NFE sequence to the
        # scan-over-output-times form (stepping never depends on the
        # output grid), but the loop machinery is entered once per solve
        # instead of once per output interval — ~1.5x on dense grids.
        T = ts.shape[0]
        out0 = jax.tree.map(
            lambda l: jnp.zeros((T,) + l.shape, l.dtype).at[0].set(l), y0
        )

        def cond(carry):
            s, idx, _ = carry
            budget = (s.n_accepted + s.n_rejected) < cfg.max_num_steps
            return (idx < T) & budget & _can_step(s)

        def body(carry):
            s, idx, out = carry
            s = step_fn(s)

            def emit_cond(c):
                i, _ = c
                return (i < T) & (ts[i] <= s.t1)

            def emit_body(c):
                i, out_ = c
                y = evaluate(s.interp_coeff, s.t0, s.t1, ts[i])
                out_ = jax.tree.map(
                    lambda o, yl: jax.lax.dynamic_update_index_in_dim(
                        o, yl.astype(o.dtype), i, 0), out_, y,
                )
                return i + 1, out_

            idx, out = jax.lax.while_loop(emit_cond, emit_body, (idx, out))
            return s, idx, out

        final_state, _, ys = jax.lax.while_loop(
            cond, body, (state0, jnp.asarray(1, jnp.int32), out0)
        )
        stats = {
            "nfe": final_state.nfe,
            "n_accepted": final_state.n_accepted,
            "n_rejected": final_state.n_rejected,
            "reached_final_time": final_state.t1 >= ts[-1],
        }
        return ys, stats

    def advance(state, next_t):
        if cfg.mode == "while_scan":
            def cond(s):
                in_flight = s.t1 < next_t
                budget = (s.n_accepted + s.n_rejected) < cfg.max_num_steps
                return in_flight & budget & _can_step(s)

            state = jax.lax.while_loop(cond, step_fn, state)
        elif cfg.mode == "bounded":
            def body(s, _):
                s = jax.lax.cond((s.t1 < next_t) & _can_step(s), step_fn,
                                 lambda s_: s_, s)
                return s, None

            state, _ = jax.lax.scan(
                body, state, None, length=cfg.max_steps_per_interval
            )
        else:
            raise ValueError(f"unknown adaptive mode: {cfg.mode!r}")
        y = evaluate(state.interp_coeff, state.t0, state.t1, next_t)
        return state, y

    final_state, ys_tail = jax.lax.scan(advance, state0, ts[1:])
    ys = jax.tree.map(
        lambda first, rest: jnp.concatenate([first[None], rest], axis=0), y0, ys_tail
    )
    stats = {
        "nfe": final_state.nfe,
        "n_accepted": final_state.n_accepted,
        "n_rejected": final_state.n_rejected,
        # True iff every requested output time was actually reached within
        # the step budget (replaces the reference's max_num_steps assert).
        "reached_final_time": final_state.t1 >= ts[-1],
    }
    return ys, stats
