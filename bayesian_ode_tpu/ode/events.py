"""Event-terminated integration: `odeint_event`.

Integrate dy/dt = func(t, y) from t0 until a scalar event function
g(t, y) first changes sign, and return the event time and state.  The
API mirrors upstream torchdiffeq's `odeint_event` (the vendored
reference predates it — /root/reference/torchdiffeq/_impl/odeint.py has
no event support), so migrating users of newer torchdiffeq stacks find
the name and semantics:

    event_t, ys = odeint_event(func, y0, t0, event_fn=g, ...)

with `ys` stacking [y(t0), y(event_t)] along a new leading axis.

TPU-first design, all in one XLA computation (jits / vmaps):

1. Detection: the shared adaptive state machine (ode/adaptive.py) marches
   in ONE `lax.while_loop`, stopping when an accepted step flips
   sign(g(t1, y1)) relative to sign(g(t0, y0)).  Rejected steps leave
   (t1, y1) unchanged, so re-evaluating g per attempted step is branch-free
   and cheap relative to the RHS stages.
2. Localization: fixed-count bisection on h(t) = g(t, interp(t)) over the
   crossing step's dense-output interpolant — enough iterations to reach
   a few time-ulps for the time dtype, data-independent trip count (no
   dynamic tolerance loop for XLA to choke on).
3. Differentiation: the implicit-function-theorem reroute (the same trick
   as torchdiffeq's ImplicitFnGradientRerouting): re-solve to the
   stop-gradiented event time through the caller's chosen
   `odeint_interface` (plain `odeint` for discrete backprop, or
   `odeint_adjoint`), then add the zero-valued correction terms

       event_t = t* - g(t*, y*) / (dg/dt)|_sg
       y_event = y* + f(t*, y*)|_sg * (event_t - t*)

   whose VALUES are a Newton polish of the bisection root (|g| is already
   at roundoff) but whose GRADIENTS carry the moving-boundary terms:
   d event_t = -(∂g/∂y · dy* + ∂g/∂θ) / (dg/dt) and
   d y_event = dy* + f · d event_t.

Even-crossing caveat (shared with torchdiffeq): an event entered AND left
within one accepted step leaves g's endpoint sign unchanged and is missed;
bound the step with `options={"first_step": ...}`/`max_num_steps` or a
stiffer tolerance if events can be that narrow.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..utils.pytree import PyTree
from .adaptive import (
    _INTERP,
    AdaptiveConfig,
    adaptive_step,
    can_step,
    init_adaptive_state,
)
from .odeint import _ADAPTIVE_OPTION_KEYS, odeint
from .tableaus import ADAPTIVE_HEUN, BOSH3, DOPRI5, DOPRI8, FEHLBERG2, TSIT5


def _method_triple(method: str):
    """(tableau, interp_kind, step_impl) for every adaptive method name."""
    table = {
        "dopri5": (DOPRI5, "quartic", adaptive_step),
        "dopri8": (DOPRI8, "dop853", adaptive_step),
        "tsit5": (TSIT5, "stages", adaptive_step),
        "bosh3": (BOSH3, "hermite", adaptive_step),
        "fehlberg2": (FEHLBERG2, "hermite", adaptive_step),
        "adaptive_heun": (ADAPTIVE_HEUN, "hermite", adaptive_step),
    }
    if method in table:
        return table[method]
    if method in ("sdirk4", "trbdf2"):
        from .dirk import DIRK_TABLEAUS, dirk_step

        return DIRK_TABLEAUS[method], "hermite", dirk_step
    raise ValueError(
        f"odeint_event needs an adaptive method with dense output, got "
        f"{method!r}; available: ['adaptive_heun', 'bosh3', 'dopri5', "
        "'dopri8', 'fehlberg2', 'sdirk4', 'trbdf2', 'tsit5']"
    )


def _sign(x):
    # jnp.sign maps 0 -> 0, so an exact zero of g registers as a sign
    # change against any nonzero initial sign, terminating the march.
    return jnp.sign(x)


def _march_to_event(func, y0, t0, event_fn, tableau, interp_kind, cfg,
                    step_impl, t_max):
    """One while-loop to the first accepted step whose endpoint flips
    sign(g).  Returns (state, g_end, sign0, found, stats)."""
    state0 = init_adaptive_state(func, y0, t0, tableau, interp_kind, cfg)
    g0 = jnp.asarray(event_fn(t0, y0))
    if g0.ndim != 0:
        raise ValueError(
            f"event_fn must return a scalar, got shape {g0.shape}"
        )
    sign0 = _sign(g0)
    # g(t0, y0) == 0 is an immediate event: sign0 = 0 would otherwise read
    # as "no crossing yet" and the march would run until g moves off zero.
    immediate = sign0 == 0

    def cond(carry):
        s, g = carry
        budget = (s.n_accepted + s.n_rejected) < cfg.max_num_steps
        no_event = _sign(g) == sign0
        ok = no_event & ~immediate & budget & can_step(s)
        if t_max is not None:
            ok = ok & (s.t1 < t_max)
        return ok

    def body(carry):
        s, _ = carry
        s = step_impl(func, s, tableau, interp_kind, cfg)
        return s, jnp.asarray(event_fn(s.t1, s.y1))

    state, g_end = jax.lax.while_loop(cond, body, (state0, g0))
    found = (_sign(g_end) != sign0) | immediate
    stats = {
        "nfe": state.nfe,
        "n_accepted": state.n_accepted,
        "n_rejected": state.n_rejected,
        "event_found": found,
    }
    return state, sign0, immediate, found, stats


def _bisect_event(event_fn, evaluate, state, sign0, n_iters):
    """Fixed-count bisection for the root of g(t, interp(t)) on the
    crossing interval [state.t0, state.t1].

    Keeps the invariant sign(g(lo)) == sign0, sign(g(hi)) != sign0; the
    returned midpoint is within (t1-t0)/2^n_iters of the first crossing
    the interpolant sees.
    """
    def body(_, bracket):
        lo, hi = bracket
        mid = 0.5 * (lo + hi)
        y_mid = evaluate(state.interp_coeff, state.t0, state.t1, mid)
        g = jnp.asarray(event_fn(mid, y_mid))
        before = _sign(g) == sign0
        return jnp.where(before, mid, lo), jnp.where(before, hi, mid)

    lo, hi = jax.lax.fori_loop(
        0, n_iters, body, (state.t0, state.t1)
    )
    return 0.5 * (lo + hi)


def odeint_event_with_stats(
    func: Callable,
    y0: PyTree,
    t0,
    *,
    event_fn: Callable,
    reverse_time: bool = False,
    odeint_interface: Callable = odeint,
    rtol: float = 1e-7,
    atol: float = 1e-9,
    method: Optional[str] = None,
    options: Optional[Dict[str, Any]] = None,
    t_max=None,
) -> Tuple[jax.Array, PyTree, Dict[str, jax.Array]]:
    """`odeint_event` returning also the detection-march statistics.

    stats: {'nfe', 'n_accepted', 'n_rejected', 'event_found'}.  When no
    sign change occurs within the step budget / `t_max`, event_found is
    False and event_t is NaN (under jit there is nothing to raise); the
    returned state is then the solution at the march's last accepted time.
    """
    method = method or "dopri5"
    options = dict(options or {})
    tableau, interp_kind, step_impl = _method_triple(method)
    # The march below is its own single while loop (cfg.mode is ignored
    # there); `options` flows UNCHANGED into the differentiable re-solve,
    # so the repo-wide reverse-mode convention applies to it: pass
    # options={"mode": "bounded"} for backprop through solver internals,
    # or odeint_interface=odeint_adjoint for the continuous adjoint.
    cfg = AdaptiveConfig(
        rtol=rtol,
        atol=atol,
        **{k: options[k] for k in _ADAPTIVE_OPTION_KEYS if k in options},
    )
    evaluate = _INTERP[interp_kind][2]

    t_dtype = jax.dtypes.canonicalize_dtype(jnp.float64)
    t0 = jnp.asarray(t0, t_dtype)
    if t0.ndim != 0:
        raise ValueError(f"t0 must be a scalar, got shape {t0.shape}")

    # Reverse time via the t -> -t trick (odeint.py:_check_and_canonicalize):
    # march s = -t forward with negated RHS and g~(s, y) = g(-s, y).
    if reverse_time:
        fwd_func = lambda s, y: jax.tree.map(jnp.negative, func(-s, y))
        fwd_event = lambda s, y: event_fn(-s, y)
        fwd_t0 = -t0
        fwd_t_max = None if t_max is None else -jnp.asarray(t_max, t_dtype)
    else:
        fwd_func, fwd_event, fwd_t0 = func, event_fn, t0
        fwd_t_max = None if t_max is None else jnp.asarray(t_max, t_dtype)

    # 1-2. Detect + localize, outside the differentiation path entirely:
    # the event time's gradient comes from the IFT reroute below, never
    # from the march (whose while_loop has no reverse rule anyway).
    march = lambda y: _march_to_event(
        fwd_func, y, fwd_t0, fwd_event, tableau, interp_kind, cfg,
        step_impl, fwd_t_max,
    )
    state, sign0, immediate, found, stats = march(jax.lax.stop_gradient(y0))
    n_iters = 60 if jnp.finfo(t_dtype).bits == 64 else 30
    t_star_fwd = _bisect_event(fwd_event, evaluate, state, sign0, n_iters)
    # Immediate event (g(t0,y0)==0): the bracket is degenerate; pin to t0.
    # No event: report NaN (documented; can't raise on traced data) and
    # fall back to the march's end time so the re-solve stays finite.
    t_star_fwd = jnp.where(immediate, fwd_t0,
                           jnp.where(found, t_star_fwd, state.t1))
    t_star = -t_star_fwd if reverse_time else t_star_fwd
    t_sg = jax.lax.stop_gradient(t_star)

    # 3. Differentiable values + IFT reroute, in ORIGINAL time.
    ts = jnp.stack([t0, t_sg])
    ys = odeint_interface(func, y0, ts, rtol=rtol, atol=atol, method=method,
                          options=options or None)
    y_star = jax.tree.map(lambda a: a[-1], ys)

    f_star = func(t_sg, y_star)
    ones_t = jnp.ones((), t_sg.dtype)
    g_val, dg_dt = jax.jvp(
        lambda t, y: jnp.asarray(event_fn(t, y)), (t_sg, y_star),
        (ones_t, f_star),
    )
    # Guard a grazing event (dg/dt ~ 0): the IFT is singular there; freeze
    # the correction instead of emitting inf gradients.
    dg_dt = jax.lax.stop_gradient(dg_dt)
    safe = jnp.abs(dg_dt) > jnp.finfo(dg_dt.dtype).tiny
    denom = jnp.where(safe, dg_dt, jnp.ones_like(dg_dt))
    shift = jnp.where(safe, -g_val / denom, jnp.zeros_like(g_val))
    event_t = t_sg + shift.astype(t_sg.dtype)
    f_sg = jax.lax.stop_gradient(f_star)
    y_event = jax.tree.map(
        lambda y, f: y + f * (event_t - t_sg).astype(y.dtype), y_star, f_sg
    )

    nan_t = jnp.asarray(jnp.nan, event_t.dtype)
    event_t = jnp.where(found, event_t, nan_t)
    ys = jax.tree.map(
        lambda a, ye: a.at[-1].set(ye.astype(a.dtype)), ys, y_event
    )
    return event_t, ys, stats


def odeint_event(func: Callable, y0: PyTree, t0, *, event_fn: Callable,
                 reverse_time: bool = False,
                 odeint_interface: Callable = odeint,
                 rtol: float = 1e-7, atol: float = 1e-9,
                 method: Optional[str] = None,
                 options: Optional[Dict[str, Any]] = None,
                 t_max=None) -> Tuple[jax.Array, PyTree]:
    """Integrate until `event_fn(t, y)` first changes sign.

    Args mirror upstream torchdiffeq's odeint_event: `t0` is a scalar
    start time, `event_fn(t, y) -> scalar` defines the event surface
    g = 0, `reverse_time` integrates toward decreasing t, and
    `odeint_interface` chooses the differentiable re-solve (plain
    `odeint` = discrete backprop, or `odeint_adjoint`).  Extra over
    torchdiffeq: `t_max` bounds the search horizon explicitly (otherwise
    the adaptive step budget `options={"max_num_steps": ...}` bounds it).

    Returns (event_t, ys) with ys stacking [y(t0), y(event_t)]; both are
    differentiable w.r.t. y0 / closed-over parameters of `func` and
    `event_fn` via the implicit function theorem.  event_t is NaN if no
    event occurs within the horizon.
    """
    event_t, ys, _ = odeint_event_with_stats(
        func, y0, t0, event_fn=event_fn, reverse_time=reverse_time,
        odeint_interface=odeint_interface, rtol=rtol, atol=atol,
        method=method, options=options, t_max=t_max,
    )
    return event_t, ys
