"""Continuous-adjoint gradients for `odeint` as a `jax.custom_vjp`.

Reference: torchdiffeq/_impl/adjoint.py.  The reference implements the
augmented adjoint ODE as a `torch.autograd.Function` whose backward loops
over output intervals i = T-1..1, re-integrating (y, a_y, a_t, a_theta)
backwards with inner `torch.autograd.grad` VJPs per RHS evaluation
(adjoint.py:22-102).  Here:

  - parameters are captured by `jax.closure_convert`, so any params the user
    closes over in `func` become explicit residual arguments with gradients
    (replaces the reference's nn.Module parameter harvesting,
    adjoint.py:107-133);
  - the interval loop is a `lax.scan` running in reverse over the saved
    observation states, each interval an adaptive (or fixed) solve of the
    augmented system with the time-reversal trick applied manually;
  - per-RHS VJPs are `jax.vjp` — no grad-mode juggling needed;
  - the forward and backward solves run the fast `while`-mode integrator,
    since the adjoint never reverse-differentiates through solver internals.

Defaults rtol=1e-6, atol=1e-12 match reference adjoint.py:105.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ..utils.pytree import PyTree, tree_dot, tree_zeros_like
from .odeint import SOLVERS


@dataclasses.dataclass(frozen=True)
class _AdjointConfig:
    rtol: float
    atol: float
    method: str
    options: tuple  # frozen dict items
    adjoint_rtol: float
    adjoint_atol: float
    adjoint_method: str
    adjoint_options: tuple

    def fw_options(self) -> Dict[str, Any]:
        return dict(self.options)

    def bw_options(self) -> Dict[str, Any]:
        return dict(self.adjoint_options)


def odeint_adjoint(func: Callable, y0: PyTree, t, rtol: float = 1e-6,
                   atol: float = 1e-12, method: Optional[str] = None,
                   options: Optional[Dict[str, Any]] = None,
                   adjoint_rtol: Optional[float] = None,
                   adjoint_atol: Optional[float] = None,
                   adjoint_method: Optional[str] = None,
                   adjoint_options: Optional[Dict[str, Any]] = None) -> PyTree:
    """`odeint` with gradients via the continuous adjoint ODE.

    `func(t, y)` may close over parameter pytrees; gradients flow to them.
    Same call signature/result as `odeint`; same defaults as reference
    `odeint_adjoint` (adjoint.py:105).
    """
    if options is not None and method is None:
        raise ValueError("cannot supply `options` without specifying `method`")
    method = method or "dopri5"
    if any(jnp.iscomplexobj(l) for l in jax.tree.leaves(y0)):
        # complex cotangents through the custom_vjp would need a conjugation
        # convention; the forward path (odeint) supports complex states and
        # discrete backprop via options={"mode": "bounded"} works through
        # its view-as-real boundary (_complex_to_real).
        raise NotImplementedError(
            "odeint_adjoint does not support complex states; use odeint "
            "(complex handled view-as-real) with options={'mode': 'bounded'} "
            "for reverse-mode gradients"
        )
    t = jnp.asarray(t, jax.dtypes.canonicalize_dtype(jnp.float64))

    reverse = False
    if t.shape[0] >= 2:
        try:
            reverse = bool(t[1] < t[0])
        except jax.errors.TracerBoolConversionError:
            # Traced time (inside jit/vmap): direction can't be inspected;
            # increasing t is assumed, as in odeint.
            reverse = False
    if reverse:
        # Decreasing time: negate outside the custom_vjp so the ts cotangent
        # picks up the sign flip through tracing.
        base = func
        func = lambda s, y: jax.tree.map(jnp.negative, base(-s, y))
        t = -t

    cfg = _AdjointConfig(
        rtol=float(rtol),
        atol=float(atol),
        method=method,
        options=tuple(sorted((options or {}).items())),
        adjoint_rtol=float(adjoint_rtol if adjoint_rtol is not None else rtol),
        adjoint_atol=float(adjoint_atol if adjoint_atol is not None else atol),
        adjoint_method=adjoint_method or method,
        adjoint_options=tuple(
            sorted((adjoint_options if adjoint_options is not None else options or {}).items())
        ),
    )

    # Lift closure-captured parameters into explicit arguments.
    converted, consts = jax.closure_convert(lambda t_, y_: func(t_, y_), t[0], y0)
    return _odeint_adj(converted, cfg, y0, t, *consts)


def _solve(func, y0, ts, rtol, atol, method, options):
    ys, _ = SOLVERS[method](func, y0, ts, rtol, atol, options)
    return ys


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _odeint_adj(func, cfg: _AdjointConfig, y0, ts, *params):
    return _solve(
        lambda t, y: func(t, y, *params), y0, ts, cfg.rtol, cfg.atol, cfg.method,
        cfg.fw_options(),
    )


def _odeint_adj_fwd(func, cfg, y0, ts, *params):
    ys = _odeint_adj(func, cfg, y0, ts, *params)
    return ys, (ys, ts, params)


def _odeint_adj_bwd(func, cfg, residuals, grad_ys):
    ys, ts, params = residuals
    T = ts.shape[0]

    def f_apply(t, y):
        return func(t, y, *params)

    def augmented_dynamics(t, aug):
        # (y, a_y, a_t, a_params) dynamics; cotangent is -a_y as in
        # reference augmented_dynamics (adjoint.py:33-56).
        y, a_y, _, _ = aug
        f_eval, vjp = jax.vjp(lambda t_, y_, p_: func(t_, y_, *p_), t, y, params)
        neg_ay = jax.tree.map(jnp.negative, a_y)
        vjp_t, vjp_y, vjp_params = vjp(f_eval_cotangent(f_eval, neg_ay))
        return (f_eval, vjp_y, vjp_t, vjp_params)

    def f_eval_cotangent(f_eval, neg_ay):
        # Cotangent pytree must match func output structure.
        return neg_ay

    def backward_interval(aug0, t_hi, t_lo):
        """Integrate the augmented system from t_hi down to t_lo (manual
        time-reversal; equivalent to reference's odeint over [t_i, t_{i-1}],
        adjoint.py:81-84)."""
        rev = lambda s, aug: jax.tree.map(jnp.negative, augmented_dynamics(-s, aug))
        span = jnp.stack([-t_hi, -t_lo])
        bw_opts = cfg.bw_options()
        norm = bw_opts.pop("norm", None)
        if norm == "seminorm":
            # Upstream torchdiffeq's adjoint seminorm (Kidger et al.,
            # "Hey, that's not an ODE"): the accumulated parameter
            # gradients a_p are plain integrals of the already
            # error-controlled (y, a_y) — excluding them from the
            # backward solve's error norm saves steps without touching
            # the controlled components' accuracy.
            y_i, a_y, a_t, a_p = aug0
            bw_opts["norm_weights"] = (
                jax.tree.map(lambda _: 1.0, y_i),
                jax.tree.map(lambda _: 1.0, a_y),
                1.0,
                jax.tree.map(lambda _: 0.0, a_p),
            )
        elif norm is not None:
            raise ValueError(
                f"unknown adjoint norm {norm!r}; expected 'seminorm'"
            )
        out = _solve(
            rev, aug0, span, cfg.adjoint_rtol, cfg.adjoint_atol,
            cfg.adjoint_method, bw_opts,
        )
        return jax.tree.map(lambda x: x[-1], out)

    a_y0 = jax.tree.map(lambda g: g[-1], grad_ys)
    a_t0 = jnp.zeros((), ts.dtype)
    a_p0 = tree_zeros_like(params)

    def body(carry, i):
        a_y, a_t, a_p = carry
        y_i = jax.tree.map(lambda a: a[i], ys)
        g_i = jax.tree.map(lambda a: a[i], grad_ys)
        g_im1 = jax.tree.map(lambda a: a[i - 1], grad_ys)
        t_i = ts[i]
        t_im1 = ts[i - 1]

        # Gradient w.r.t. the observation time t_i (adjoint.py:70-75).
        f_i = f_apply(t_i, y_i)
        dLd_t = tree_dot(f_i, g_i).astype(ts.dtype)
        a_t = a_t - dLd_t

        aug0 = (y_i, a_y, a_t, a_p)
        _, a_y, a_t, a_p = backward_interval(aug0, t_i, t_im1)
        a_y = jax.tree.map(lambda a, g: a + g, a_y, g_im1)
        return (a_y, a_t, a_p), dLd_t

    idxs = jnp.arange(T - 1, 0, -1)
    (a_y, a_t, a_p), dLd_ts = jax.lax.scan(body, (a_y0, a_t0, a_p0), idxs)

    # time_vjps assembled as [a_t_final, dLd_t(1), ..., dLd_t(T-1)]
    # (reference adjoint.py:100-101).
    t_vjps = jnp.concatenate([a_t[None], dLd_ts[::-1]])
    return (a_y, t_vjps) + tuple(a_p)


_odeint_adj.defvjp(_odeint_adj_fwd, _odeint_adj_bwd)
