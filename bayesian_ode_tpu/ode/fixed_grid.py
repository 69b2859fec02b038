"""Fixed-grid solvers (euler / midpoint / rk4) as `lax.scan` over the grid.

The reference steps these with a Python loop and interleaves linear
interpolation onto requested output times (solvers.py:79-108).  Here the
whole trajectory is one `scan` (fully unrolled into XLA, reverse-mode
differentiable for free), and when a custom `step_size` grid is used the
output times are gathered from the grid solution with a vectorized linear
interpolation.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.pytree import PyTree
from .runge_kutta import rk4_alt_step


def _cast(c, like):
    return jnp.asarray(c).astype(like.dtype)


def euler_step(func, t, dt, y):
    return jax.tree.map(lambda f_: _cast(dt, f_) * f_, func(t, y)), 1


def midpoint_step(func, t, dt, y):
    y_mid = jax.tree.map(lambda y_, f_: y_ + f_ * _cast(dt, f_) / 2, y, func(t, y))
    return jax.tree.map(lambda f_: _cast(dt, f_) * f_, func(t + dt / 2, y_mid)), 2


def rk4_step_fn(func, t, dt, y):
    # The reference's RK4 uses the 3/8-rule variant (fixed_grid.py:26-33).
    return rk4_alt_step(func, t, dt, y), 4


STEP_FUNCS = {
    "euler": euler_step,
    "midpoint": midpoint_step,
    "rk4": rk4_step_fn,
}

# Symplectic steppers for (q, p) separable-Hamiltonian states share the
# fixed-grid scaffolding (ode/symplectic.py documents the contract).
from .symplectic import SYMPLECTIC_STEP_FUNCS  # noqa: E402

STEP_FUNCS.update(SYMPLECTIC_STEP_FUNCS)


def _build_grid(ts, step_size):
    """Uniform grid from t[0] with the given step, clamped to end at t[-1].

    Mirrors solvers.py:60-71.  Requires concrete (non-traced) endpoint times
    because the grid length is a static shape.
    """
    try:
        # Read the endpoints on the HOST: inside a jit/scan trace even
        # ops on concrete closure arrays get staged, so float(ts[0])
        # would raise for perfectly concrete times.
        ts_host = np.asarray(ts)
    except Exception as e:  # genuinely traced times
        raise ValueError(
            "options={'step_size': ...} builds a static-length grid and "
            "needs concrete (non-traced) endpoint times; pass t as a "
            "constant (closure/numpy array), or drop step_size to step "
            "on the output times directly"
        ) from e
    t_start = float(ts_host[0])
    t_end = float(ts_host[-1])
    niters = int(np.ceil((t_end - t_start) / step_size + 1))
    grid = np.arange(niters) * step_size + t_start
    if grid[-1] > t_end:
        grid[-1] = t_end
    return jnp.asarray(grid, dtype=jnp.result_type(ts))


def _linear_interp_onto(ts, grid, ys_grid: PyTree) -> PyTree:
    """Linearly interpolate the grid solution onto requested output times."""
    idx = jnp.clip(jnp.searchsorted(grid, ts, side="right") - 1, 0, grid.shape[0] - 2)
    t0 = grid[idx]
    t1 = grid[idx + 1]
    w = ((ts - t0) / (t1 - t0)).astype(ts.dtype)

    def interp_leaf(y):
        y0 = y[idx]
        y1 = y[idx + 1]
        wc = w.reshape(w.shape + (1,) * (y0.ndim - 1)).astype(y0.dtype)
        return y0 + wc * (y1 - y0)

    return jax.tree.map(interp_leaf, ys_grid)


def integrate_fixed_grid(func: Callable, y0: PyTree, ts: jax.Array, method: str,
                         step_size: Optional[float] = None,
                         compensated: bool = False,
                         host_ts=None):
    """Integrate on a fixed grid, returning (ys at `ts`, stats).

    compensated=True carries the Kahan compensation of each `y += dy`
    (the step functions return increments, so fast-two-sum applies
    directly) — long f32 grids stop accumulating per-step rounding.

    `host_ts` (numpy, optional) is the concrete host-side copy of `ts`
    that odeint's canonicalization stashes (`options["_t_host"]`): the
    static-length grid builder reads its endpoints from it so
    `step_size` keeps working when the device `ts` was produced inside
    a jit trace.
    """
    step = STEP_FUNCS[method]

    grid = ts if step_size is None else _build_grid(
        ts if host_ts is None else host_ts, step_size)

    def body(carry, t01):
        y, comp = carry
        t0, t1 = t01
        dy, evals = step(func, t0, t1 - t0, y)
        if compensated:
            d_eff = jax.tree.map(lambda d, c: d + c, dy, comp)
            y1 = jax.tree.map(lambda a, d: a + d, y, d_eff)
            comp = jax.tree.map(lambda d, s, a: d - (s - a), d_eff, y1, y)
        else:
            y1 = jax.tree.map(lambda a, b: a + b, y, dy)
        return (y1, comp), (y1, evals)

    comp0 = jax.tree.map(jnp.zeros_like, y0) if compensated else None
    t_pairs = (grid[:-1], grid[1:])
    _, (ys_tail, evals) = jax.lax.scan(body, (y0, comp0), t_pairs)
    ys_grid = jax.tree.map(
        lambda first, rest: jnp.concatenate([first[None], rest], axis=0), y0, ys_tail
    )

    if step_size is None:
        ys = ys_grid
    else:
        ys = _linear_interp_onto(ts, grid, ys_grid)

    stats = {
        "nfe": jnp.sum(evals).astype(jnp.int32),
        "n_accepted": jnp.asarray(grid.shape[0] - 1, jnp.int32),
        "n_rejected": jnp.asarray(0, jnp.int32),
        "reached_final_time": jnp.asarray(True),
    }
    return ys, stats
