"""TPU-native fixed-grid SDE solvers: one `lax.scan` per trajectory.

Beyond the vendored reference: its solver stack is ODE-only (SURVEY.md
§2.1), but the nonparametric-ODE lineage it replicates explicitly carries
an SDE variant — the npde TF reference mentions NPSDE drift+diffusion
models (reference notebooks/npde_tensorflow.ipynb) — and upstream
torchdiffeq's sibling library (torchsde) is the de-facto companion.  This
module provides the diffusion half TPU-natively:

    ys = sdeint(drift, diffusion, y0, ts, key, method=..., options=...)

- `drift(t, y) -> dy/dt` and `diffusion(t, y) -> g` over an arbitrary
  pytree state `y`, exactly like `odeint`'s RHS contract;
- the whole path is ONE `lax.scan` over a static grid (XLA unrolls
  nothing; reverse-mode differentiates the scan directly, with
  `options={"checkpoint": True}` rematerializing each step);
- Brownian increments are drawn inside the scan from a per-step key
  split (bit-reproducible for a given `key`, independent of batch
  shape), or supplied explicitly via `options={"dW": ...}` — that is how
  the convergence tests refine one Brownian path across resolutions and
  how identical paths are fed to different schemes;
- batching is the state's own leading axes (elementwise noise) and/or
  `vmap`; chains/particles scale exactly like the ODE stack.

Methods
-------
- "euler_maruyama": Ito; strong order 0.5, weak order 1.
- "milstein": Ito with the diagonal-noise Milstein correction
  0.5 * (dg·g)(y) * (dW^2 - dt); strong order 1.0 when the diffusion is
  elementwise (g_i depends on y_i only — GBM/CIR-style) or commutative.
  The correction uses jvp(g, y, g), which equals g_i ∂g_i/∂y_i exactly in
  the elementwise case; for genuinely coupled diagonal noise the missing
  cross terms involve Levy areas no fixed-grid scheme sees.
- "heun": Stratonovich predictor-corrector (drift AND diffusion
  trapezoidal); converges to the STRATONOVICH solution (strong 0.5
  general / 1.0 commutative, weak 1).

Noise types
-----------
- "diagonal" (default): `diffusion` returns a pytree shaped like `y`;
  every element carries its own Brownian increment.  Additive noise is
  the special case where g ignores y (the Milstein correction then
  vanishes identically).
- "general": single-array states (..., D) with g returning (..., D, M)
  against an M-dimensional Brownian motion (..., M); Euler-Maruyama and
  Heun only (Milstein would need Levy-area simulation).

Only increasing, CONCRETE time grids are supported: an SDE path is
refined by `options={"substeps": k}` (each output interval integrates k
equal internal steps — no interpolation between grid points, which would
be a biased bridge), and the grid lengths are static shapes.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.pytree import PyTree

__all__ = ["sdeint", "SDE_METHODS"]


def _em_step(drift, diffusion, noise_type, t0, t1, dt, y, dW):
    f0 = drift(t0, y)
    g0 = diffusion(t0, y)
    gdW = _apply_noise(g0, dW, noise_type)
    return jax.tree.map(
        lambda y_, f_, n_: y_ + jnp.asarray(dt, y_.dtype) * f_ + n_,
        y, f0, gdW)


def _milstein_step(drift, diffusion, noise_type, t0, t1, dt, y, dW):
    if noise_type != "diagonal":
        raise ValueError(
            "milstein supports noise_type='diagonal' only (general noise "
            "needs Levy-area simulation)")
    f0 = drift(t0, y)
    g_fn = lambda yy: diffusion(t0, yy)
    g0, dg_g = jax.jvp(g_fn, (y,), (diffusion(t0, y),))

    def upd(y_, f_, g_, dgg_, dw_):
        dt_ = jnp.asarray(dt, y_.dtype)
        return (y_ + dt_ * f_ + g_ * dw_
                + 0.5 * dgg_ * (dw_ * dw_ - dt_))

    return jax.tree.map(upd, y, f0, g0, dg_g, dW)


def _heun_step(drift, diffusion, noise_type, t0, t1, dt, y, dW):
    f0 = drift(t0, y)
    g0 = diffusion(t0, y)
    g0dW = _apply_noise(g0, dW, noise_type)
    y_pred = jax.tree.map(
        lambda y_, f_, n_: y_ + jnp.asarray(dt, y_.dtype) * f_ + n_,
        y, f0, g0dW)
    f1 = drift(t1, y_pred)
    g1dW = _apply_noise(diffusion(t1, y_pred), dW, noise_type)
    return jax.tree.map(
        lambda y_, fa, fb, na, nb:
            y_ + jnp.asarray(dt, y_.dtype) * (fa + fb) / 2 + (na + nb) / 2,
        y, f0, f1, g0dW, g1dW)


SDE_METHODS: Dict[str, Callable] = {
    "euler_maruyama": _em_step,
    "milstein": _milstein_step,
    "heun": _heun_step,
    "reversible_heun": None,  # aux-carry method, dispatched in sdeint()
}


def _apply_noise(g: PyTree, dW: PyTree, noise_type: str) -> PyTree:
    """g · dW per leaf: elementwise for diagonal noise, a matvec over the
    trailing noise axis for general noise."""
    if noise_type == "diagonal":
        return jax.tree.map(lambda g_, w_: g_ * w_.astype(g_.dtype), g, dW)
    return jax.tree.map(
        lambda g_, w_: jnp.einsum("...dm,...m->...d", g_, w_.astype(g_.dtype)),
        g, dW)


def _noise_template(y0: PyTree, g0: PyTree, noise_type: str) -> PyTree:
    """Zero pytree shaped like one step's Brownian increment."""
    if noise_type == "diagonal":
        return jax.tree.map(jnp.zeros_like, y0)
    # general: leaf (..., D, M) -> increment (..., M)
    def one(y_, g_):
        if g_.ndim != y_.ndim + 1 or g_.shape[:-1] != y_.shape:
            raise ValueError(
                f"general-noise diffusion must map state (..., D) to "
                f"(..., D, M); got state {y_.shape} vs g {g_.shape}")
        return jnp.zeros(y_.shape[:-1] + (g_.shape[-1],), y_.dtype)
    return jax.tree.map(one, y0, g0)


def _host_grid(ts, substeps: int):
    """(grid, out_index) on the host: `substeps` equal internal steps per
    output interval; out_index[k] is the grid slot of ts[k]."""
    ts = np.asarray(ts, dtype=np.float64)
    if ts.ndim != 1 or ts.shape[0] < 2:
        raise ValueError(f"ts must be 1-D with >= 2 entries, got {ts.shape}")
    if not np.all(np.diff(ts) > 0):
        raise ValueError("sdeint needs strictly increasing ts (SDE paths "
                         "have no time-reversal trick)")
    if substeps < 1:
        raise ValueError(f"substeps must be >= 1, got {substeps}")
    pieces = [np.asarray([ts[0]])]
    for a, b in zip(ts[:-1], ts[1:]):
        pieces.append(np.linspace(a, b, substeps + 1)[1:])
    grid = np.concatenate(pieces)
    out_index = np.arange(ts.shape[0]) * substeps
    return grid, out_index


def sdeint(drift: Callable, diffusion: Callable, y0: PyTree, ts, key,
           method: str = "euler_maruyama", noise_type: str = "diagonal",
           options: Optional[Dict[str, Any]] = None) -> PyTree:
    """Integrate dy = drift dt + diffusion dW from y(ts[0]) = y0, returning
    the path at `ts` stacked on a new leading axis (odeint's contract).

    options:
      substeps (int): internal steps per output interval (default 1).
      dW: pytree of PRE-DRAWN Brownian increments, each leaf stacked to
          (n_steps, *increment.shape) with n_steps = (len(ts)-1)*substeps;
          overrides `key` (which may then be None).  Increments must have
          variance dt of the INTERNAL grid.
      checkpoint (bool): rematerialize each step under reverse-mode AD
          (memory ~O(1) in path length instead of O(n_steps)).
    """
    options = dict(options or {})
    substeps = int(options.pop("substeps", 1))
    dW_user = options.pop("dW", None)
    use_ckpt = bool(options.pop("checkpoint", False))
    if options:
        raise ValueError(f"unknown sdeint options: {sorted(options)}")
    if method not in SDE_METHODS:
        raise ValueError(
            f"unknown SDE method {method!r}; available: {sorted(SDE_METHODS)}")
    if noise_type not in ("diagonal", "general"):
        raise ValueError(f"unknown noise_type {noise_type!r}")
    if method == "milstein" and noise_type != "diagonal":
        raise ValueError(
            "milstein supports noise_type='diagonal' only (general noise "
            "needs Levy-area simulation)")
    step = SDE_METHODS[method]
    if isinstance(ts, jax.core.Tracer):
        raise ValueError("sdeint needs concrete (non-traced) ts: the grid "
                         "length is a static shape")

    grid, out_index = _host_grid(ts, substeps)
    n_steps = grid.shape[0] - 1
    t_lo = jnp.asarray(grid[:-1])
    t_hi = jnp.asarray(grid[1:])
    dts = jnp.asarray(np.diff(grid))

    g0 = diffusion(jnp.asarray(grid[0]), y0)
    w_tmpl = _noise_template(y0, g0, noise_type)
    w_leaves, w_tdef = jax.tree.flatten(w_tmpl)

    if dW_user is not None:
        dW_leaves = w_tdef.flatten_up_to(dW_user)
        for dw, w in zip(dW_leaves, w_leaves):
            if dw.shape != (n_steps,) + w.shape:
                raise ValueError(
                    f"dW leaf shape {dw.shape} != (n_steps={n_steps}, "
                    f"*increment {w.shape})")
        draw = None
    else:
        if key is None:
            raise ValueError("sdeint needs `key` (or options={'dW': ...})")
        keys = jax.random.split(key, n_steps)

        def draw(k, dt):
            ks = jax.random.split(k, len(w_leaves))
            return w_tdef.unflatten([
                jax.random.normal(kk, w.shape, w.dtype)
                * jnp.sqrt(dt).astype(w.dtype)
                for kk, w in zip(ks, w_leaves)
            ])

    if method == "reversible_heun":
        # Kidger-Foster-Li-Lyons 2021 (arXiv:2105.13493): Stratonovich,
        # strong order 0.5 (1.0 commutative), ONE drift+diffusion eval per
        # step (cached in the carry), and the step map (y, yhat) ->
        # (y1, yhat1) is algebraically invertible — the basis of the
        # O(1)-memory reversible adjoint in sde/adjoint.py.
        def body(carry, x):
            y, yh, f, g = carry
            if draw is None:
                t0, t1, dt, dW = x
            else:
                t0, t1, dt, k = x
                dW = draw(k, dt)
            gdW = _apply_noise(g, dW, noise_type)
            yh1 = jax.tree.map(
                lambda y_, yh_, f_, n_:
                    2.0 * y_ - yh_ + jnp.asarray(dt, y_.dtype) * f_ + n_,
                y, yh, f, gdW)
            f1 = drift(t1, yh1)
            g1 = diffusion(t1, yh1)
            g1dW = _apply_noise(g1, dW, noise_type)
            y1 = jax.tree.map(
                lambda y_, fa, fb, na, nb:
                    y_ + jnp.asarray(dt, y_.dtype) * (fa + fb) / 2
                    + (na + nb) / 2,
                y, f, f1, gdW, g1dW)
            return (y1, yh1, f1, g1), y1

        if use_ckpt:
            body = jax.checkpoint(body)
        t0_arr = jnp.asarray(grid[0])
        carry0 = (y0, y0, drift(t0_arr, y0), diffusion(t0_arr, y0))
        xs = (t_lo, t_hi, dts, dW_user if draw is None else keys)
        _, ys_tail = jax.lax.scan(body, carry0, xs)
        ys_grid = jax.tree.map(
            lambda first, rest: jnp.concatenate([first[None], rest], axis=0),
            y0, ys_tail)
        idx = jnp.asarray(out_index)
        return jax.tree.map(lambda y: y[idx], ys_grid)

    def body(y, x):
        if draw is None:
            t0, t1, dt, dW = x
        else:
            t0, t1, dt, k = x
            dW = draw(k, dt)
        y1 = step(drift, diffusion, noise_type, t0, t1, dt, y, dW)
        return y1, y1

    if use_ckpt:
        body = jax.checkpoint(body)

    xs = (t_lo, t_hi, dts,
          dW_user if draw is None else keys)
    _, ys_tail = jax.lax.scan(body, y0, xs)
    ys_grid = jax.tree.map(
        lambda first, rest: jnp.concatenate([first[None], rest], axis=0),
        y0, ys_tail)
    idx = jnp.asarray(out_index)
    return jax.tree.map(lambda y: y[idx], ys_grid)
