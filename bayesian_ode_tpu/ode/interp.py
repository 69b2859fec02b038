"""Dense output: 4th-order polynomial interpolation within an accepted step.

Given values and derivatives at both interval endpoints and the value at the
midpoint, fit p(x) = a x^4 + b x^3 + c x^2 + d x + e on x = (t-t0)/(t1-t0) in
[0, 1].  Coefficients are stored as a 5-element list of state pytrees and
live in the adaptive loop carry.

Parity target: torchdiffeq/_impl/interp.py:5-65 (identical closed-form fit).
"""
from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from ..utils.pytree import PyTree


def interp_fit(y0: PyTree, y1: PyTree, y_mid: PyTree, f0: PyTree, f1: PyTree,
               dt) -> List[PyTree]:
    """Fit quartic coefficients [a, b, c, d, e] from endpoint/midpoint data."""
    def _dt(like):
        return jnp.asarray(dt).astype(like.dtype)

    a = jax.tree.map(
        lambda f0_, f1_, y0_, y1_, ym_: -2 * _dt(f0_) * f0_ + 2 * _dt(f0_) * f1_
        - 8 * y0_ - 8 * y1_ + 16 * ym_,
        f0, f1, y0, y1, y_mid,
    )
    b = jax.tree.map(
        lambda f0_, f1_, y0_, y1_, ym_: 5 * _dt(f0_) * f0_ - 3 * _dt(f0_) * f1_
        + 18 * y0_ + 14 * y1_ - 32 * ym_,
        f0, f1, y0, y1, y_mid,
    )
    c = jax.tree.map(
        lambda f0_, f1_, y0_, y1_, ym_: -4 * _dt(f0_) * f0_ + _dt(f0_) * f1_
        - 11 * y0_ - 5 * y1_ + 16 * ym_,
        f0, f1, y0, y1, y_mid,
    )
    d = jax.tree.map(lambda f0_: _dt(f0_) * f0_, f0)
    e = y0
    return [a, b, c, d, e]


def interp_evaluate(coefficients: List[PyTree], t0, t1, t) -> PyTree:
    """Evaluate the fitted quartic at time t in [t0, t1] (Horner form)."""
    # Degenerate zero-length intervals (before the first step is taken) only
    # arise when t == t0 == t1; evaluate at x = 0 there.  The denominator is
    # guarded *inside* the division so no NaN is produced for the masked
    # branch (a bare `where` would leak NaN cotangents through 0 * NaN).
    denom = jnp.where(t1 == t0, jnp.ones_like(t1), t1 - t0)
    x = jnp.where(t1 == t0, jnp.zeros_like(t), (t - t0) / denom)

    def horner(a, b, c, d, e):
        xc = x.astype(a.dtype)
        return (((a * xc + b) * xc + c) * xc + d) * xc + e

    return jax.tree.map(horner, *coefficients)
