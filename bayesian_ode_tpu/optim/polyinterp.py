"""minFunc-style polynomial interpolation for line searches (jittable).

Reference: optims/LBFGS.py:22-151 (`polyinterp`, a port of Mark Schmidt's
minFunc polyinterp.m).  The reference dispatches on the number of points
and which (f, g) entries are known (NaN-marked), with three live cases:

  - two points, gradient at one  -> closed-form quadratic minimizer
    (LBFGS.py:61-76),
  - two points, gradients at both -> closed-form cubic minimizer with the
    d1/d2 discriminant, bisection when the discriminant is negative
    (LBFGS.py:78-91),
  - otherwise -> fit the interpolating polynomial by a linear solve, test
    its critical points plus the bounds, default to bisection
    (LBFGS.py:93-149); the Armijo search reaches this path with three
    function values and one gradient, i.e. a cubic (LBFGS.py:664-665).

In the reference the NaN pattern is runtime data; under jit the pattern
is static at each call site, so the three cases are exposed as separate
pure functions.  All of them clamp into [lo, hi] and fall back to
bisection (lo+hi)/2 on degenerate or non-finite input, exactly as the
reference does.  Scalars in, scalar out; everything is `jnp.where`-based
so the functions vmap/jit cleanly inside `lax.while_loop` line searches.
"""
from __future__ import annotations

import jax.numpy as jnp


def _safeguard(x_sol, lo, hi):
    """Clamp into [lo, hi]; bisection on non-finite.

    Deliberate deviation: the reference clamps with np.minimum/np.maximum
    (LBFGS.py:75, 90), which PROPAGATE NaN — a degenerate interpolation
    (0/0, or the negative cubic discriminant below, whose `np.isreal(d2)`
    guard at LBFGS.py:85 never fires because NaN is a real float) leaks
    NaN into the step length and past the Wolfe safeguards.  Falling back
    to bisection is minFunc's own intent for invalid critical points."""
    mid = 0.5 * (lo + hi)
    x_sol = jnp.where(jnp.isfinite(x_sol), x_sol, mid)
    return jnp.clip(x_sol, lo, hi)


def quad_min(x1, f1, g1, x2, f2, lo, hi):
    """Minimizer of the quadratic through (x1, f1) with slope g1 at x1 and
    (x2, f2).  LBFGS.py:61-76 (the x1 == 0 special case there is this
    same formula algebraically; like the reference, a concave model's
    stationary point is simply clamped into [lo, hi])."""
    dx = x1 - x2
    dxs = jnp.where(dx == 0, 1.0, dx)
    a = -(f1 - f2 - g1 * dxs) / (dxs * dxs)
    x_sol = x1 - g1 / jnp.where(a == 0, jnp.inf, 2.0 * a)
    x_sol = jnp.where(dx == 0, jnp.nan, x_sol)
    return _safeguard(x_sol, lo, hi)


def cubic_min(x1, f1, g1, x2, f2, g2, lo, hi):
    """Minimizer of the cubic matching (f, g) at both points; bisection
    when the discriminant goes negative (the reference's intended
    `np.isreal(d2)` branch, LBFGS.py:78-91 — see _safeguard for why it
    needs fixing here)."""
    dx = x1 - x2
    dxs = jnp.where(dx == 0, 1.0, dx)
    d1 = g1 + g2 - 3.0 * (f1 - f2) / dxs
    disc = d1 * d1 - g1 * g2
    d2 = jnp.sqrt(jnp.maximum(disc, 0.0))
    denom = g2 - g1 + 2.0 * d2
    x_sol = x2 - (x2 - x1) * (g2 + d2 - d1) / jnp.where(
        denom == 0, jnp.inf, denom)
    x_sol = jnp.where((disc >= 0) & (dx != 0), x_sol, jnp.nan)
    return _safeguard(x_sol, lo, hi)


def cubic_min_3pt(x1, f1, g1, x2, f2, x3, f3, lo, hi):
    """Minimizer of the cubic through three function values and the
    gradient at x1 — the reference's general linear-solve path with
    critical-point testing (LBFGS.py:93-149), reached by the Armijo
    search from its third backtrack on (LBFGS.py:664-665).

    Fits c[0] x^3 + c[1] x^2 + c[2] x + c[3], then evaluates the cubic at
    { its two critical points, lo, hi, x1, x2, x3 } (in-bounds only) and
    returns the argmin, defaulting to bisection when nothing qualifies
    (singular system -> NaN coefficients -> every candidate disqualifies,
    matching the reference's rank check)."""
    ones = jnp.ones_like(x1)
    A = jnp.stack([
        jnp.stack([x1 ** 3, x1 ** 2, x1, ones]),
        jnp.stack([x2 ** 3, x2 ** 2, x2, ones]),
        jnp.stack([x3 ** 3, x3 ** 2, x3, ones]),
        jnp.stack([3.0 * x1 ** 2, 2.0 * x1, ones, jnp.zeros_like(x1)]),
    ])
    b = jnp.stack([f1, f2, f3, g1])
    c = jnp.linalg.solve(A, b)

    # critical points: roots of 3 c0 x^2 + 2 c1 x + c2
    qa, qb, qc = 3.0 * c[0], 2.0 * c[1], c[2]
    disc = qb * qb - 4.0 * qa * qc
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    qa_s = jnp.where(qa == 0, jnp.inf, 2.0 * qa)
    r1 = (-qb + sq) / qa_s
    r2 = (-qb - sq) / qa_s
    # quadratic fallback root when the cubic coefficient vanishes
    r_quad = -qc / jnp.where(qb == 0, jnp.inf, qb)
    r1 = jnp.where(qa == 0, r_quad, jnp.where(disc >= 0, r1, jnp.nan))
    r2 = jnp.where((qa != 0) & (disc >= 0), r2, jnp.nan)

    cand = jnp.stack([lo, hi, x1, x2, x3, r1, r2])
    fval = ((c[0] * cand + c[1]) * cand + c[2]) * cand + c[3]
    ok = jnp.isfinite(cand) & jnp.isfinite(fval) & (cand >= lo) & (cand <= hi)
    fval = jnp.where(ok, fval, jnp.inf)
    best = jnp.argmin(fval)
    x_sol = jnp.where(jnp.isfinite(fval[best]), cand[best],
                      0.5 * (lo + hi))
    return x_sol
