"""Symplectic fixed-grid integrators for separable Hamiltonian systems.

No reference analogue (the reference stack is explicit-RK only —
SURVEY.md §2.1); the API follows diffrax's `SemiImplicitEuler`
convention: the state is a 2-tuple ``y = (q, p)`` (each component any
pytree) and ``func(t, (q, p)) -> (dq/dt, dp/dt)`` MUST be separable —
``dq/dt`` a function of ``p`` only and ``dp/dt`` of ``q`` only (a
Hamiltonian H(q, p) = T(p) + V(q)).  The steppers evaluate the two
components at staggered points, which is only consistent under that
contract; a non-separable field silently degrades to first order.

Methods (registered in ode.odeint.SOLVERS, fixed-grid semantics —
`options={"step_size": h}` or stepping directly on the output grid):

- ``symplectic_euler``: semi-implicit Euler (kick-drift), order 1.
- ``leapfrog`` / ``verlet``: velocity Verlet (kick-drift-kick,
  Störmer-Verlet), order 2, time-reversible.
- ``yoshida4``: Yoshida's 4th-order triple-Verlet composition
  (H. Yoshida, Phys. Lett. A 150 (1990) 262: w1 = 1/(2 - 2^{1/3}),
  w0 = 1 - 2 w1; substep sizes w1 h, w0 h, w1 h).

Why symplectic here: these preserve a perturbed Hamiltonian exactly, so
energy error stays BOUNDED over arbitrarily long horizons instead of
drifting linearly like same-order explicit RK — the right tool for the
long-trajectory Hamiltonian sampling paths (samplers/hamiltonian.py
uses the same leapfrog update inline; this exposes it through the
odeint API for model dynamics).

All steppers return state INCREMENTS (like ode.fixed_grid's step
functions) so the Kahan-compensated carry (`options={"compensated":
True}`) composes for free.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _axpy(a, x, y):
    """y + a * x over matching pytrees (a a scalar)."""
    return jax.tree.map(lambda yl, xl: yl + jnp.asarray(a, yl.dtype) * xl,
                        y, x)


def _scale(a, x):
    return jax.tree.map(lambda xl: jnp.asarray(a, xl.dtype) * xl, x)


def _check_qp(y):
    if not (isinstance(y, tuple) and len(y) == 2):
        raise ValueError(
            "symplectic methods need the state to be a 2-tuple (q, p) "
            "with func(t, (q, p)) -> (dq/dt, dp/dt) separable; got state "
            f"type {type(y).__name__}"
        )


def symplectic_euler_step(func, t, dt, y):
    """Semi-implicit Euler: kick p with g(q), then drift q with f(p1)."""
    _check_qp(y)
    q, p = y
    g0 = func(t, (q, p))[1]
    p1 = _axpy(dt, g0, p)
    f1 = func(t, (q, p1))[0]
    dq = _scale(dt, f1)
    dp = _scale(dt, g0)
    return (dq, dp), 2


def verlet_step(func, t, dt, y):
    """Velocity Verlet (kick-drift-kick), order 2, time-reversible."""
    _check_qp(y)
    q, p = y
    g0 = func(t, (q, p))[1]
    p_half = _axpy(dt / 2, g0, p)
    f_half = func(t + dt / 2, (q, p_half))[0]
    dq = _scale(dt, f_half)
    q1 = jax.tree.map(lambda a, b: a + b, q, dq)
    g1 = func(t + dt, (q1, p_half))[1]
    dp = _scale(dt / 2, jax.tree.map(lambda a, b: a + b, g0, g1))
    return (dq, dp), 3


# Yoshida (1990) composition coefficients, exact closed forms.
_YOSHIDA_W1 = 1.0 / (2.0 - 2.0 ** (1.0 / 3.0))
_YOSHIDA_W0 = 1.0 - 2.0 * _YOSHIDA_W1


def yoshida4_step(func, t, dt, y):
    """Yoshida's 4th-order symmetric composition of three Verlet steps."""
    _check_qp(y)
    q, p = y
    tt = t
    nfe = 0
    dq_acc = dp_acc = None
    for w in (_YOSHIDA_W1, _YOSHIDA_W0, _YOSHIDA_W1):
        (dq, dp), n = verlet_step(func, tt, w * dt, (q, p))
        q = jax.tree.map(lambda a, b: a + b, q, dq)
        p = jax.tree.map(lambda a, b: a + b, p, dp)
        add = lambda acc, d: d if acc is None else jax.tree.map(
            lambda a, b: a + b, acc, d)
        dq_acc, dp_acc = add(dq_acc, dq), add(dp_acc, dp)
        tt = tt + w * dt
        nfe += n
    return (dq_acc, dp_acc), nfe


SYMPLECTIC_STEP_FUNCS = {
    "symplectic_euler": symplectic_euler_step,
    "leapfrog": verlet_step,
    "verlet": verlet_step,
    "yoshida4": yoshida4_step,
}
