"""DETEST nonstiff problem battery (Hull, Enright, Fellen & Sedgwick 1972).

The 25 classical problems, classes A-E, as jittable JAX RHS functions.
Same problem set as the reference harness (neuralode_tests/DETEST/
detest.py); each entry returns (diffeq, init, solution_or_None) with
init() -> (t0, y0).

One deliberate fix: the reference's C5 initial position carries an obvious
typo (`165699966404` for Neptune's y-coordinate, detest.py:218 — the
classical value is 1.65699966404); the correct value is used here.
"""
from __future__ import annotations

import math

import jax.numpy as jnp


# --- Class A: single equations -------------------------------------------
def A1():
    return (lambda t, y: -y,
            lambda: (jnp.asarray(0.0), jnp.asarray(1.0)),
            lambda t: jnp.exp(-t))


def A2():
    return (lambda t, y: -(y**3) / 2,
            lambda: (jnp.asarray(0.0), jnp.asarray(1.0)),
            lambda t: 1 / jnp.sqrt(t + 1))


def A3():
    return (lambda t, y: y * jnp.cos(t),
            lambda: (jnp.asarray(0.0), jnp.asarray(1.0)),
            lambda t: jnp.exp(jnp.sin(t)))


def A4():
    return (lambda t, y: y / 4 * (1 - y / 20),
            lambda: (jnp.asarray(0.0), jnp.asarray(1.0)),
            lambda t: 20 / (1 + 19 * jnp.exp(-t / 4)))


def A5():
    return (lambda t, y: (y - t) / (y + t),
            lambda: (jnp.asarray(0.0), jnp.asarray(4.0)),
            None)


# --- Class B: small systems ----------------------------------------------
def B1():
    def diffeq(t, y):
        return jnp.stack([2 * (y[0] - y[0] * y[1]), -(y[1] - y[0] * y[1])])

    return diffeq, lambda: (jnp.asarray(0.0), jnp.asarray([1.0, 3.0])), None


def B2():
    A = jnp.asarray([[-1.0, 1.0, 0.0], [1.0, -2.0, 1.0], [0.0, 1.0, -1.0]])
    return (lambda t, y: A @ y,
            lambda: (jnp.asarray(0.0), jnp.asarray([2.0, 0.0, 1.0])), None)


def B3():
    def diffeq(t, y):
        return jnp.stack([-y[0], y[0] - y[1] ** 2, y[1] ** 2])

    return diffeq, lambda: (jnp.asarray(0.0), jnp.asarray([1.0, 0.0, 0.0])), None


def B4():
    def diffeq(t, y):
        a = jnp.sqrt(y[0] ** 2 + y[1] ** 2)
        return jnp.stack(
            [-y[1] - y[0] * y[2] / a, y[0] - y[1] * y[2] / a, y[0] / a]
        )

    return diffeq, lambda: (jnp.asarray(0.0), jnp.asarray([3.0, 0.0, 0.0])), None


def B5():
    def diffeq(t, y):
        return jnp.stack([y[1] * y[2], -y[0] * y[2], -0.51 * y[0] * y[1]])

    return diffeq, lambda: (jnp.asarray(0.0), jnp.asarray([0.0, 1.0, 1.0])), None


# --- Class C: moderate systems -------------------------------------------
def _radioactive_chain(n, rates=None):
    import numpy as np

    A = np.zeros((n, n))
    if rates is None:
        rates = np.ones(n - 1)
    A[np.arange(n - 1), np.arange(n - 1)] = -rates
    A[np.arange(1, n), np.arange(n - 1)] = rates
    return A


def C1():
    import numpy as np

    A = jnp.asarray(_radioactive_chain(10))
    A = A.at[9, 9].set(0.0)
    y0 = jnp.zeros(10).at[0].set(1.0)
    return (lambda t, y: A @ y, lambda: (jnp.asarray(0.0), y0), None)


def C2():
    import numpy as np

    rates = np.linspace(1, 9, 9)
    A = jnp.asarray(_radioactive_chain(10, rates))
    y0 = jnp.zeros(10).at[0].set(1.0)
    return (lambda t, y: A @ y, lambda: (jnp.asarray(0.0), y0), None)


def _tridiag(n):
    import numpy as np

    A = np.zeros((n, n))
    np.fill_diagonal(A, -2.0)
    A[np.arange(1, n), np.arange(n - 1)] = 1.0
    A[np.arange(n - 1), np.arange(1, n)] = 1.0
    return jnp.asarray(A)


def C3():
    A = _tridiag(10)
    y0 = jnp.zeros(10).at[0].set(1.0)
    return (lambda t, y: A @ y, lambda: (jnp.asarray(0.0), y0), None)


def C4():
    A = _tridiag(51)
    y0 = jnp.zeros(51).at[0].set(1.0)
    return (lambda t, y: A @ y, lambda: (jnp.asarray(0.0), y0), None)


def C5():
    """Five-body problem: the outer planets about the sun (n-body, AU/day
    units scaled)."""
    k2 = 2.95912208286
    m0 = 1.00000597682
    m = jnp.asarray([
        0.000954786104043, 0.000285583733151, 0.0000437273164546,
        0.0000517759138449, 0.00000277777777778,
    ])

    def diffeq(t, y):
        # y: (2, 3, 5); y[0] positions, y[1] velocities
        dy = y[1]
        q = y[0]                                    # (3, 5)
        r3 = jnp.sum(q**2, 0) ** 1.5                # (5,)
        diff = q[:, None, :] - q[:, :, None]        # (3, j, k) = q_k - q_j
        d2 = jnp.sum(diff**2, 0)
        d3 = jnp.where(d2 > 0, d2**1.5, 1.0)
        F = m[None, None, :] * (
            diff / d3[None, :, :] + q[:, None, :] / r3[None, None, :]
        )
        # zero the self-interaction terms
        eye = jnp.eye(5, dtype=bool)
        F = jnp.where(eye[None, :, :], 0.0, F)
        ddy = k2 * (-(m0 + m) * q / r3[None, :] + jnp.sum(F, axis=2))
        return jnp.stack([dy, ddy], 0)

    def init():
        q0 = jnp.asarray([
            3.42947415189, 3.35386959711, 1.35494901715,
            6.64145542550, 5.97156957878, 2.18231499728,
            11.2630437207, 14.6952576794, 6.27960525067,
            -30.1552268759, 1.65699966404, 1.43785752721,
            -21.1238353380, 28.4465098142, 15.388265967,
        ]).reshape(5, 3).T
        v0 = jnp.asarray([
            -.557160570446, .505696783289, .230578543901,
            -.415570776342, .365682722812, .169143213293,
            -.325325669158, .189706021964, .0877265322780,
            -.0240476254170, -.287659532608, -.117219543175,
            -.176860753121, -.216393453025, -.0148647893090,
        ]).reshape(5, 3).T
        return jnp.asarray(0.0), jnp.stack([q0, v0], 0)

    return diffeq, init, None


# --- Class D: orbit equations --------------------------------------------
def _D(eps):
    def diffeq(t, y):
        r = (y[0] ** 2 + y[1] ** 2) ** 1.5
        return jnp.stack([y[2], y[3], -y[0] / r, -y[1] / r])

    def init():
        return jnp.asarray(0.0), jnp.asarray(
            [1 - eps, 0.0, 0.0, math.sqrt((1 + eps) / (1 - eps))]
        )

    return diffeq, init, None


D1 = lambda: _D(0.1)
D2 = lambda: _D(0.3)
D3 = lambda: _D(0.5)
D4 = lambda: _D(0.7)
D5 = lambda: _D(0.9)


# --- Class E: higher-order equations -------------------------------------
def E1():
    def diffeq(t, y):
        return jnp.stack(
            [y[1], -(y[1] / (t + 1) + (1 - 0.25 / (t + 1) ** 2) * y[0])]
        )

    return (diffeq,
            lambda: (jnp.asarray(0.0),
                     jnp.asarray([0.671396707141803, 0.0954005144474744])),
            None)


def E2():
    def diffeq(t, y):
        return jnp.stack([y[1], (1 - y[0] ** 2) * y[1] - y[0]])

    return diffeq, lambda: (jnp.asarray(0.0), jnp.asarray([2.0, 0.0])), None


def E3():
    def diffeq(t, y):
        return jnp.stack(
            [y[1], y[0] ** 3 / 6 - y[0] + 2 * jnp.sin(2.78535 * t)]
        )

    return diffeq, lambda: (jnp.asarray(0.0), jnp.asarray([0.0, 0.0])), None


def E4():
    def diffeq(t, y):
        return jnp.stack([y[1], 0.32 - 0.4 * y[1] ** 2])

    return diffeq, lambda: (jnp.asarray(0.0), jnp.asarray([30.0, 0.0])), None


def E5():
    def diffeq(t, y):
        return jnp.stack([y[1], jnp.sqrt(1 + y[1] ** 2) / (25 - t)])

    return diffeq, lambda: (jnp.asarray(0.0), jnp.asarray([0.0, 0.0])), None


ALL_PROBLEMS = {
    f"{c}{i}": globals()[f"{c}{i}"]
    for c in "ABCDE"
    for i in range(1, 6)
}
