"""Closed-form ODE test problems (the reference's "fake backend").

JAX re-implementation of neuralode_tests/problems.py:7-76: three analytic
problems parameterized so solver accuracy and gradient tests can compare
against exact solutions, with a `reverse` flag to exercise the
decreasing-time path.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable

import jax.numpy as jnp
import numpy as np
import scipy.linalg


@dataclass
class Problem:
    func: Callable          # func(t, y) closing over params
    func_p: Callable        # func(t, y, params) with explicit params
    params: dict
    y0: jnp.ndarray
    t: jnp.ndarray
    sol: jnp.ndarray
    y_exact: Callable


def constant_problem(npts=10, reverse=False) -> Problem:
    # y' = a + (y - (a t + b))^5, exact y = a t + b  (problems.py:7-18)
    params = {"a": jnp.asarray(0.2), "b": jnp.asarray(3.0)}

    def func_p(t, y, p):
        return p["a"] + (y - (p["a"] * t + p["b"])) ** 5

    def y_exact(t, p=params):
        return p["a"] * t + p["b"]

    return _build(func_p, params, y_exact, npts, reverse)


def sine_problem(npts=10, reverse=False) -> Problem:
    # problems.py:21-32; exact solution with the (pi - 1/4) t^2 homogeneous
    # term fixed by y(1).
    params = {}

    def func_p(t, y, p):
        return 2 * y / t + t**4 * jnp.sin(2 * t) - t**2 + 4 * t**3

    def y_exact(t, p=None):
        return (
            -0.5 * t**4 * jnp.cos(2 * t)
            + 0.5 * t**3 * jnp.sin(2 * t)
            + 0.25 * t**2 * jnp.cos(2 * t)
            - t**3
            + 2 * t**4
            + (math.pi - 0.25) * t**2
        )

    return _build(func_p, params, y_exact, npts, reverse)


def linear_problem(npts=10, reverse=False, dim=10, seed=36) -> Problem:
    # y' = A y with A = 2U - (U + U^T) (skew-symmetric-ish random matrix);
    # exact solution via matrix exponential (problems.py:35-52).
    rng = np.random.RandomState(seed)
    U = rng.randn(dim, dim) * 0.1
    A = 2 * U - (U + U.T)
    params = {"A": jnp.asarray(A)}

    def func_p(t, y, p):
        return p["A"] @ y

    y0_np = np.ones(dim)

    def y_exact(t, p=None):
        t_np = np.asarray(t)
        return jnp.asarray(
            np.stack([scipy.linalg.expm(A * ti) @ y0_np for ti in t_np])
        )

    return _build(func_p, params, y_exact, npts, reverse)


PROBLEMS = {
    "constant": constant_problem,
    "linear": linear_problem,
    "sine": sine_problem,
}


def _build(func_p, params, y_exact, npts, reverse) -> Problem:
    t = jnp.linspace(1.0, 8.0, npts)
    sol = y_exact(t)
    if reverse:
        t = t[::-1]
        sol = sol[::-1]
    y0 = sol[0]

    def func(tt, yy):
        return func_p(tt, yy, params)

    return Problem(
        func=func, func_p=func_p, params=params, y0=y0, t=t, sol=sol,
        y_exact=y_exact,
    )


def construct_problem(npts=10, ode="constant", reverse=False) -> Problem:
    return PROBLEMS[ode](npts=npts, reverse=reverse)
