"""Pytree-state API gates.

Mirrors neuralode_tests/api_tests.py (tuple-of-tensors state through
dopri5/adams matching the single-tensor solve to ~1e-12, plus gradient
checks per element), generalized to arbitrary nested pytrees.
"""
import jax
import jax.numpy as jnp
import pytest
from jax.test_util import check_grads

import problems
from bayesian_ode_tpu import odeint, odeint_adjoint


@pytest.mark.parametrize("method", ["dopri5", "adams", "rk4"])
def test_tuple_state_matches_single(method):
    p = problems.construct_problem(ode="constant")

    def tuple_func(t, y):
        a, b = y
        return (p.func(t, a), p.func(t, b))

    ys_single = odeint(p.func, p.y0, p.t, method=method)
    ys_tuple = odeint(tuple_func, (p.y0, p.y0), p.t, method=method)
    for leaf in ys_tuple:
        assert jnp.max(jnp.abs(leaf - ys_single)) < 1e-12


@pytest.mark.parametrize("method", ["dopri5"])
def test_nested_dict_state(method):
    # Beyond the reference: arbitrary nested pytree state.
    A = jnp.asarray([[-0.5, 1.0], [-1.0, -0.5]])
    t = jnp.linspace(0.0, 1.0, 5)
    y0 = {"pos": jnp.asarray([1.0, 0.0]), "aux": {"s": jnp.asarray(2.0)}}

    def func(tt, y):
        return {"pos": A @ y["pos"], "aux": {"s": -y["aux"]["s"]}}

    ys = odeint(func, y0, t, method=method)
    assert ys["pos"].shape == (5, 2)
    assert jnp.max(jnp.abs(ys["aux"]["s"] - 2.0 * jnp.exp(-t))) < 1e-6


@pytest.mark.slow
def test_tuple_state_gradcheck():
    p = problems.construct_problem(ode="constant", npts=4)

    def tuple_func(t, y):
        a, b = y
        return (p.func(t, a), p.func(t, b))

    def solve(y0):
        ys = odeint(tuple_func, y0, p.t, method="dopri5",
                    options={"mode": "bounded", "max_steps_per_interval": 64})
        return ys[0].sum() + (ys[1] ** 2).sum()

    check_grads(solve, ((p.y0, p.y0 + 0.1),), order=1, modes=["rev"],
                atol=1e-4, rtol=1e-4)


def test_adjoint_pytree_state():
    A = jnp.asarray([[-0.5, 1.0], [-1.0, -0.5]])
    t = jnp.linspace(0.0, 1.0, 5)

    def loss(params):
        def func(tt, y):
            return {"pos": params["A"] @ y["pos"], "vel": -y["vel"]}

        y0 = {"pos": jnp.asarray([1.0, 0.0]), "vel": jnp.asarray([0.5, 0.5])}
        ys = odeint_adjoint(func, y0, t, method="dopri5")
        return jnp.sum(ys["pos"] ** 2) + jnp.sum(ys["vel"])

    g = jax.grad(loss)({"A": A})
    assert g["A"].shape == (2, 2)
    assert jnp.all(jnp.isfinite(g["A"]))
