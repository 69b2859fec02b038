"""Symplectic integrators (symplectic_euler / verlet / yoshida4).

Beyond the reference (explicit-RK only, SURVEY.md §2.1).  Gates:
convergence order, BOUNDED long-horizon energy error (the defining
property — explicit Euler's energy grows without bound), exact time
reversibility of Verlet, and jit/vmap/reverse-mode transparency.
"""
import jax
import jax.numpy as jnp
import pytest

from bayesian_ode_tpu import odeint, odeint_with_stats


def oscillator(t, y):
    q, p = y
    return p, -q  # H = (p^2 + q^2) / 2


def pendulum(t, y):
    q, p = y
    return p, -jnp.sin(q)  # H = p^2/2 - cos(q)


def _solve_to(method, T, n_steps, y0=(jnp.array([1.0]), jnp.array([0.0])),
              field=oscillator):
    ts = jnp.linspace(0.0, T, n_steps + 1)
    qs, ps = odeint(field, y0, ts, method=method)
    return qs, ps


@pytest.mark.parametrize("method,order", [
    ("symplectic_euler", 1), ("verlet", 2), ("leapfrog", 2), ("yoshida4", 4),
])
def test_convergence_order(method, order):
    T = 2.0
    errs = []
    for n in (40, 80):
        qs, ps = _solve_to(method, T, n)
        err = abs(float(qs[-1, 0]) - float(jnp.cos(T)))
        errs.append(err)
    rate = jnp.log2(errs[0] / errs[1])
    assert rate > order - 0.35, (errs, float(rate))


@pytest.mark.parametrize("method,tol", [
    ("symplectic_euler", 0.11), ("verlet", 6e-3), ("yoshida4", 2e-5),
])
def test_energy_bounded_long_horizon(method, tol):
    # 5,000 pendulum steps at h=0.1 (~80 periods): symplectic energy
    # error stays bounded at its per-step level; explicit euler's grows
    # by orders of magnitude over the same horizon (checked below).
    y0 = (jnp.array([1.5]), jnp.array([0.0]))
    H = lambda q, p: p**2 / 2 - jnp.cos(q)
    ts = jnp.linspace(0.0, 500.0, 5001)
    qs, ps = odeint(pendulum, y0, ts, method=method)
    drift = jnp.abs(H(qs[:, 0], ps[:, 0]) - H(1.5, 0.0))
    assert float(drift.max()) < tol, float(drift.max())


def test_euler_energy_drifts_for_contrast():
    y0 = (jnp.array([1.5]), jnp.array([0.0]))
    H = lambda q, p: p**2 / 2 - jnp.cos(q)
    ts = jnp.linspace(0.0, 500.0, 5001)
    qs, ps = odeint(pendulum, y0, ts, method="euler")
    drift = jnp.abs(H(qs[:, 0], ps[:, 0]) - H(1.5, 0.0))
    assert float(drift.max()) > 1.0  # vs verlet's 6e-3 on the same grid


def test_verlet_time_reversible():
    y0 = (jnp.array([0.9]), jnp.array([0.3]))
    ts = jnp.linspace(0.0, 10.0, 201)
    qs, ps = odeint(pendulum, y0, ts, method="verlet")
    yT = (qs[-1], ps[-1])
    back = odeint(pendulum, yT, ts[::-1], method="verlet")
    assert abs(float(back[0][-1, 0]) - 0.9) < 1e-5
    assert abs(float(back[1][-1, 0]) - 0.3) < 1e-5


def test_step_size_option_and_nfe():
    y0 = (jnp.array([1.0]), jnp.array([0.0]))
    ts = jnp.linspace(0.0, 1.0, 3)
    _, stats = odeint_with_stats(oscillator, y0, ts, method="verlet",
                                 options={"step_size": 0.01})
    assert int(stats["n_accepted"]) == 100  # 101 grid points = 100 steps
    assert int(stats["nfe"]) == 3 * 100


def test_jit_vmap_grad():
    def final_q(q0):
        y0 = (q0, jnp.zeros_like(q0))
        ts = jnp.linspace(0.0, 1.0, 51)
        qs, _ = odeint(oscillator, y0, ts, method="yoshida4")
        return qs[-1].sum()

    g = jax.jit(jax.vmap(jax.grad(final_q)))(jnp.ones((4, 1)))
    # d/dq0 [q0 cos(T)] = cos(1)
    assert jnp.allclose(g, jnp.cos(1.0), atol=1e-5)


def test_non_tuple_state_raises():
    with pytest.raises(ValueError, match="2-tuple"):
        odeint(lambda t, y: -y, jnp.ones(2), jnp.linspace(0, 1, 3),
               method="verlet")


def test_pytree_components():
    # q and p may themselves be pytrees
    def field(t, y):
        q, p = y
        return {"x": p["x"]}, {"x": -q["x"]}

    y0 = ({"x": jnp.array([1.0])}, {"x": jnp.array([0.0])})
    ts = jnp.linspace(0.0, 2.0, 101)
    qs, ps = odeint(field, y0, ts, method="verlet")
    assert abs(float(qs["x"][-1, 0]) - jnp.cos(2.0)) < 1e-3
