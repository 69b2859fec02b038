"""odeint_event: event-terminated integration with IFT gradients.

API mirrors upstream torchdiffeq's odeint_event (the vendored reference
predates event support), so gates are against closed-form event times
and analytic implicit-function-theorem derivatives rather than a vendored
implementation:

- exponential decay y' = -a y with event y = c:
    t* = log(y0/c)/a,  dt*/dy0 = 1/(a y0),  dt*/da = -t*/a,
    dt*/dc = -1/(a c), and y(t*) = c exactly so d y(t*)/d y0 = 0
    (the moving-boundary term must cancel the frozen-time term).
- projectile: event in one component of a 2-D state.
- jit/vmap, reverse_time, no-event NaN, immediate event (g(t0,y0)=0),
  stiff (sdirk4) detection.
"""
import jax
import jax.numpy as jnp
import pytest

from bayesian_ode_tpu import (
    odeint_adjoint,
    odeint_event,
    odeint_event_with_stats,
)

A, C = 1.3, 0.7


def f(t, y):
    return -A * y


def g(t, y):
    return y[0] - C


Y0 = jnp.array([2.0])
T_TRUE = float(jnp.log(Y0[0] / C) / A)


@pytest.mark.parametrize("method,tol", [
    ("dopri5", 1e-7), ("tsit5", 1e-7),
    ("bosh3", 1e-6),  # order-3 solve error at rtol=1e-7 is ~1e-7 itself
])
def test_event_time_and_state(method, tol):
    et, ys, st = odeint_event_with_stats(
        f, Y0, 0.0, event_fn=g, method=method)
    assert bool(st["event_found"])
    assert abs(float(et) - T_TRUE) < tol
    assert abs(float(ys[-1, 0]) - C) < tol
    assert ys.shape == (2, 1) and float(ys[0, 0]) == 2.0


def test_gradient_wrt_y0_bounded_and_adjoint():
    def et_of(y0, **kw):
        et, _ = odeint_event(f, jnp.array([y0]), 0.0, event_fn=g, **kw)
        return et

    truth = 1.0 / (A * float(Y0[0]))
    g1 = jax.grad(et_of)(2.0, options={"mode": "bounded"})
    g2 = jax.grad(et_of)(2.0, odeint_interface=odeint_adjoint)
    assert abs(float(g1) - truth) < 1e-6
    assert abs(float(g2) - truth) < 1e-6


def test_gradient_wrt_dynamics_params():
    # t* = log(y0/c)/a  =>  dt*/da = -t*/a
    def et_of(a):
        et, _ = odeint_event(
            lambda t, y: -a * y, Y0, 0.0, event_fn=g,
            options={"mode": "bounded"})
        return et

    got = float(jax.grad(et_of)(A))
    assert abs(got - (-T_TRUE / A)) < 1e-6


def test_gradient_wrt_event_fn_params():
    # dt*/dc = -1/(a c), flowing through event_fn's closure only
    def et_of(c):
        et, _ = odeint_event(
            f, Y0, 0.0, event_fn=lambda t, y: y[0] - c,
            options={"mode": "bounded"})
        return et

    got = float(jax.grad(et_of)(C))
    assert abs(got - (-1.0 / (A * C))) < 1e-6


def test_moving_boundary_cancels_in_event_state():
    # y(t*) == c identically in y0, so the total derivative must be ~0;
    # without the f * dt* reroute term it would read exp(-a t*) ~ 0.35.
    def ystar_of(y0):
        _, ys = odeint_event(f, jnp.array([y0]), 0.0, event_fn=g,
                             options={"mode": "bounded"})
        return ys[-1, 0]

    got = float(jax.grad(ystar_of)(2.0))
    assert abs(got) < 1e-6


def test_jit_vmap():
    @jax.jit
    def et_of(y0):
        et, _ = odeint_event(f, y0[None], 0.0, event_fn=g)
        return et

    y0s = jnp.array([1.5, 2.0, 3.0])
    got = jax.vmap(et_of)(y0s)
    truth = jnp.log(y0s / C) / A
    assert jnp.max(jnp.abs(got - truth)) < 1e-7


def test_projectile_component_event():
    # x'' = -9.8, x(0)=0, v(0)=5; ground contact at t = 2 v0 / 9.8
    def dyn(t, s):
        return jnp.array([s[1], -9.8])

    def ground(t, s):
        # strictly positive until flight ends: start sign must be +
        return jnp.where(t == 0.0, 1.0, s[0])

    et, ys = odeint_event(dyn, jnp.array([0.0, 5.0]), 0.0, event_fn=ground)
    assert abs(float(et) - 2 * 5.0 / 9.8) < 1e-7
    assert abs(float(ys[-1, 0])) < 1e-7
    assert abs(float(ys[-1, 1]) + 5.0) < 1e-6  # impact speed = -v0


def test_reverse_time():
    # y' = -a y integrated backward from y(1) = 2: y(t) = 2 e^{a(1-t)};
    # event y = 3 at t = 1 - log(3/2)/a
    et, ys = odeint_event(f, Y0, 1.0, event_fn=lambda t, y: y[0] - 3.0,
                          reverse_time=True)
    assert abs(float(et) - (1.0 - float(jnp.log(1.5)) / A)) < 1e-7
    assert abs(float(ys[-1, 0]) - 3.0) < 1e-7


def test_no_event_returns_nan():
    et, ys, st = odeint_event_with_stats(
        f, Y0, 0.0, event_fn=lambda t, y: y[0] + 5.0, t_max=1.0)
    assert not bool(st["event_found"])
    assert bool(jnp.isnan(et))
    assert jnp.all(jnp.isfinite(ys))


def test_immediate_event():
    et, ys = odeint_event(f, Y0, 0.0, event_fn=lambda t, y: y[0] - 2.0)
    assert abs(float(et)) < 1e-12
    assert abs(float(ys[-1, 0]) - 2.0) < 1e-9


def test_stiff_sdirk4_event():
    # fast relaxation toward cos(t): y' = -lam (y - cos t).  After the
    # transient y tracks cos t, so y = 0.5 crosses near t = pi/3.
    lam = 1e6

    def stiff(t, y):
        return -lam * (y - jnp.cos(t))

    et, ys, st = odeint_event_with_stats(
        stiff, jnp.array([1.0]), 0.0,
        event_fn=lambda t, y: y[0] - 0.5, method="sdirk4",
        rtol=1e-6, atol=1e-8)
    assert bool(st["event_found"])
    # asymptotic solution y ~ cos t + sin(t)/lam + O(lam^-2)
    t = float(et)
    asym = jnp.cos(t) + jnp.sin(t) / lam
    assert abs(float(asym) - 0.5) < 1e-6
    # stiff march must not need O(lam*t) ~ 3e6 explicit-stability steps
    # (measured: 500 accepted at these tolerances)
    assert int(st["n_accepted"]) + int(st["n_rejected"]) < 2000


def test_rejects_fixed_grid_methods():
    with pytest.raises(ValueError, match="adaptive method"):
        odeint_event(f, Y0, 0.0, event_fn=g, method="rk4")
