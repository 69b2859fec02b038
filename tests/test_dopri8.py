"""dopri8 — Hairer's DOP853 under upstream torchdiffeq's method name.

Beyond the vendored reference's registry (torchdiffeq/_impl/odeint.py:8-17)
but present in upstream torchdiffeq, so migrating users find the name.
Gates:

- tableau consistency (row sums, FSAL structure, error rows sum to zero),
- the derived c_mid midpoint weights satisfy all eight order<=4
  dense-output conditions (re-derived here from the tableau itself),
- empirical convergence order 8 at frozen step size,
- the composite 8(5,3) error estimate + 7th-order dense output keep the
  *output-time* error at ~rtol (the 4th-order quartic fit alone cannot:
  order-8 steps are large enough that interpolation would dominate),
- NFE advantage over dopri5 at tight tolerance,
- jit/vmap/reverse-mode compatibility through the shared machinery,
- odeint_event support.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import problems
from bayesian_ode_tpu import odeint, odeint_with_stats
from bayesian_ode_tpu.ode.events import odeint_event
from bayesian_ode_tpu.ode.tableaus import DOPRI8, DOPRI8_DENSE


def test_tableau_consistency():
    assert DOPRI8.is_fsal
    assert len(DOPRI8.alpha) == 12
    assert len(DOPRI8.c_sol) == 13
    assert abs(sum(DOPRI8.c_sol) - 1.0) < 1e-14
    assert abs(sum(DOPRI8.c_error)) < 1e-13
    assert abs(sum(DOPRI8.c_error_alt)) < 1e-13
    # stage consistency: each beta row sums to its stage time
    for alpha_i, beta_i in zip(DOPRI8.alpha, DOPRI8.beta):
        assert abs(sum(beta_i) - alpha_i) < 1e-13
    # dense-output extra stages are consistent too
    for c, row in zip(DOPRI8_DENSE["c_extra"], DOPRI8_DENSE["a_extra"]):
        assert abs(sum(row) - c) < 1e-12


def test_dopri8_cmid_order_conditions():
    """The c_mid weights satisfy the eight dense-output order conditions
    sum_i b_i(1/2) Phi_i(tau) = (1/2)^rho(tau)/gamma(tau) for all rooted
    trees tau with rho(tau) <= 4 — which makes the midpoint O(h^5)
    accurate, exactly what the quartic interp_fit needs (same construction
    as dopri5's DPS_C_MID, reference dopri5.py:33-36)."""
    A = np.zeros((13, 13))
    for i, row in enumerate(DOPRI8.beta):
        A[i + 1, : len(row)] = row
    C = np.array([0.0] + list(DOPRI8.alpha))
    c = np.array(DOPRI8.c_mid)
    th = 0.5
    AC = A @ C
    conds = [
        (np.ones(13), th),
        (C, th**2 / 2),
        (C * C, th**3 / 3),
        (AC, th**3 / 6),
        (C**3, th**4 / 4),
        (C * AC, th**4 / 8),
        (A @ (C * C), th**4 / 12),
        (A @ AC, th**4 / 24),
    ]
    for phi, rhs in conds:
        assert abs(float(c @ phi) - rhs) < 1e-12


@pytest.mark.parametrize("ode", ["constant", "linear", "sine"])
def test_accuracy_all_problems(ode):
    p = problems.construct_problem(ode=ode)
    y = odeint(p.func, p.y0, p.t, rtol=1e-10, atol=1e-12, method="dopri8")
    err = jnp.max(jnp.abs(p.sol - y)) / jnp.max(jnp.abs(p.sol))
    assert err < 1e-8


def test_backwards_in_time():
    p = problems.construct_problem(ode="constant", reverse=True)
    y = odeint(p.func, p.y0, p.t, method="dopri8")
    assert jnp.max(jnp.abs((p.sol - y) / p.sol)) < 1e-6


def test_empirical_convergence_order_8():
    # y' = y*cos(t): frozen dt (ifactor=dfactor=1, huge tolerance) turns
    # the adaptive loop into a fixed-step integrator; global error ~ h^8.
    def f(t, y):
        return y * jnp.cos(t)

    y0 = jnp.array([1.0])
    ts = jnp.array([0.0, 2.0])
    exact = jnp.exp(jnp.sin(2.0))

    def err_at(h):
        y = odeint(f, y0, ts, rtol=1e6, atol=1e6, method="dopri8",
                   options={"first_step": h, "ifactor": 1.0, "dfactor": 1.0})
        return float(jnp.abs(y[-1, 0] - exact))

    e1, e2 = err_at(2.0 / 8), err_at(2.0 / 16)
    measured = jnp.log2(e1 / e2)
    # e2 sits ~1e-12; roundoff nibbles at the measured order from above
    assert measured > 7.0, (float(e1), float(e2), float(measured))


def test_output_error_tracks_rtol_with_dense_output():
    # Output times deliberately off the (large) step grid: the 7th-order
    # dense output must keep interpolated values at ~rtol.  The quartic
    # fallback (options={"interp": "quartic"}) is ~3 orders worse here —
    # that contrast is the regression canary for the dop853 interpolant.
    def f(t, y):
        return jnp.stack([y[1], -jnp.sin(y[0]) - 0.1 * y[1]])

    y0 = jnp.array([1.2, 0.0])
    ts = jnp.linspace(0.0, 10.0, 11)
    truth = odeint(f, y0, ts, rtol=1e-13, atol=1e-15, method="dopri5")
    rtol = 1e-9
    y8 = odeint(f, y0, ts, rtol=rtol, atol=rtol * 1e-2, method="dopri8")
    yq = odeint(f, y0, ts, rtol=rtol, atol=rtol * 1e-2, method="dopri8",
                options={"interp": "quartic"})
    err8 = float(jnp.max(jnp.abs(y8 - truth)))
    errq = float(jnp.max(jnp.abs(yq - truth)))
    assert err8 < 20 * rtol, err8
    assert errq > 5 * err8  # quartic really is the lower-order fallback


def test_nfe_advantage_over_dopri5():
    def f(t, y):
        return jnp.stack([y[1], -jnp.sin(y[0]) - 0.1 * y[1]])

    y0 = jnp.array([1.2, 0.0])
    ts = jnp.linspace(0.0, 10.0, 11)
    _, s8 = odeint_with_stats(f, y0, ts, rtol=1e-10, atol=1e-12,
                              method="dopri8")
    _, s5 = odeint_with_stats(f, y0, ts, rtol=1e-10, atol=1e-12,
                              method="dopri5")
    assert int(s8["nfe"]) < 0.6 * int(s5["nfe"]), (int(s8["nfe"]),
                                                   int(s5["nfe"]))


def test_nfe_accounting_includes_dense_stages():
    def f(t, y):
        return -y

    y0 = jnp.array([1.0])
    ts = jnp.linspace(0.0, 1.0, 2)
    _, stats = odeint_with_stats(f, y0, ts, method="dopri8",
                                 options={"first_step": 0.05})
    attempts = int(stats["n_accepted"]) + int(stats["n_rejected"])
    # first_step given => one initial f0 eval; each attempted step costs
    # the 12 FSAL stages plus the 3 dense-output extra stages
    assert int(stats["nfe"]) == 1 + attempts * (12 + 3)


def test_jit_and_vmap():
    def f(t, y):
        return -y + jnp.sin(t)

    ts = jnp.linspace(0.0, 1.0, 5)

    @jax.jit
    def solve(y0):
        return odeint(f, y0, ts, rtol=1e-8, atol=1e-10, method="dopri8")

    y0s = jnp.linspace(0.5, 1.5, 4)[:, None]
    batched = jax.vmap(solve)(y0s)
    single = solve(y0s[2])
    assert jnp.allclose(batched[2], single, rtol=1e-10, atol=1e-12)


def test_reverse_mode_gradient_matches_dopri5():
    def loss(log_lam, method):
        lam = jnp.exp(log_lam)

        def f(t, y):
            return -lam * y

        y = odeint(f, jnp.array([1.0]), jnp.linspace(0.0, 1.0, 3),
                   rtol=1e-10, atol=1e-12, method=method,
                   options={"mode": "bounded"})
        return y[-1, 0]

    g8 = jax.grad(loss)(jnp.array(0.3), "dopri8")
    g5 = jax.grad(loss)(jnp.array(0.3), "dopri5")
    # analytic: d/dlog_lam exp(-lam) = -lam*exp(-lam)
    lam = float(jnp.exp(0.3))
    exact = -lam * np.exp(-lam)
    assert abs(float(g8) - exact) < 1e-7
    assert abs(float(g8) - float(g5)) < 1e-7


def test_odeint_event_with_dopri8():
    # linear decay crossing y = 0.5: event at t = ln 2
    def f(t, y):
        return -y

    def ev(t, y):
        return y[0] - 0.5

    # event-time accuracy is bounded by the solve tolerance (the dense
    # output the bisection runs on is only rtol-accurate)
    event_t, ys = odeint_event(f, jnp.array([1.0]), 0.0, event_fn=ev,
                               rtol=1e-11, atol=1e-13, method="dopri8")
    assert abs(float(event_t) - float(jnp.log(2.0))) < 1e-10
    assert abs(float(ys[-1, 0]) - 0.5) < 1e-10
