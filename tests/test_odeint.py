"""Solver accuracy gates vs closed-form solutions.

Mirrors neuralode_tests/odeint_tests.py: rel error < 1e-4 for every solver,
forward and reverse time, plus the no-integration edge case, all in f64.
"""
import jax
import jax.numpy as jnp
import pytest

import problems
from bayesian_ode_tpu import odeint, odeint_with_stats

ERROR_TOL = 1e-4

ALL_METHODS = [
    "euler", "midpoint", "rk4", "explicit_adams", "fixed_adams", "adams",
    "dopri5", "tsit5",
]


def rel_error(true, estimate):
    return jnp.max(jnp.abs((true - estimate) / true))


@pytest.mark.parametrize("method", ALL_METHODS)
def test_solver_error_constant(method):
    p = problems.construct_problem(ode="constant")
    y = odeint(p.func, p.y0, p.t, method=method)
    assert rel_error(p.sol, y) < ERROR_TOL


@pytest.mark.parametrize("ode", ["constant", "linear", "sine"])
@pytest.mark.parametrize("method", ["dopri5", "tsit5", "adams"])
def test_adaptive_solvers_all_problems(method, ode):
    p = problems.construct_problem(ode=ode)
    y = odeint(p.func, p.y0, p.t, method=method)
    if ode == "linear":
        # The oscillatory linear trajectory crosses zero, so normalize the
        # max abs error by the solution scale instead of pointwise division
        # (the reference's pointwise rel_error passes only by luck of its
        # random matrix draw).
        err = jnp.max(jnp.abs(p.sol - y)) / jnp.max(jnp.abs(p.sol))
    else:
        err = rel_error(p.sol, y)
    assert err < ERROR_TOL


@pytest.mark.parametrize("method", ALL_METHODS)
def test_solver_backwards_in_time(method):
    p = problems.construct_problem(ode="constant", reverse=True)
    y = odeint(p.func, p.y0, p.t, method=method)
    assert rel_error(p.sol, y) < ERROR_TOL


@pytest.mark.parametrize("ode", ["constant", "linear", "sine"])
def test_dopri5_backwards_all_problems(ode):
    p = problems.construct_problem(ode=ode, reverse=True)
    y = odeint(p.func, p.y0, p.t, method="dopri5")
    assert rel_error(p.sol, y) < ERROR_TOL


@pytest.mark.parametrize("method", ["dopri5", "rk4"])
def test_backwards_traced_t_under_jit(method):
    # VERDICT r1 #7: decreasing TRACED t inside jit (direction resolved
    # dynamically via the sign trick) must match the concrete-array path,
    # with and without the explicit options={"reverse": ...} pin.
    # (dopri5 covers the adaptive path, rk4 the fixed-grid one; the extra
    # option-pinned compiles run on the cheap rk4 only.)
    p = problems.construct_problem(ode="sine", reverse=True)
    concrete = odeint(p.func, p.y0, p.t, method=method)

    traced = jax.jit(
        lambda t: odeint(p.func, p.y0, t, method=method))(p.t)
    assert rel_error(concrete, traced) < 1e-9
    if method == "dopri5":
        assert rel_error(p.sol, traced) < ERROR_TOL
        return

    pinned = jax.jit(lambda t: odeint(p.func, p.y0, t, method=method,
                                      options={"reverse": True}))(p.t)
    assert rel_error(concrete, pinned) < 1e-9

    # explicit reverse=False on increasing times stays the fast path
    pf = problems.construct_problem(ode="sine")
    fwd = jax.jit(lambda t: odeint(pf.func, pf.y0, t, method=method,
                                   options={"reverse": False}))(pf.t)
    assert rel_error(pf.sol, jax.jit(lambda t: odeint(
        pf.func, pf.y0, t, method=method))(pf.t)) == rel_error(pf.sol, fwd)


@pytest.mark.parametrize("method", ["dopri5", "rk4", "adams"])
def test_no_integration(method):
    p = problems.construct_problem(ode="constant")
    y = odeint(p.func, p.y0, p.t[0:1], method=method)
    assert y.shape[0] == 1
    assert jnp.allclose(y[0], p.y0)


def test_odeint_under_jit():
    p = problems.construct_problem(ode="linear")

    @jax.jit
    def solve(y0, t):
        return odeint(p.func, y0, t, method="dopri5")

    y = solve(p.y0, p.t)
    assert rel_error(p.sol, y) < ERROR_TOL


def test_odeint_vmap_batched_y0():
    # Batched initial conditions with per-lane adaptive step control.
    p = problems.construct_problem(ode="linear")
    y0_batch = jnp.stack([p.y0, p.y0 * 1.5, p.y0 * 0.5])
    ys = jax.vmap(lambda y0: odeint(p.func, y0, p.t, method="dopri5"))(y0_batch)
    assert ys.shape == (3,) + p.sol.shape
    assert rel_error(p.sol, ys[0]) < ERROR_TOL


def test_stats_nfe_accounting():
    p = problems.construct_problem(ode="linear")
    _, stats = odeint_with_stats(p.func, p.y0, p.t, method="dopri5")
    # 6 evals per adaptive step plus 2 for initial-step selection.
    expected = 2 + 6 * (int(stats["n_accepted"]) + int(stats["n_rejected"]))
    assert int(stats["nfe"]) == expected
    assert bool(stats["reached_final_time"])
    _, stats_rk4 = odeint_with_stats(p.func, p.y0, p.t, method="rk4")
    assert int(stats_rk4["nfe"]) == 4 * (p.t.shape[0] - 1)


def test_tolerance_scaling_dopri5():
    # Tighter tolerances must reduce error and increase NFE.
    p = problems.construct_problem(ode="linear")
    y_loose, s_loose = odeint_with_stats(
        p.func, p.y0, p.t, rtol=1e-3, atol=1e-5, method="dopri5"
    )
    y_tight, s_tight = odeint_with_stats(
        p.func, p.y0, p.t, rtol=1e-9, atol=1e-11, method="dopri5"
    )
    assert rel_error(p.sol, y_tight) < rel_error(p.sol, y_loose)
    assert int(s_tight["nfe"]) > int(s_loose["nfe"])
    assert rel_error(p.sol, y_tight) < 1e-8


def test_first_step_option_honored():
    # Unlike the reference (which substitutes 0.01 whenever first_step is
    # given, dopri5.py:81-82), the provided value is used.
    p = problems.construct_problem(ode="constant")
    y = odeint(
        p.func, p.y0, p.t, method="dopri5", options={"first_step": 0.05}
    )
    assert rel_error(p.sol, y) < ERROR_TOL


def test_bounded_mode_matches_while_mode():
    p = problems.construct_problem(ode="linear")
    y_while = odeint(p.func, p.y0, p.t, method="dopri5")
    y_bounded = odeint(
        p.func, p.y0, p.t, method="dopri5",
        options={"mode": "bounded", "max_steps_per_interval": 64},
    )
    assert jnp.max(jnp.abs(y_while - y_bounded)) < 1e-12


def test_max_num_steps_budget_terminates():
    # blow-up ODE past its singularity: the step budget terminates the
    # solve and flags it (replaces the reference's max_num_steps assert,
    # dopri5.py:89-91)
    ys, stats = odeint_with_stats(
        lambda t, y: y**2, jnp.asarray(1.0), jnp.asarray([0.0, 2.0]),
        method="dopri5", options={"max_num_steps": 500},
    )
    assert not bool(stats["reached_final_time"])
    assert int(stats["n_accepted"]) + int(stats["n_rejected"]) == 500


def test_step_size_option_fixed_grid():
    # custom step_size grid with linear interpolation onto output times
    # (reference solvers.py:60-71, 100-105)
    f = lambda t, y: -y
    t = jnp.asarray([0.0, 0.35, 1.0])
    y = odeint(f, jnp.asarray(1.0), t, method="rk4",
               options={"step_size": 0.05})
    assert jnp.max(jnp.abs(y - jnp.exp(-t))) < 1e-5


def test_adams_options_forwarded():
    p = problems.construct_problem(ode="constant")
    y = odeint(p.func, p.y0, p.t, method="adams",
               options={"max_order": 4})
    assert rel_error(p.sol, y) < ERROR_TOL
    y2 = odeint(p.func, p.y0, p.t, method="fixed_adams",
                options={"max_iters": 2, "max_order": 6})
    assert rel_error(p.sol, y2) < ERROR_TOL


def test_single_loop_emission_matches_scan_mode():
    # mode="while" (one while loop, in-loop output emission) must produce
    # the exact step sequence of the scan-over-output-times form
    import jax

    from bayesian_ode_tpu.models.dynamics import DYNAMICS

    f = DYNAMICS["vdp"]
    y0 = jnp.asarray([1.5, -0.3], jnp.float64)
    ts = jnp.linspace(0.0, 10.0, 40, dtype=jnp.float64)
    for method in ["dopri5", "tsit5"]:
        ya, sa = odeint_with_stats(f, y0, ts, 1e-9, 1e-11, method)
        yb, sb = odeint_with_stats(f, y0, ts, 1e-9, 1e-11, method,
                                   options={"mode": "while_scan"})
        assert jnp.array_equal(ya, yb), method
        assert int(sa["nfe"]) == int(sb["nfe"])
        assert int(sa["n_rejected"]) == int(sb["n_rejected"])
    # vmapped chains with independent step control
    y0s = jnp.stack([y0, 0.5 * y0, -y0])
    run = jax.vmap(lambda y: odeint_with_stats(f, y, ts, 1e-9, 1e-11,
                                               "dopri5")[0])
    assert bool(jnp.isfinite(run(y0s)).all())


def test_pi_controller_option():
    # options={"controller": "pi"}: Gustafsson PI step control — fewer
    # rejected steps at the same tolerance, same accuracy envelope vs
    # the reference-parity I controller (Van der Pol, f64, rtol=1e-7).
    def vdp(t, y):
        x, v = y[..., 0], y[..., 1]
        return jnp.stack([v, (1 - x**2) * v - x], axis=-1)

    y0 = jnp.asarray([2.0, 0.0], jnp.float64)
    ts = jnp.linspace(0.0, 20.0, 41, dtype=jnp.float64)
    ref, _ = odeint_with_stats(vdp, y0, ts, 1e-12, 1e-14, "dopri5")
    yi, si = odeint_with_stats(vdp, y0, ts, 1e-7, 1e-9, "dopri5")
    yp, sp = odeint_with_stats(vdp, y0, ts, 1e-7, 1e-9, "dopri5",
                               options={"controller": "pi"})
    assert bool(sp["reached_final_time"])
    assert int(sp["n_rejected"]) < int(si["n_rejected"])
    err_i = float(jnp.max(jnp.abs(yi - ref)))
    err_p = float(jnp.max(jnp.abs(yp - ref)))
    assert err_p < 3 * max(err_i, 1e-12)
    # works under vmap (per-lane controller memory) and with tsit5
    y0s = jnp.stack([y0, 0.5 * y0])
    runs = jax.vmap(lambda y: odeint_with_stats(
        vdp, y, ts, 1e-7, 1e-9, "tsit5",
        options={"controller": "pi"})[0])(y0s)
    assert bool(jnp.isfinite(runs).all())
    # unknown controller values raise instead of silently running "i"
    with pytest.raises(ValueError, match="unknown step controller"):
        odeint_with_stats(vdp, y0, ts, 1e-7, 1e-9, "dopri5",
                          options={"controller": "PI"})


@pytest.mark.slow
def test_compensated_carry_f32_long_integration():
    # Kahan-compensated state carry (options={"compensated": True}):
    # rounding no longer random-walks over long f32 solves.  160 periods
    # of the harmonic oscillator at rtol=1e-7: plain f32 drifts ~1e-3;
    # compensated must be at least 3x more accurate (measured ~5x).
    import math

    import jax
    import numpy as np

    f = lambda t, y: jnp.stack([y[1], -y[0]])
    y0 = jnp.asarray([1.0, 0.0], jnp.float32)
    T = 1000.0
    ts = jnp.asarray([0.0, T], jnp.float32)
    exact = np.asarray([math.cos(T), -math.sin(T)])

    y_plain, st_p = odeint_with_stats(f, y0, ts, 1e-7, 1e-9, "dopri5")
    y_comp, st_c = odeint_with_stats(f, y0, ts, 1e-7, 1e-9, "dopri5",
                                     options={"compensated": True})
    err_plain = float(np.max(np.abs(np.asarray(y_plain[-1]) - exact)))
    err_comp = float(np.max(np.abs(np.asarray(y_comp[-1]) - exact)))
    assert err_comp < err_plain / 3.0, (err_plain, err_comp)
    # the 4-ulps floor costs extra steps but bounded (< 2x)
    assert int(st_c["nfe"]) < 2 * int(st_p["nfe"])

    # reverse-mode gradients flow through the compensated carry (bounded)
    def loss(y0_):
        y = odeint(f, y0_, jnp.asarray([0.0, 5.0], jnp.float32),
                   1e-5, 1e-7, "dopri5",
                   options={"compensated": True, "mode": "bounded",
                            "max_steps_per_interval": 64})
        return jnp.sum(y[-1] ** 2)

    g = jax.grad(loss)(y0)
    assert bool(jnp.isfinite(g).all())


def test_compensated_fixed_grid_rk4():
    # Kahan carry on fixed-grid integrators: 50k f32 rk4 steps of the
    # harmonic oscillator accumulate ~16x less rounding
    import math

    import jax

    f = lambda t, y: jnp.stack([y[1], -y[0]])
    y0 = jnp.asarray([1.0, 0.0], jnp.float32)
    T = 500.0
    ts = jnp.linspace(0.0, T, 50001, dtype=jnp.float32)
    exact = jnp.asarray([math.cos(T), -math.sin(T)])
    y_plain = odeint(f, y0, ts, method="rk4")
    y_comp = odeint(f, y0, ts, method="rk4", options={"compensated": True})
    err_plain = float(jnp.max(jnp.abs(y_plain[-1] - exact)))
    err_comp = float(jnp.max(jnp.abs(y_comp[-1] - exact)))
    assert err_comp < err_plain / 4.0, (err_plain, err_comp)

    # gradients flow through the compensated scan
    g = jax.grad(lambda y0_: jnp.sum(odeint(
        f, y0_, ts[:501], method="rk4",
        options={"compensated": True})[-1] ** 2))(y0)
    assert bool(jnp.isfinite(g).all())


def test_mixed_concrete_traced_time_list():
    # ADVICE r3: a Python list mixing concrete and traced scalars (e.g.
    # [0.0, t1_tracer]) must flow through the dynamic-sign traced path,
    # not raise TracerArrayConversionError in host-side canonicalization.
    f = lambda t, y: -y
    y0 = jnp.asarray(2.0)

    @jax.jit
    def solve_to(t1):
        return odeint(f, y0, [0.0, t1], method="dopri5")[-1]

    import math

    got = float(solve_to(jnp.asarray(1.5)))
    assert abs(got - 2.0 * math.exp(-1.5)) < 1e-6 * got
    # decreasing traced endpoint exercises the dynamic sign trick
    got_rev = float(jax.jit(
        lambda t1: odeint(f, y0, [0.0, t1], method="dopri5")[-1]
    )(jnp.asarray(-1.0)))
    assert abs(got_rev - 2.0 * math.exp(1.0)) < 1e-6 * got_rev


def test_tsit5_cmid_order_conditions():
    """TSIT5's derived c_mid satisfies the eight order<=4 dense-output
    conditions (same construction and gate as dopri8's,
    tests/test_dopri8.py::test_dopri8_cmid_order_conditions) — the
    midpoint is O(h^5), which is what the quartic interp_fit and the
    fused engine's tableau-agnostic dense output need."""
    import numpy as np

    from bayesian_ode_tpu.ode.tableaus import TSIT5

    A = np.zeros((7, 7))
    for i, row in enumerate(TSIT5.beta):
        A[i + 1, : len(row)] = row
    C = np.array([0.0] + list(TSIT5.alpha))
    c = np.array(TSIT5.c_mid)
    th = 0.5
    AC = A @ C
    conds = [
        (np.ones(7), th),
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
