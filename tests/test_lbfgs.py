"""L-BFGS gates: two-loop recursion vs dense inverse-Hessian build,
curvature rejection/damping, line-search convergence on standard problems.
The reference has no optimizer tests (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_ode_tpu.optim import (
    curvature_update,
    lbfgs_init,
    lbfgs_minimize,
    lbfgs_step,
    two_loop_recursion,
)


def rosenbrock(x):
    return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1.0 - x[:-1]) ** 2)


def quadratic_problem(P=8, seed=0):
    rng = np.random.RandomState(seed)
    A = rng.randn(P, P)
    A = A @ A.T + P * np.eye(P)
    b = rng.randn(P)
    Aj, bj = jnp.asarray(A), jnp.asarray(b)
    return lambda x: 0.5 * x @ Aj @ x - bj @ x, A, b


def test_two_loop_matches_dense_inverse_hessian():
    # Insert (s, y) pairs and compare H @ v with the dense BFGS recursion.
    rng = np.random.RandomState(0)
    P, m = 6, 4
    fn, A, b = quadratic_problem(P)
    vg = jax.value_and_grad(fn)
    state, _ = lbfgs_init(vg, jnp.asarray(rng.randn(P)), history_size=m)

    H = np.eye(P)
    first = True
    for k in range(m):
        s = rng.randn(P)
        y = A @ s  # exact curvature: y = A s, s'y > 0
        rho = 1.0 / (s @ y)
        E = np.eye(P) - rho * np.outer(s, y)
        if first:
            H = (s @ y) / (y @ y) * np.eye(P)
            first = False
        H = E @ H @ E.T + rho * np.outer(s, s)
        state = state._replace(
            s_buf=state.s_buf.at[:-1].set(state.s_buf[1:]).at[-1].set(s),
            y_buf=state.y_buf.at[:-1].set(state.y_buf[1:]).at[-1].set(y),
            valid=state.valid.at[:-1].set(state.valid[1:]).at[-1].set(True),
            h_diag=jnp.asarray((s @ y) / (y @ y)),
        )
    v = jnp.asarray(rng.randn(P))
    Hv = two_loop_recursion(state, v)
    # dense reference recomputed with the same H_diag convention: H0 fixed
    # from the most recent pair (standard L-BFGS), rebuild explicitly
    sbuf = np.asarray(state.s_buf)
    ybuf = np.asarray(state.y_buf)
    h0 = float(state.h_diag)
    Hd = h0 * np.eye(P)
    for s, y in zip(sbuf, ybuf):
        rho = 1.0 / (s @ y)
        E = np.eye(P) - rho * np.outer(s, y)
        Hd = E @ Hd @ E.T + rho * np.outer(s, s)
    np.testing.assert_allclose(np.asarray(Hv), Hd @ np.asarray(v), rtol=1e-9)


def test_curvature_rejection_and_damping():
    fn, A, b = quadratic_problem()
    vg = jax.value_and_grad(fn)
    state, _ = lbfgs_init(vg, jnp.zeros(8), history_size=3)
    # fabricate a failed-curvature scenario with s'Bs > 0 but y's < eps*s'Bs:
    # s = d*t = ones, Bs = -t*prev_grad = ones, y = grad - prev_grad = -0.1.
    prev = -jnp.ones(8)
    grad = prev - 0.1
    state = state._replace(
        n_iter=jnp.asarray(1, jnp.int32),
        d=jnp.ones(8), t=jnp.asarray(1.0), prev_grad=prev,
    )
    rejected = curvature_update(state, grad, eps=1e-2, damping=False)
    assert int(rejected.curv_skips) == 1
    assert not bool(rejected.valid[-1])
    damped = curvature_update(state, grad, eps=1e-2, damping=True)
    assert bool(damped.valid[-1])  # Powell damping always inserts
    # damped pair satisfies y's = eps*s'Bs > 0 (LBFGS.py:385-389)
    s = damped.s_buf[-1]
    y = damped.y_buf[-1]
    np.testing.assert_allclose(float(jnp.dot(s, y)), 1e-2 * 8.0, rtol=1e-9)


@pytest.mark.parametrize("line_search", ["none", "armijo", "wolfe"])
def test_quadratic_convergence(line_search):
    fn, A, b = quadratic_problem()
    x_star = np.linalg.solve(A, b)
    lr = 0.1 if line_search == "none" else 1.0
    iters = 400 if line_search == "none" else 60
    x, value, trace, state = lbfgs_minimize(
        fn, jnp.zeros(8), max_iters=iters, line_search=line_search, lr=lr
    )
    np.testing.assert_allclose(np.asarray(x), x_star, atol=1e-4)


@pytest.mark.parametrize("line_search", ["armijo", "wolfe"])
def test_rosenbrock_convergence(line_search):
    x, value, trace, state = lbfgs_minimize(
        rosenbrock, jnp.zeros(6), max_iters=200, line_search=line_search,
        history_size=10,
    )
    assert float(value) < 1e-8, value
    np.testing.assert_allclose(np.asarray(x), np.ones(6), atol=1e-3)


def test_minimize_under_jit():
    fn, A, b = quadratic_problem()
    run = jax.jit(lambda x0: lbfgs_minimize(fn, x0, max_iters=40)[1])
    assert float(run(jnp.zeros(8))) < float(fn(jnp.zeros(8)))


# ---- minFunc polyinterp parity (VERDICT r1 #5) ----

def _reference_polyinterp():
    import os
    import sys
    if not os.path.isdir("/root/reference/optims"):
        pytest.skip("reference checkout not available")
    sys.path.insert(0, "/root/reference")
    np.Inf = np.inf  # the reference still uses the numpy<2 alias
    from optims.LBFGS import polyinterp
    return polyinterp


def test_quad_min_matches_reference_polyinterp():
    from bayesian_ode_tpu.optim import quad_min

    ref = _reference_polyinterp()
    cases = [
        # (x1, f1, g1, x2, f2): descent from x1, overshoot at x2
        (0.0, 1.0, -2.0, 1.0, 0.8),
        (0.0, 5.0, -0.3, 2.0, 4.9),
        (0.2, 1.0, -2.0, 1.0, 0.8),     # general (x1 != 0) branch
        (0.0, 1.0, -2.0, 0.5, 3.0),     # big overshoot -> tiny step
        (1.0, 2.0, -1.0, 3.0, 2.5),
    ]
    for x1, f1, g1, x2, f2 in cases:
        expected = ref(np.array([[x1, f1, g1], [x2, f2, np.nan]]))
        got = float(quad_min(*map(jnp.float64, (x1, f1, g1, x2, f2)),
                             jnp.float64(min(x1, x2)),
                             jnp.float64(max(x1, x2))))
        np.testing.assert_allclose(got, expected, rtol=1e-12, err_msg=str(
            (x1, f1, g1, x2, f2)))


def test_cubic_min_matches_reference_polyinterp():
    from bayesian_ode_tpu.optim import cubic_min

    ref = _reference_polyinterp()
    cases = [
        # (x1, f1, g1, x2, f2, g2) with a real discriminant
        (0.0, 1.0, -2.0, 1.0, 0.8, 1.5),
        (0.0, 3.0, -1.0, 2.0, 2.0, 0.5),
        (0.5, 1.0, -0.7, 1.5, 0.9, 0.9),
        (0.0, 1.0, -2.0, 1.0, 1.5, 4.0),
    ]
    for x1, f1, g1, x2, f2, g2 in cases:
        expected = ref(np.array([[x1, f1, g1], [x2, f2, g2]]))
        got = float(cubic_min(*map(jnp.float64, (x1, f1, g1, x2, f2, g2)),
                              jnp.float64(min(x1, x2)),
                              jnp.float64(max(x1, x2))))
        np.testing.assert_allclose(got, expected, rtol=1e-12, err_msg=str(
            (x1, f1, g1, x2, f2, g2)))
    # negative discriminant (d1 = 0, g1*g2 > 0): the reference's
    # np.isreal(nan) guard lets NaN through (LBFGS.py:85-90, documented
    # deviation) — here: bisection
    bad = float(cubic_min(*map(jnp.float64, (0.0, 1.0, 1.0, 1.0, 5.0 / 3.0,
                                             1.0)), jnp.float64(0.0),
                          jnp.float64(1.0)))
    assert bad == 0.5


def test_cubic_min_3pt_matches_reference_polyinterp():
    from bayesian_ode_tpu.optim import cubic_min_3pt

    ref = _reference_polyinterp()
    cases = [
        # (x1, f1, g1) + (x2, f2), (x3, f3): the Armijo >=2-backtrack
        # pattern [0, t_new, t_prev]
        (0.0, 1.0, -2.0, 1.0, 0.8, 2.0, 1.5),
        (0.0, 2.0, -0.5, 0.6, 1.9, 1.2, 2.4),
        (0.0, 1.0, -1.0, 0.3, 0.95, 0.9, 1.3),
        (0.0, 4.0, -3.0, 0.8, 3.1, 1.6, 5.0),
    ]
    for x1, f1, g1, x2, f2, x3, f3 in cases:
        expected = ref(np.array([[x1, f1, g1], [x2, f2, np.nan],
                                 [x3, f3, np.nan]]))
        lo = min(x1, x2, x3)
        hi = max(x1, x2, x3)
        got = float(cubic_min_3pt(
            *map(jnp.float64, (x1, f1, g1, x2, f2, x3, f3)),
            jnp.float64(lo), jnp.float64(hi)))
        np.testing.assert_allclose(got, expected, rtol=1e-9, atol=1e-12,
                                   err_msg=str((x1, f1, g1, x2, f2, x3, f3)))


def test_polyinterp_jittable():
    from bayesian_ode_tpu.optim import cubic_min, cubic_min_3pt, quad_min

    args = tuple(jnp.float64(v) for v in (0.0, 1.0, -2.0, 1.0, 0.8))
    assert np.isfinite(float(jax.jit(quad_min)(*args, 0.0, 1.0)))
    args = tuple(jnp.float64(v) for v in (0.0, 1.0, -2.0, 1.0, 0.8, 1.5))
    assert np.isfinite(float(jax.jit(cubic_min)(*args, 0.0, 1.0)))
    args = tuple(jnp.float64(v) for v in (0.0, 1.0, -2.0, 1.0, 0.8, 2.0,
                                          1.5))
    assert np.isfinite(float(jax.jit(cubic_min_3pt)(*args, 0.0, 2.0)))


def test_interpolation_reduces_rosenbrock_closure_work():
    # VERDICT r1 #5 "done" gate: the polyinterp line searches must reach
    # the optimum in fewer iterations than the pure eta-division /
    # bisection searches on Rosenbrock (each iteration re-runs the
    # closure max_ls times, so iterations-to-tolerance is closure work).
    def first_below(trace, tol=1e-8):
        below = np.asarray(trace) < tol
        assert below.any(), "did not converge"
        return int(np.argmax(below))

    iters = {}
    for interpolate in (False, True):
        _, _, trace, _ = lbfgs_minimize(
            rosenbrock, jnp.zeros(6), max_iters=200, line_search="wolfe",
            history_size=10, interpolate=interpolate,
        )
        iters[interpolate] = first_below(trace)
    assert iters[True] < iters[False], iters


def test_lbfgs_survives_inf_cliff():
    """Regression (2026-08-21): a trial step into a non-finite region
    (exploding ODE trajectories on GP-ODE MAP fits) must be rejected,
    not accepted into the state — one inf used to nan-poison the (s, y)
    history and every later iterate.  The cliff sits close enough that
    default-lr trial steps overshoot into it."""
    from bayesian_ode_tpu.optim import lbfgs_minimize

    def f(p):
        x = p["x"]
        quad = jnp.sum((x - 1.0) ** 2)
        return jnp.where(jnp.max(jnp.abs(x)) > 1.6, jnp.inf, quad)

    x0 = {"x": jnp.asarray([-1.4, -1.5])}     # steps toward 1.0 overshoot
    pos, val, trace, state = lbfgs_minimize(f, x0, max_iters=60)
    trace = np.asarray(trace)
    assert np.isfinite(trace).all(), trace[:10]
    # monotone non-increasing values (rejected steps hold the value)
    assert np.all(np.diff(trace) <= 1e-12)
    assert float(val) < 1e-6, float(val)
    np.testing.assert_allclose(np.asarray(pos["x"]), [1.0, 1.0], atol=1e-3)
