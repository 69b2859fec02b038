"""Stiff (DIRK) solver gates: tableau algebra, stiff accuracy, IFT gradients.

No reference analogue — the reference stack is nonstiff-only (torchdiffeq/
_impl has no implicit methods; SURVEY.md §2.1).  Oracles here are closed
forms, scipy's Radau, and the Butcher order conditions themselves.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import problems
from bayesian_ode_tpu import odeint, odeint_with_stats
from bayesian_ode_tpu.ode.dirk import DIRK_TABLEAUS

IMPLICIT_METHODS = ["sdirk4", "trbdf2"]

# order of the SOLUTION weights b / embedded weights b_hat = b - b_error
_ORDERS = {"sdirk4": (4, 3), "trbdf2": (2, 3)}


def _order_residuals(A, b, c, order):
    """Max residual of the Butcher order conditions up to `order` (<=4)."""
    A, b, c = np.asarray(A), np.asarray(b), np.asarray(c)
    conds = [(1, b.sum() - 1.0)]
    conds.append((2, b @ c - 1 / 2))
    conds.append((3, b @ c**2 - 1 / 3))
    conds.append((3, b @ (A @ c) - 1 / 6))
    conds.append((4, b @ c**3 - 1 / 4))
    conds.append((4, (b * c) @ (A @ c) - 1 / 8))
    conds.append((4, b @ (A @ c**2) - 1 / 12))
    conds.append((4, b @ (A @ (A @ c)) - 1 / 24))
    return max(abs(r) for p, r in conds if p <= order)


@pytest.mark.parametrize("method", IMPLICIT_METHODS)
def test_tableau_order_conditions(method):
    tab = DIRK_TABLEAUS[method]
    p_b, p_hat = _ORDERS[method]
    A = np.asarray(tab.A)
    b = np.asarray(tab.b)
    c = np.asarray(tab.c)
    b_hat = b - np.asarray(tab.b_error)
    assert _order_residuals(A, b, c, p_b) < 1e-14
    assert _order_residuals(A, b_hat, c, p_hat) < 1e-14
    # stiffly accurate: b is the last row of A, so y1 is the last stage
    assert np.max(np.abs(b - A[-1])) < 1e-15
    # consistent stage times
    assert np.max(np.abs(c - A.sum(axis=1))) < 1e-14
    # shared implicit diagonal (the SDIRK property: one LU for all stages)
    diag = np.diag(A)
    assert np.all((diag == 0.0) | (np.abs(diag - tab.gamma) < 1e-15))


@pytest.mark.parametrize("method", IMPLICIT_METHODS)
def test_l_stability(method):
    """R(z) = 1 + z b (I - zA)^-1 1 must vanish as z -> -inf (L-stable)."""
    tab = DIRK_TABLEAUS[method]
    A = np.asarray(tab.A)
    b = np.asarray(tab.b)
    ones = np.ones(len(tab.c))

    def R(z):
        return 1.0 + z * b @ np.linalg.solve(np.eye(len(b)) - z * A, ones)

    # A-stability on the negative real axis and hard damping at -inf
    # (|z| much beyond 1e8 only measures solve() conditioning noise,
    # which grows like eps * |z|)
    for z in [-0.1, -1.0, -10.0, -1e3, -1e6]:
        assert abs(R(z)) <= 1.0 + 1e-12
    assert abs(R(-1e8)) < 1e-5


def _stiff_linear(lam):
    """y' = -lam (y - cos t), y(0) = 0, with its closed form."""

    def f(t, y):
        return -lam * (y - jnp.cos(t))

    a = lam**2 / (1 + lam**2)
    c = lam / (1 + lam**2)

    def sol(t):
        return a * jnp.cos(t) + c * jnp.sin(t) - a * jnp.exp(-lam * t)

    return f, sol


@pytest.mark.parametrize("method", IMPLICIT_METHODS)
def test_stiff_linear_accuracy(method):
    f, sol = _stiff_linear(2000.0)
    ts = jnp.linspace(0.0, 1.5, 6)
    ys, stats = odeint_with_stats(f, jnp.array([0.0]), ts, rtol=1e-6,
                                  atol=1e-9, method=method)
    assert bool(stats["reached_final_time"])
    assert float(jnp.max(jnp.abs(ys[:, 0] - sol(ts)))) < 1e-5


@pytest.mark.parametrize("method", IMPLICIT_METHODS)
def test_dense_output_between_steps(method):
    """Cubic-Hermite dense output holds accuracy at off-step times."""
    f, sol = _stiff_linear(200.0)
    ts = jnp.linspace(0.0, 2.0, 41)
    ys = odeint(f, jnp.array([0.0]), ts, rtol=1e-7, atol=1e-10,
                method=method)
    assert float(jnp.max(jnp.abs(ys[:, 0] - sol(ts)))) < 1e-6


def test_vdp_mu1000_vs_radau_oracle():
    """Van der Pol mu=1000 over [0, 300]: the classic stiff gate.

    An explicit method needs O(mu * T) ~ 3e5 steps here (stability-bound
    step ~ 1/mu on the slow manifold); sdirk4 takes ~33.  Oracle: scipy
    Radau at rtol 1e-10 (values pinned so scipy is not a test dependency).
    """

    def vdp(t, y):
        return jnp.array([y[1], 1000.0 * ((1 - y[0]**2) * y[1]) - y[0]])

    ts = jnp.array([0.0, 100.0, 200.0, 300.0])
    ys, stats = odeint_with_stats(vdp, jnp.array([2.0, 0.0]), ts,
                                  rtol=1e-6, atol=1e-8, method="sdirk4")
    # solve_ivp(..., method="Radau", rtol=1e-10, atol=1e-12)
    oracle = np.array([
        [1.93136132e+00, -7.07417628e-04],
        [1.85820595e+00, -7.57545415e-04],
        [1.77939777e+00, -8.21415703e-04],
    ])
    assert bool(stats["reached_final_time"])
    assert int(stats["n_accepted"]) < 100
    err = np.abs(np.asarray(ys[1:]) - oracle)
    assert np.max(err[:, 0]) < 1e-5
    assert np.max(err[:, 1]) < 1e-7


def test_stiff_efficiency_vs_explicit():
    """On a severely stiff field the implicit solver finishes in a few
    hundred steps where the explicit one exhausts a 20k-step budget
    (stability-bound h ~ 1/lam forces ~1e6/1.5 steps at lam=1e6)."""
    f, sol = _stiff_linear(1e6)
    ts = jnp.linspace(0.0, 1.5, 6)
    ys, s_imp = odeint_with_stats(f, jnp.array([0.0]), ts, rtol=1e-6,
                                  atol=1e-9, method="sdirk4")
    assert bool(s_imp["reached_final_time"])
    assert int(s_imp["n_accepted"]) + int(s_imp["n_rejected"]) < 1000
    assert float(jnp.max(jnp.abs(ys[:, 0] - sol(ts)))) < 1e-5
    _, s_exp = odeint_with_stats(f, jnp.array([0.0]), ts, rtol=1e-6,
                                 atol=1e-9, method="dopri5",
                                 options={"max_num_steps": 20000})
    assert not bool(s_exp["reached_final_time"])


@pytest.mark.parametrize("method", IMPLICIT_METHODS)
def test_gradient_matches_analytic(method):
    """IFT gradients: d y(1) / d lam against the closed form.

    The analytic gradient at lam=500 is dominated by
    d/dlam [lam/(1+lam^2)] * sin(1) ~ -3.357e-6 — five orders below the
    solution scale, so unrolled-Newton gradient bugs (20% off for sdirk4,
    1e21 blow-up for trbdf2 before the custom_root fix) fail this loudly.
    """
    lam0 = 500.0
    ts = jnp.linspace(0.0, 1.0, 3)

    def loss(lam, opts):
        def f(t, y):
            return -lam * (y - jnp.cos(t))
        ys = odeint(f, jnp.array([0.0]), ts, rtol=1e-6, atol=1e-9,
                    method=method, options=opts)
        return ys[-1, 0]

    lam2 = lam0**2
    d_a = 2 * lam0 / (1 + lam2) ** 2
    d_c = (1 - lam2) / (1 + lam2) ** 2
    g_true = (d_a * math.cos(1.0) + d_c * math.sin(1.0)
              - d_a * math.exp(-lam0))

    g_rev = jax.grad(loss)(
        lam0, {"mode": "bounded", "max_steps_per_interval": 2048})
    g_fwd = jax.jvp(lambda l: loss(l, {}), (lam0,), (1.0,))[1]
    assert abs(float(g_rev) - g_true) < 5e-3 * abs(g_true)
    assert abs(float(g_fwd) - g_true) < 5e-3 * abs(g_true)
    # while-mode JVP and bounded-mode VJP differentiate the same discrete map
    assert abs(float(g_rev) - float(g_fwd)) < 1e-3 * abs(g_true)


def test_continuous_adjoint_through_sdirk4():
    """odeint_adjoint composes with the implicit solver: the adjoint ODE of
    a stiff system is stiff in reverse time, so the backward pass needs an
    L-stable method too."""
    from bayesian_ode_tpu import odeint_adjoint

    lam0 = 500.0
    ts = jnp.linspace(0.0, 1.0, 3)

    def loss(lam):
        def f(t, y):
            return -lam * (y - jnp.cos(t))
        ys = odeint_adjoint(f, jnp.array([0.0]), ts, rtol=1e-6, atol=1e-9,
                            method="sdirk4")
        return ys[-1, 0]

    lam2 = lam0**2
    g_true = (2 * lam0 / (1 + lam2) ** 2 * math.cos(1.0)
              + (1 - lam2) / (1 + lam2) ** 2 * math.sin(1.0)
              - 2 * lam0 / (1 + lam2) ** 2 * math.exp(-lam0))
    g = jax.grad(loss)(lam0)
    # continuous-adjoint discretization error is O(rtol)-ish, not the
    # frozen-mesh discrete-map error — a few percent at rtol 1e-6
    assert abs(float(g) - g_true) < 0.05 * abs(g_true)


def test_vmap_per_chain_step_control():
    """vmapped solves carry independent per-chain step decisions."""

    ts = jnp.linspace(0.0, 1.0, 3)

    def solve_end(lam):
        def f(t, y):
            return -lam * (y - jnp.cos(t))
        return odeint(f, jnp.array([0.0]), ts, rtol=1e-6, atol=1e-9,
                      method="sdirk4")[-1, 0]

    lams = jnp.array([10.0, 200.0, 3000.0])
    batched = jax.vmap(solve_end)(lams)
    looped = jnp.stack([solve_end(l) for l in lams])
    assert float(jnp.max(jnp.abs(batched - looped))) < 1e-12


@pytest.mark.parametrize("method", IMPLICIT_METHODS)
def test_reverse_time(method):
    p = problems.construct_problem(ode="constant", reverse=True)
    y = odeint(p.func, p.y0, p.t, method=method)
    assert float(jnp.max(jnp.abs((p.sol - y) / p.sol))) < 1e-4


def test_newton_starvation_degrades_gracefully():
    """With a starved Newton budget steps reject and shrink, not NaN."""
    f, sol = _stiff_linear(2000.0)
    ts = jnp.linspace(0.0, 1.0, 3)
    ys, stats = odeint_with_stats(
        f, jnp.array([0.0]), ts, rtol=1e-6, atol=1e-9, method="sdirk4",
        options={"newton_iters": 2, "newton_kappa": 1e-3},
    )
    assert bool(stats["reached_final_time"])
    assert bool(jnp.all(jnp.isfinite(ys)))
    assert float(jnp.max(jnp.abs(ys[:, 0] - sol(ts)))) < 1e-5


@pytest.mark.parametrize("method", ["sdirk4", "dopri5"])
def test_divergence_exits_promptly(method):
    """A solve whose state overflows must abort, not spin out the 2^20
    budget: once dt decays to NaN or 0 no step can be accepted, and on
    TPU a 2^20-iteration implicit loop outlives the runtime watchdog
    (observed worker kill before the adaptive._can_step guard)."""

    def aug(t, s):
        y, a = s
        return (-1000.0 * (y - jnp.cos(t)), 1000.0 * a)  # a(t) = e^1000t

    ts = jnp.linspace(0.0, 1.0, 3)
    s0 = (jnp.array([0.0]), jnp.array([1.0]))
    _, st = odeint_with_stats(aug, s0, ts, rtol=1e-6, atol=1e-9,
                              method=method)
    assert not bool(st["reached_final_time"])
    assert int(st["n_accepted"]) + int(st["n_rejected"]) < 100_000


def test_compensated_not_supported():
    f, _ = _stiff_linear(10.0)
    with pytest.raises(ValueError, match="compensated"):
        odeint(f, jnp.array([0.0]), jnp.linspace(0.0, 1.0, 3),
               method="sdirk4", options={"compensated": True})


def test_budget_truncation_is_flagged():
    """A too-small bounded budget must set reached_final_time=False."""
    f, _ = _stiff_linear(2000.0)
    ts = jnp.linspace(0.0, 1.5, 3)
    _, stats = odeint_with_stats(
        f, jnp.array([0.0]), ts, rtol=1e-8, atol=1e-11, method="sdirk4",
        options={"mode": "bounded", "max_steps_per_interval": 64},
    )
    assert not bool(stats["reached_final_time"])
