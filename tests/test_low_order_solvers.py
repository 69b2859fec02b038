"""Low-order adaptive pairs: bosh3, fehlberg2, adaptive_heun.

These methods are beyond the vendored reference's registry
(torchdiffeq/_impl/odeint.py:8-17) but carry upstream torchdiffeq's names,
so users migrating from any torchdiffeq-based stack find them.  Gates:

- accuracy vs closed-form solutions (the reference's odeint_tests.py recipe),
- EMPIRICAL convergence order at fixed step size (ifactor=dfactor=1 pins the
  adaptive controller's dt at first_step, turning the adaptive loop into a
  fixed-step integrator),
- the non-FSAL contract: stats['nfe'] counts the fresh f(t1, y1) evaluation
  fehlberg2/adaptive_heun pay per step, and the carried f1 really is the
  endpoint slope (checked through the cubic-Hermite dense output's accuracy
  at off-step output times),
- jit/vmap/reverse-mode compatibility through the shared adaptive machinery.
"""
import jax
import jax.numpy as jnp
import pytest

import problems
from bayesian_ode_tpu import odeint, odeint_with_stats
from bayesian_ode_tpu.ode.tableaus import ADAPTIVE_HEUN, BOSH3, FEHLBERG2

NEW_METHODS = ["bosh3", "fehlberg2", "adaptive_heun"]
TABLEAUS = {"bosh3": BOSH3, "fehlberg2": FEHLBERG2, "adaptive_heun": ADAPTIVE_HEUN}


def rel_error(true, estimate):
    return jnp.max(jnp.abs((true - estimate) / true))


def test_fsal_classification():
    assert BOSH3.is_fsal
    assert not FEHLBERG2.is_fsal
    assert not ADAPTIVE_HEUN.is_fsal
    # error rows of a consistent embedded pair sum to zero
    for tab in (BOSH3, FEHLBERG2, ADAPTIVE_HEUN):
        assert abs(sum(tab.c_error)) < 1e-15
        assert abs(sum(tab.c_sol) - 1.0) < 1e-15


@pytest.mark.parametrize("method", NEW_METHODS)
@pytest.mark.parametrize("ode", ["constant", "linear", "sine"])
def test_accuracy_all_problems(method, ode):
    p = problems.construct_problem(ode=ode)
    # low-order methods at tight tolerance still meet the reference's 1e-4
    # accuracy gate (odeint_tests.py), just with more steps
    y = odeint(p.func, p.y0, p.t, rtol=1e-7, atol=1e-9, method=method)
    err = jnp.max(jnp.abs(p.sol - y)) / jnp.max(jnp.abs(p.sol))
    assert err < 1e-4


@pytest.mark.parametrize("method", NEW_METHODS)
def test_backwards_in_time(method):
    p = problems.construct_problem(ode="constant", reverse=True)
    y = odeint(p.func, p.y0, p.t, method=method)
    assert rel_error(p.sol, y) < 1e-4


@pytest.mark.parametrize("method,order", [
    ("bosh3", 3), ("fehlberg2", 2), ("adaptive_heun", 2),
])
def test_empirical_convergence_order(method, order):
    # y' = y*cos(t), y(0)=1  =>  y(t) = exp(sin t): smooth, nonlinear,
    # non-autonomous.  ifactor=dfactor=1.0 freezes dt at first_step and the
    # huge tolerance guarantees every step accepts (a rejected step would
    # otherwise retry the same dt forever), so the adaptive loop integrates
    # on a fixed grid and the global error must scale as h^order.
    def f(t, y):
        return y * jnp.cos(t)

    y0 = jnp.array([1.0])
    ts = jnp.array([0.0, 2.0])
    exact = jnp.exp(jnp.sin(2.0))

    def err_at(h):
        y = odeint(f, y0, ts, rtol=1e6, atol=1e6, method=method,
                   options={"first_step": h, "ifactor": 1.0, "dfactor": 1.0})
        return float(jnp.abs(y[-1, 0] - exact))

    e1, e2 = err_at(2.0 / 50), err_at(2.0 / 100)
    measured = jnp.log2(e1 / e2)
    assert abs(measured - order) < 0.35, (method, float(measured))


@pytest.mark.parametrize("method", NEW_METHODS)
def test_nfe_accounting_counts_non_fsal_endpoint_eval(method):
    tab = TABLEAUS[method]

    def f(t, y):
        return -y

    y0 = jnp.array([1.0])
    ts = jnp.linspace(0.0, 1.0, 2)
    _, stats = odeint_with_stats(f, y0, ts, method=method,
                                 options={"first_step": 0.01})
    attempts = int(stats["n_accepted"]) + int(stats["n_rejected"])
    # first_step given => only the one initial f0 evaluation outside steps
    assert int(stats["nfe"]) == 1 + attempts * tab.nfe_per_step


def test_non_fsal_dense_output_uses_true_endpoint_slope():
    # Off-step output times exercise the cubic-Hermite interpolant, whose
    # t1 slope is k[-1]; if k[-1] were the last tableau stage instead of
    # f(t1, y1) the interpolant would be O(h^2)-wrong in a way this
    # tolerance catches on a coarse forced grid.
    def f(t, y):
        return y * jnp.cos(t)

    y0 = jnp.array([1.0])
    ts = jnp.linspace(0.0, 2.0, 41)  # dense outputs off the step grid
    y = odeint(f, y0, ts, rtol=1e6, atol=1e6, method="fehlberg2",
               options={"first_step": 0.05, "ifactor": 1.0, "dfactor": 1.0})
    exact = jnp.exp(jnp.sin(ts))[:, None]
    assert jnp.max(jnp.abs(y - exact)) < 5e-4


@pytest.mark.parametrize("method", NEW_METHODS)
def test_jit_and_vmap(method):
    def f(t, y):
        return -y + jnp.sin(t)

    ts = jnp.linspace(0.0, 1.0, 5)

    @jax.jit
    def solve(y0):
        return odeint(f, y0, ts, rtol=1e-6, atol=1e-8, method=method)

    y0s = jnp.linspace(0.5, 1.5, 4)[:, None]
    batched = jax.vmap(solve)(y0s)
    single = solve(y0s[2])
    assert jnp.allclose(batched[2], single, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("method", NEW_METHODS)
def test_reverse_mode_gradient_bounded_mode(method):
    # reverse-mode through solver internals needs the masked-scan engine
    def f(t, y):
        return -y

    ts = jnp.array([0.0, 1.0])

    def loss(y0):
        # adaptive_heun (order 2) needs ~784 accepted steps at this
        # tolerance; an undersized budget silently truncates the solve
        # (reached_final_time=False) and reads as a 2% gradient error.
        y = odeint(f, y0, ts, rtol=1e-6, atol=1e-8, method=method,
                   options={"mode": "bounded",
                            "max_steps_per_interval": 1024})
        return y[-1, 0]

    g = jax.grad(loss)(jnp.array([2.0]))
    assert jnp.allclose(g, jnp.exp(-1.0), rtol=1e-4)
