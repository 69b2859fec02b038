"""odeint_dense: continuous solution output.

Beyond the vendored reference (torchdiffeq interpolates only at the
caller's fixed grid, solvers.py:25-33) and upstream torchdiffeq; API
mirrors diffrax's SaveAt(dense=True) / sol.evaluate.
"""
import jax
import jax.numpy as jnp
import pytest

from bayesian_ode_tpu import DenseSolution, odeint, odeint_dense


def exp_field(t, y):
    return -y


@pytest.mark.parametrize(
    "method", ["dopri5", "tsit5", "dopri8", "bosh3", "sdirk4"])
def test_dense_matches_odeint_grid(method):
    y0 = jnp.array([1.0, 2.0])
    sol, stats = odeint_dense(exp_field, y0, 0.0, 5.0, rtol=1e-7,
                              atol=1e-9, method=method)
    assert bool(stats["reached_final_time"])
    ts = jnp.linspace(0.0, 5.0, 37)
    ys_grid = odeint(exp_field, y0, ts, rtol=1e-7, atol=1e-9, method=method)
    ys_dense = sol(ts)
    # identical interpolants over identical step meshes -> tight match
    assert jnp.max(jnp.abs(ys_dense - ys_grid)) < 1e-6


def test_dense_accuracy_vs_exact():
    sol, _ = odeint_dense(exp_field, jnp.array([1.0]), 0.0, 3.0,
                          rtol=1e-8, atol=1e-10, method="dopri5")
    ts = jnp.linspace(0.0, 3.0, 101)
    err = jnp.abs(sol(ts)[:, 0] - jnp.exp(-ts))
    assert float(err.max()) < 1e-6


def test_dense_scalar_and_shape_queries():
    sol, _ = odeint_dense(exp_field, jnp.ones(3), 0.0, 2.0)
    y = sol(1.3)
    assert y.shape == (3,)
    y2 = sol(jnp.ones((4, 5)) * 0.7)
    assert y2.shape == (4, 5, 3)
    assert jnp.allclose(y2[0, 0], sol(0.7))


def test_dense_reverse_time():
    sol, stats = odeint_dense(exp_field, jnp.array([1.0]), 2.0, 0.0,
                              rtol=1e-8, atol=1e-10)
    assert bool(stats["reached_final_time"])
    # y(t) = exp(-(t - 2)) going backwards from y(2)=1
    for t in (2.0, 1.0, 0.0):
        assert abs(float(sol(t)[0]) - jnp.exp(-(t - 2.0))) < 1e-6


def test_dense_pytree_state_and_jit():
    def f(t, y):
        return {"a": -y["a"], "b": 0.5 * y["b"]}

    y0 = {"a": jnp.array([1.0]), "b": jnp.array([1.0])}

    @jax.jit
    def solve_and_eval(y0, tq):
        sol, _ = odeint_dense(f, y0, 0.0, 1.0, rtol=1e-8, atol=1e-10)
        return sol(tq), sol

    y, sol = solve_and_eval(y0, 0.5)
    assert isinstance(sol, DenseSolution)  # pytree crosses the jit boundary
    assert abs(float(y["a"][0]) - jnp.exp(-0.5)) < 1e-7
    assert abs(float(y["b"][0]) - jnp.exp(0.25)) < 1e-7
    # and evaluation works on the returned (jit-output) object too
    y2 = sol(jnp.array([0.25, 0.75]))
    assert abs(float(y2["a"][1, 0]) - jnp.exp(-0.75)) < 1e-7


def test_dense_vmap_per_chain_meshes():
    # per-chain stiffness -> different step meshes; vmapped dense solves
    # must each evaluate on their own mesh
    lams = jnp.array([0.5, 2.0, 8.0])

    def solve(lam):
        sol, _ = odeint_dense(lambda t, y: -lam * y, jnp.array([1.0]),
                              0.0, 2.0, rtol=1e-8, atol=1e-10)
        return sol(jnp.linspace(0.0, 2.0, 9))

    ys = jax.vmap(solve)(lams)
    expect = jnp.exp(-lams[:, None] * jnp.linspace(0.0, 2.0, 9))
    assert jnp.max(jnp.abs(ys[..., 0] - expect)) < 1e-6


def test_dense_capacity_overflow_is_reported():
    sol, stats = odeint_dense(exp_field, jnp.array([1.0]), 0.0, 50.0,
                              rtol=1e-10, atol=1e-12,
                              options={"dense_steps": 4})
    assert not bool(stats["reached_final_time"])
    # clamped evaluation still returns the last recorded polynomial
    assert jnp.isfinite(sol(50.0)).all()
    assert float(sol.t1) < 50.0


def test_dense_complex_state():
    # y' = i*w*y -> y(t) = exp(i*w*t)
    w = 3.0
    sol, _ = odeint_dense(lambda t, y: 1j * w * y,
                          jnp.array([1.0 + 0.0j]), 0.0, 2.0,
                          rtol=1e-8, atol=1e-10)
    t = 1.37
    y = sol(t)
    assert jnp.iscomplexobj(y)
    assert abs(complex(y[0]) - jnp.exp(1j * w * t)) < 1e-6


def test_dense_zero_length_span():
    y0 = jnp.array([1.5, -2.0])
    sol, stats = odeint_dense(exp_field, y0, 1.0, 1.0)
    assert bool(stats["reached_final_time"])
    assert jnp.allclose(sol(1.0), y0)


def test_dense_forward_mode_grad():
    # JVP flows through solve + evaluation (while_loop has JVP rules)
    def yT(lam):
        sol, _ = odeint_dense(lambda t, y: -lam * y, jnp.array([1.0]),
                              0.0, 1.0, rtol=1e-10, atol=1e-12)
        return sol(1.0)[0]

    g = jax.jacfwd(yT)(jnp.asarray(0.7))
    # d/dlam exp(-lam) = -exp(-lam)
    assert abs(float(g) + jnp.exp(-0.7)) < 1e-6


def test_dense_grad_wrt_query_time():
    sol, _ = odeint_dense(exp_field, jnp.array([1.0]), 0.0, 2.0,
                          rtol=1e-10, atol=1e-12)
    dy = jax.grad(lambda t: sol(t)[0])(jnp.asarray(1.1))
    assert abs(float(dy) + jnp.exp(-1.1)) < 1e-5


def test_dense_unknown_option_raises():
    with pytest.raises(ValueError, match="unknown odeint_dense options"):
        odeint_dense(exp_field, jnp.ones(1), 0.0, 1.0,
                     options={"bogus": 1})
