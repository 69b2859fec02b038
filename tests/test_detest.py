"""Fast DETEST gate: a representative problem subset must meet NFE and
accuracy envelopes (the full battery is benchmarks/detest/run.py, mirroring
neuralode_tests/DETEST/run.py)."""
import sys

import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, "benchmarks/detest")
import detest  # noqa: E402

from bayesian_ode_tpu import odeint_with_stats  # noqa: E402

SUBSET = ["A1", "A3", "B1", "B4", "C3", "D2", "E2"]


def solve(builder, rtol, atol, method):
    diffeq, init, _ = builder()
    t0, y0 = init()
    ts = jnp.stack([t0, jnp.asarray(20.0)])
    ys, stats = odeint_with_stats(diffeq, y0, ts, rtol, atol, method)
    return jax.tree.map(lambda a: a[-1], ys), stats


@pytest.mark.parametrize("name", SUBSET)
def test_dopri5_vs_tight_reference(name):
    builder = detest.ALL_PROBLEMS[name]
    ref, _ = solve(builder, 1e-12, 1e-12, "dopri5")
    est, stats = solve(builder, 1e-6, 1e-6, "dopri5")
    err = float(jnp.sqrt(jnp.mean((ref - est) ** 2)))
    # Global error over [0, 20] at local tol 1e-6 — envelope chosen from the
    # recorded battery (benchmarks/detest/RESULTS.txt); the D orbits
    # accumulate ~1e-3 like the reference solver does.
    assert err < 5e-3, (name, err)
    assert bool(stats["reached_final_time"])
    # NFE envelope: nonstiff problems at tol 1e-6 solve within ~2k evals
    assert int(stats["nfe"]) < 2500, (name, int(stats["nfe"]))


@pytest.mark.parametrize("name", ["A1", "B1", "D1"])
def test_adams_vs_tight_reference(name):
    builder = detest.ALL_PROBLEMS[name]
    ref, _ = solve(builder, 1e-12, 1e-12, "dopri5")
    est, stats = solve(builder, 1e-6, 1e-6, "adams")
    err = float(jnp.sqrt(jnp.mean((ref - est) ** 2)))
    # VCABM envelope (predictor-return parity quirk, vcabm.py docstring)
    assert err < 0.1, (name, err)


def test_analytic_solutions_where_known():
    for name in ["A1", "A2", "A3", "A4"]:
        diffeq, init, solution = detest.ALL_PROBLEMS[name]()
        t0, y0 = init()
        ts = jnp.stack([t0, jnp.asarray(20.0)])
        ys, _ = odeint_with_stats(diffeq, y0, ts, 1e-10, 1e-12, "dopri5")
        exact = solution(jnp.asarray(20.0))
        assert float(jnp.max(jnp.abs(ys[-1] - exact))) < 1e-8, name
