"""ADVI and Laplace approximation: closed-form Gaussian gates.

Both approximations are EXACT when the potential is quadratic, so every
test here compares against an analytic answer: a correlated Gaussian
target and the Bayesian linear-regression toy (closed-form posterior,
models/linear_regression.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_ode_tpu.models import linear_regression as linreg
from bayesian_ode_tpu.samplers import (
    advi_log_prob,
    fit_advi,
    laplace_approximation,
    sample_advi,
    sample_laplace,
)

KEY = jax.random.PRNGKey(0)


def _gaussian_target():
    """N(mean, cov) with strong correlation; returns (U, mean, cov)."""
    mean = jnp.array([1.5, -0.5, 2.0])
    cov = jnp.array([[1.0, 0.8, 0.1],
                     [0.8, 1.0, 0.3],
                     [0.1, 0.3, 0.5]])
    prec = jnp.linalg.inv(cov)

    def potential(theta):
        d = theta - mean
        return 0.5 * d @ prec @ d

    return potential, mean, cov


def test_meanfield_advi_diagonal_gaussian_exact():
    mean = jnp.array([2.0, -1.0, 0.5, 3.0])
    sigma = jnp.array([0.5, 1.5, 0.2, 1.0])

    def potential(theta):
        return 0.5 * jnp.sum(((theta - mean) / sigma) ** 2)

    res = fit_advi(KEY, potential, jnp.zeros(4), num_steps=4000,
                   sample_size=32, learning_rate=2e-2)
    np.testing.assert_allclose(res.mu, mean, atol=0.05)
    np.testing.assert_allclose(jnp.diagonal(res.scale_tril), sigma,
                               rtol=0.08)
    # For an exactly-Gaussian target the converged ELBO equals log Z of
    # the unnormalized density: D/2 log 2pi + sum log sigma.
    log_z = 0.5 * 4 * jnp.log(2 * jnp.pi) + jnp.sum(jnp.log(sigma))
    assert abs(float(res.final_elbo) - float(log_z)) < 0.05


def test_fullrank_advi_recovers_correlations():
    potential, mean, cov = _gaussian_target()
    res = fit_advi(KEY, potential, jnp.zeros(3), num_steps=6000,
                   sample_size=32, family="fullrank", learning_rate=1e-2)
    np.testing.assert_allclose(res.mu, mean, atol=0.05)
    fitted_cov = res.scale_tril @ res.scale_tril.T
    np.testing.assert_allclose(fitted_cov, cov, atol=0.08)


def test_advi_stl_matches_analytic_entropy_fit():
    potential, mean, cov = _gaussian_target()
    res = fit_advi(KEY, potential, jnp.zeros(3), num_steps=6000,
                   sample_size=32, family="fullrank", learning_rate=1e-2,
                   stl=True)
    np.testing.assert_allclose(res.mu, mean, atol=0.05)
    np.testing.assert_allclose(res.scale_tril @ res.scale_tril.T, cov,
                               atol=0.08)


def test_advi_pytree_positions_and_sampling():
    def potential(theta):
        return (0.5 * jnp.sum((theta["w"] - 2.0) ** 2) / 0.25
                + 0.5 * (theta["b"] + 1.0) ** 2)

    init = {"w": jnp.zeros(2), "b": jnp.array(0.0)}
    res = fit_advi(KEY, potential, init, num_steps=3000, sample_size=16,
                   learning_rate=2e-2)
    draws = sample_advi(res, jax.random.PRNGKey(1), 4000)
    assert draws["w"].shape == (4000, 2)
    np.testing.assert_allclose(jnp.mean(draws["w"], 0), 2.0, atol=0.1)
    np.testing.assert_allclose(jnp.std(draws["w"], 0), 0.5, rtol=0.15)
    np.testing.assert_allclose(jnp.mean(draws["b"]), -1.0, atol=0.1)
    # log q at the mean beats log q one sigma out
    assert float(advi_log_prob(res, res.mean)) > float(
        advi_log_prob(res, {"w": res.mean["w"] + 0.5, "b": res.mean["b"]}))


def test_advi_batched_potential_matches_vmap_path():
    potential, mean, _ = _gaussian_target()

    def potential_batch(thetas):  # (S, 3) -> (S,)
        return jax.vmap(potential)(thetas)

    r1 = fit_advi(KEY, potential, jnp.zeros(3), num_steps=500,
                  sample_size=8, family="fullrank")
    r2 = fit_advi(KEY, None, jnp.zeros(3), num_steps=500, sample_size=8,
                  family="fullrank", potential_batch=potential_batch)
    np.testing.assert_allclose(r1.elbo_trace, r2.elbo_trace, rtol=1e-10)
    np.testing.assert_allclose(r1.mu, r2.mu, rtol=1e-10)


def test_fullrank_advi_linear_regression_closed_form():
    x, y = linreg.make_data(jax.random.PRNGKey(3))
    potential = linreg.make_potential(x, y)
    exact = linreg.exact_posterior(x, y)
    res = fit_advi(KEY, potential, jnp.zeros(2), num_steps=8000,
                   sample_size=32, family="fullrank", learning_rate=5e-3)
    np.testing.assert_allclose(res.mu, exact["mean"], atol=0.02)
    np.testing.assert_allclose(res.scale_tril @ res.scale_tril.T,
                               exact["cov"], rtol=0.2, atol=2e-4)


def test_laplace_exact_on_gaussian():
    potential, mean, cov = _gaussian_target()
    res = laplace_approximation(potential, jnp.zeros(3))
    np.testing.assert_allclose(res.mu, mean, atol=1e-6)
    fitted_cov = jnp.linalg.inv(res.prec_chol @ res.prec_chol.T)
    np.testing.assert_allclose(fitted_cov, cov, atol=1e-6)
    # exact log of int exp(-U): U is quadratic with minimum 0 at mean
    log_z = (0.5 * 3 * jnp.log(2 * jnp.pi)
             + 0.5 * jnp.linalg.slogdet(cov)[1])
    np.testing.assert_allclose(res.log_evidence, log_z, atol=1e-5)


def test_laplace_linear_regression_matches_closed_form():
    x, y = linreg.make_data(jax.random.PRNGKey(3))
    potential = linreg.make_potential(x, y)
    exact = linreg.exact_posterior(x, y)
    res = laplace_approximation(potential, jnp.zeros(2))
    np.testing.assert_allclose(res.mu, exact["mean"], atol=1e-5)
    cov = jnp.linalg.inv(res.prec_chol @ res.prec_chol.T)
    np.testing.assert_allclose(cov, exact["cov"], rtol=1e-5)
    draws = sample_laplace(res, jax.random.PRNGKey(5), 20000)
    np.testing.assert_allclose(jnp.mean(draws, 0), exact["mean"], atol=0.02)
    np.testing.assert_allclose(jnp.cov(draws.T), exact["cov"], rtol=0.1,
                               atol=2e-4)


def test_laplace_evidence_cross_checks_quadratic_formula():
    # int exp(-U) for quadratic U = 0.5 th'P th - b'th + c has the exact
    # closed form used by Laplace; verify with an off-center potential.
    P = jnp.array([[2.0, 0.3], [0.3, 1.0]])
    b = jnp.array([0.5, -1.0])

    def potential(theta):
        return 0.5 * theta @ P @ theta - b @ theta + 0.7

    res = laplace_approximation(potential, jnp.zeros(2))
    mode = jnp.linalg.solve(P, b)
    log_z = (-potential(mode) + jnp.log(2 * jnp.pi)
             - 0.5 * jnp.linalg.slogdet(P)[1])
    np.testing.assert_allclose(res.log_evidence, log_z, atol=1e-6)


def test_meanfield_advi_stl_diagonal_path():
    # The meanfield STL branch uses the O(D) diagonal logpdf — check it
    # converges to the same answer as the analytic-entropy estimator.
    mean = jnp.array([2.0, -1.0, 0.5, 3.0])
    sigma = jnp.array([0.5, 1.5, 0.2, 1.0])

    def potential(theta):
        return 0.5 * jnp.sum(((theta - mean) / sigma) ** 2)

    res = fit_advi(KEY, potential, jnp.zeros(4), num_steps=4000,
                   sample_size=32, learning_rate=2e-2, stl=True)
    np.testing.assert_allclose(res.mu, mean, atol=0.05)
    np.testing.assert_allclose(jnp.diagonal(res.scale_tril), sigma,
                               rtol=0.08)


def test_laplace_hessian_pd_flag():
    potential, _, _ = _gaussian_target()
    assert bool(laplace_approximation(potential, jnp.zeros(3)).hessian_pd)

    # Saddle: dU/dx1 = -sin(x1) vanishes identically on the start line, so
    # L-BFGS terminates at x1=0 where the Hessian has a -1 eigenvalue.
    def saddle(theta):
        return theta[0] ** 2 + jnp.cos(theta[1])

    res = laplace_approximation(saddle, jnp.array([1.0, 0.0]))
    assert not bool(res.hessian_pd)
    assert not np.isfinite(float(res.log_evidence))


def test_advi_warm_start_agrees_with_laplace_on_linreg():
    # The intended workflow: ADVI fit -> use as preconditioner/warm start.
    x, y = linreg.make_data(jax.random.PRNGKey(3))
    potential = linreg.make_potential(x, y)
    lap = laplace_approximation(potential, jnp.zeros(2))
    advi = fit_advi(KEY, potential, jnp.zeros(2), num_steps=8000,
                    sample_size=32, family="fullrank", learning_rate=5e-3)
    np.testing.assert_allclose(advi.mu, lap.mu, atol=0.02)
    # and the ELBO lower-bounds the Laplace evidence (exact here)
    assert float(advi.final_elbo) <= float(lap.log_evidence) + 0.02
