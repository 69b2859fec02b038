"""Bayesian linear regression toy: samplers vs the closed-form Gaussian
posterior (the reference only eyeballs this, notebooks/jai/linear_reg.py)."""
import jax
import pytest
import jax.numpy as jnp
import numpy as np

from bayesian_ode_tpu import samplers
from bayesian_ode_tpu.models import linear_regression as linreg


def setup():
    x, y = linreg.make_data(jax.random.PRNGKey(0), n=60)
    pot = linreg.make_potential(x, y)
    exact = linreg.exact_posterior(x, y)
    return pot, exact


def run(kernel, n_chains=16, num_samples=800, burn_in=300, key=5):
    pot, exact = setup()
    states = samplers.init_chains(kernel, jax.random.PRNGKey(key),
                                  jnp.zeros(2), n_chains, jitter=0.5)
    _, pos, infos = samplers.sample_chains(
        kernel, states, jax.random.split(jax.random.PRNGKey(key + 1),
                                         n_chains),
        num_samples=num_samples, burn_in=burn_in,
    )
    return pos.reshape(-1, 2), exact, infos


@pytest.mark.slow
def test_mala_matches_exact_posterior():
    pot, exact = setup()
    kernel = samplers.mala(pot, step_size=2e-3)
    flat, exact, infos = run(kernel)
    mean = jnp.mean(flat, axis=0)
    cov = jnp.cov(flat.T)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(exact["mean"]),
                               atol=0.02)
    np.testing.assert_allclose(np.asarray(cov), np.asarray(exact["cov"]),
                               atol=5e-4)


@pytest.mark.slow
def test_mmala_softabs_matches_exact_posterior():
    pot, exact = setup()
    metric = samplers.softabs_metric(pot, softabs_coeff=1e4)
    kernel = samplers.mmala(pot, step_size=0.5, metric_fn=metric)
    flat, exact, infos = run(kernel, num_samples=600)
    acc = float(jnp.mean(infos["accepted"].astype(jnp.float32)))
    # metric-preconditioned proposals at lr 0.5 should accept heavily
    assert acc > 0.5, acc
    mean = jnp.mean(flat, axis=0)
    cov = jnp.cov(flat.T)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(exact["mean"]),
                               atol=0.02)
    np.testing.assert_allclose(np.asarray(cov), np.asarray(exact["cov"]),
                               rtol=0.25, atol=3e-4)


def test_sgld_matches_exact_posterior_mean():
    pot, exact = setup()
    kernel = samplers.sgld(pot, step_size=2e-4)
    flat, exact, _ = run(kernel, num_samples=1500, burn_in=500)
    mean = jnp.mean(flat, axis=0)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(exact["mean"]),
                               atol=0.05)
