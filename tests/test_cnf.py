"""Continuous normalizing flows (models/cnf.py): change-of-variables
exactness against closed forms, trace estimators, invertibility,
normalization, training, and the Bayesian-CNF potential.

The vendored reference has no CNF (upstream torchdiffeq's example is not
carried), so every gate here is against analytic truth rather than a
reference run.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_ode_tpu import odeint
from bayesian_ode_tpu.models import cnf


def _linear_field(A):
    return lambda t, z: z @ A.T


def test_identity_flow_is_base():
    # zeroed last layer => f == 0 => log p(x) is exactly the base density
    params = cnf.init_cnf_mlp(jax.random.PRNGKey(0), dim=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 2)) * 1.5
    field = lambda t, z: cnf.cnf_field(params, t, z)
    logp = cnf.cnf_log_prob(field, x)
    np.testing.assert_allclose(np.asarray(logp),
                               np.asarray(cnf.standard_normal_logpdf(x)),
                               rtol=1e-6, atol=1e-7)


def test_linear_flow_closed_form():
    # dz/dt = A z with diagonal A: z(t1) = e^{A} z(t0), tr = tr(A), so
    # log p1(x) = log N(e^{-A} x; 0, I) - tr(A)   (t0=0, t1=1)
    a = jnp.asarray([0.3, -0.5])
    A = jnp.diag(a)
    x = jax.random.normal(jax.random.PRNGKey(2), (32, 2)) * 2.0
    logp = cnf.cnf_log_prob(_linear_field(A), x,
                            odeint_fn=partial(odeint, rtol=1e-9, atol=1e-11))
    z0 = x * jnp.exp(-a)
    expected = cnf.standard_normal_logpdf(z0) - jnp.sum(a)
    np.testing.assert_allclose(np.asarray(logp), np.asarray(expected),
                               rtol=1e-6, atol=1e-6)


def test_hutchinson_trace_unbiased():
    # mean over many fixed-probe estimates ≈ the exact trace term
    params = cnf.init_cnf_mlp(jax.random.PRNGKey(3), dim=3)
    # give the last layer real weights so the jacobian is non-trivial
    params[-1]["w"] = 0.3 * jax.random.normal(jax.random.PRNGKey(4),
                                              params[-1]["w"].shape)
    field = lambda t, z: cnf.cnf_field(params, t, z)
    z = jax.random.normal(jax.random.PRNGKey(5), (4, 3))

    aug_exact = cnf.augmented_field(field, "exact")
    _, tr_exact = aug_exact(0.3, (z, jnp.zeros(4)))

    def one(key):
        probes = cnf.rademacher(key, z.shape, z.dtype)
        aug = cnf.augmented_field(field, "hutchinson", probes)
        return aug(0.3, (z, jnp.zeros(4)))[1]

    keys = jax.random.split(jax.random.PRNGKey(6), 4000)
    estimates = jax.vmap(one)(keys)
    # self-calibrating bound: |mean - exact| < 5 standard errors
    se = np.asarray(jnp.std(estimates, 0)) / np.sqrt(estimates.shape[0])
    err = np.abs(np.asarray(jnp.mean(estimates, 0)) - np.asarray(tr_exact))
    assert (err < 5.0 * se + 1e-3).all(), (err, se)


def test_sample_logprob_roundtrip():
    # samples drawn base->data, then log_prob data->base must (a) invert to
    # the same z0 and (b) agree with the sampling-time log density
    params = cnf.init_cnf_mlp(jax.random.PRNGKey(7), dim=2)
    params[-1]["w"] = 0.2 * jax.random.normal(jax.random.PRNGKey(8),
                                              params[-1]["w"].shape)
    field = lambda t, z: cnf.cnf_field(params, t, z)
    ofn = partial(odeint, rtol=1e-8, atol=1e-10)
    xs, logp_fwd = cnf.sample_cnf(field, jax.random.PRNGKey(9), 64, 2,
                                  odeint_fn=ofn, trace="exact")
    logp_bwd, z0 = cnf.cnf_log_prob(field, xs, odeint_fn=ofn,
                                    return_z0=True)
    np.testing.assert_allclose(np.asarray(logp_bwd), np.asarray(logp_fwd),
                               rtol=1e-5, atol=1e-5)
    # invertibility: the recovered base points are genuine N(0, I) draws
    assert float(jnp.max(jnp.abs(jnp.mean(z0, 0)))) < 0.4


def test_density_normalizes_1d():
    # untrained random 1-D flow: trapezoid of exp(log p) over a wide grid
    params = cnf.init_cnf_mlp(jax.random.PRNGKey(10), dim=1, hidden=(16,))
    params[-1]["w"] = 0.5 * jax.random.normal(jax.random.PRNGKey(11),
                                              params[-1]["w"].shape)
    field = lambda t, z: cnf.cnf_field(params, t, z)
    grid = jnp.linspace(-8.0, 8.0, 401)[:, None]
    logp = cnf.cnf_log_prob(field, grid,
                            odeint_fn=partial(odeint, rtol=1e-7, atol=1e-9))
    mass = jnp.trapezoid(jnp.exp(logp), grid[:, 0])
    assert abs(float(mass) - 1.0) < 1e-3, float(mass)


def test_cnf_training_improves_nll():
    # fit a shifted/correlated Gaussian with a few Adam steps; fixed-grid
    # rk4 keeps the whole loss.grad a plain differentiable scan
    key = jax.random.PRNGKey(12)
    chol = jnp.asarray([[1.0, 0.0], [0.8, 0.6]])
    x = jax.random.normal(key, (256, 2)) @ chol.T + jnp.asarray([1.5, -1.0])
    ofn = partial(odeint, method="rk4", options={"step_size": 0.1})
    nll = cnf.make_nll(x, odeint_fn=ofn)

    params = cnf.init_cnf_mlp(jax.random.PRNGKey(13), dim=2, hidden=(32,))
    import optax

    opt = optax.adam(5e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, g = jax.value_and_grad(nll)(params)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    loss0 = float(nll(params))
    for _ in range(60):
        params, opt_state, loss = step(params, opt_state)
    loss1 = float(loss)
    # identity-flow start = base NLL; training must beat it decisively
    assert loss1 < loss0 - 0.5, (loss0, loss1)
    # and the learned flow's samples must land near the data moments
    xs = cnf.sample_cnf(lambda t, z: cnf.cnf_field(params, t, z),
                        jax.random.PRNGKey(14), 512, 2, odeint_fn=ofn)
    np.testing.assert_allclose(np.asarray(jnp.mean(xs, 0)),
                               np.asarray(jnp.mean(x, 0)), atol=0.35)


def test_bayesian_cnf_potential_sgld_smoke():
    # the CNF potential plugs into the standard sampler contract
    from bayesian_ode_tpu import samplers

    x = jax.random.normal(jax.random.PRNGKey(15), (64, 2)) + 1.0
    ofn = partial(odeint, method="rk4", options={"step_size": 0.25})
    pot = cnf.make_potential(x, odeint_fn=ofn, reg=1e-2)
    params = cnf.init_cnf_mlp(jax.random.PRNGKey(16), dim=2, hidden=(8,))
    assert np.isfinite(float(pot(params)))

    kernel = samplers.sgld(pot, step_size=1e-6)
    state = kernel.init(params)
    state, positions, _ = samplers.sample_chain(
        kernel, state, jax.random.PRNGKey(17), num_samples=3, burn_in=2)
    flat = jax.tree_util.tree_leaves(positions)
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in flat)


def test_hutchinson_log_prob_close_to_exact():
    params = cnf.init_cnf_mlp(jax.random.PRNGKey(18), dim=2)
    params[-1]["w"] = 0.2 * jax.random.normal(jax.random.PRNGKey(19),
                                              params[-1]["w"].shape)
    field = lambda t, z: cnf.cnf_field(params, t, z)
    x = jax.random.normal(jax.random.PRNGKey(20), (512, 2))
    lp_exact = cnf.cnf_log_prob(field, x)
    lp_hutch = cnf.cnf_log_prob(field, x, trace="hutchinson",
                                key=jax.random.PRNGKey(21))
    # per-sample estimates are noisy; the batch mean must agree within
    # 5 standard errors of the per-sample estimator noise
    diff = lp_hutch - lp_exact
    se = float(jnp.std(diff)) / np.sqrt(diff.shape[0])
    assert abs(float(jnp.mean(diff))) < 5.0 * se + 1e-3, (
        float(jnp.mean(diff)), se)
    # validation errors
    with pytest.raises(ValueError):
        cnf.cnf_log_prob(field, x, trace="hutchinson")
    with pytest.raises(ValueError):
        cnf.augmented_field(field, "not-a-trace")
