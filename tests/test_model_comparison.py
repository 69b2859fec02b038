"""WAIC / PSIS-LOO gates (samplers/model_comparison.py).

The conjugate normal-normal model has a CLOSED-FORM leave-one-out
predictive density, so PSIS-LOO and WAIC are checked against exact
LOO-CV — a sharper gate than the usual "matches another estimator"
smoke test.  GPD shape recovery is checked on synthetic Pareto draws.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_ode_tpu import samplers


def _normal_model(d_n=40, s0=2.0, s=0.7, seed=0, outlier=None):
    """Known-variance normal: x ~ N(0, s0^2), y_i ~ N(x, s^2)."""
    rng = np.random.default_rng(seed)
    x_true = rng.normal(0.0, s0)
    y = x_true + rng.normal(0.0, s, d_n)
    if outlier is not None:
        y[-1] = outlier
    return y, s0, s


def _exact_loo(y, s0, s):
    """Sum_n log p(y_n | y_{-n}) in closed form."""
    out = 0.0
    for n in range(len(y)):
        y_m = np.delete(y, n)
        a = len(y_m) / s**2 + 1.0 / s0**2
        m = np.sum(y_m) / s**2 / a
        v = 1.0 / a + s**2
        out += -0.5 * np.log(2 * np.pi * v) - 0.5 * (y[n] - m) ** 2 / v
    return out


def _draws_and_loglik(y, s0, s, n_draws=4000, seed=1):
    """Exact posterior draws + (S, N) pointwise log-lik matrix."""
    a = len(y) / s**2 + 1.0 / s0**2
    m = np.sum(y) / s**2 / a
    xs = m + np.sqrt(1.0 / a) * np.random.default_rng(seed).normal(
        size=n_draws)
    ll = (-0.5 * np.log(2 * np.pi * s**2)
          - 0.5 * (y[None, :] - xs[:, None]) ** 2 / s**2)
    return jnp.asarray(ll)


def test_psis_loo_matches_exact_loo_cv():
    y, s0, s = _normal_model()
    ll = _draws_and_loglik(y, s0, s)
    exact = _exact_loo(y, s0, s)
    loo = samplers.psis_loo(ll)
    waic = samplers.waic(ll)
    assert abs(float(loo.elpd) - exact) < 0.1
    assert abs(float(waic.elpd) - exact) < 0.1
    # one scalar parameter: p_eff ~= 1
    assert 0.5 < float(loo.p_eff) < 1.6
    assert 0.5 < float(waic.p_eff) < 1.6
    # well-specified model: every khat comfortably below 0.7
    assert np.all(np.asarray(loo.pareto_k) < 0.5)
    assert np.isnan(np.asarray(waic.pareto_k)).all()
    assert float(loo.se) > 0 and np.isfinite(float(loo.se))


def test_outlier_raises_pareto_k():
    y, s0, s = _normal_model(outlier=8.0)
    loo = samplers.psis_loo(_draws_and_loglik(y, s0, s))
    k = np.asarray(loo.pareto_k)
    assert k[-1] > np.max(k[:-1]) + 0.1      # the outlier dominates


def test_compare_prefers_true_model():
    y, s0, s = _normal_model(seed=3)
    good = samplers.psis_loo(_draws_and_loglik(y, s0, s))
    # misspecified: likelihood with 3x-inflated noise
    bad = samplers.psis_loo(_draws_and_loglik(y, s0, 3.0 * s))
    cmp = samplers.compare(good, bad)
    assert bool(cmp.better)
    assert float(cmp.elpd_diff) > 2 * float(cmp.se_diff)
    with pytest.raises(ValueError):
        small = samplers.psis_loo(_draws_and_loglik(y[:10], s0, s))
        samplers.compare(good, small)


def test_gpd_fit_recovers_shape():
    for k_true in (0.1, 0.4, 0.8):
        u = (np.arange(2000) + 0.5) / 2000
        x = np.sort((np.power(1 - u, -k_true) - 1) / k_true)  # sigma = 1
        k, sigma = samplers.gpd_fit(jnp.asarray(x))
        assert abs(float(k) - k_true) < 0.1, k_true
        assert abs(float(sigma) - 1.0) < 0.2, k_true


def test_shapes_and_validation():
    ll = jnp.zeros((100, 3, 7))               # (S, C, N) accepted
    res = samplers.waic(ll)
    assert res.pointwise.shape == (7,)
    with pytest.raises(ValueError):
        samplers.waic(jnp.zeros((10,)))
    with pytest.raises(ValueError):
        samplers.psis_loo(jnp.zeros((10, 4)))  # too few draws for PSIS
    # jits
    f = jax.jit(lambda m: samplers.psis_loo(m).elpd)
    y, s0, s = _normal_model(d_n=10)
    assert np.isfinite(float(f(_draws_and_loglik(y, s0, s, n_draws=500))))
