"""Adaptive-tempered SMC gates (samplers/smc.py).

Same conjugate Gaussian battery as the evidence suite: closed-form log Z
and posterior moments check the particle estimate end to end, and the
SMC evidence is cross-checked against the stepping-stone estimator from
samplers/evidence.py — three independent estimators agreeing is the
standard marginal-likelihood trust protocol.  (Beyond the reference,
which has no particle methods; SURVEY.md §2.2.)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_ode_tpu import samplers

from test_evidence import _gaussian_model


def _posterior_moments(d, n, s0, s, y):
    A = n / s**2 + 1.0 / s0**2
    mean = (np.sum(y, axis=0) / s**2) / A
    return mean, 1.0 / A


def _run_smc(n_particles=2048, seed=0, **kw):
    log_lik, log_prior, log_z, (d, n, s0, s) = _gaussian_model(seed=seed)
    k_init, k_run = jax.random.split(jax.random.key(seed))
    prior = {"x": s0 * jax.random.normal(k_init, (n_particles, d))}
    res = samplers.smc(k_run, log_lik, log_prior, prior,
                       num_moves=5, **kw)
    return res, log_z, (d, n, s0, s)


def test_smc_evidence_and_moments_match_conjugate_gaussian():
    res, log_z, (d, n, s0, s) = _run_smc()
    assert abs(float(res.log_z) - log_z) < 0.1
    # posterior moments from the final population
    rng = np.random.default_rng(0)
    x_true = rng.normal(0.0, s0, d)
    y = x_true + rng.normal(0.0, s, (n, d))
    mean, var = _posterior_moments(d, n, s0, s, y)
    xs = np.asarray(res.particles["x"])
    assert np.allclose(xs.mean(axis=0), mean, atol=4 * np.sqrt(var / len(xs)) + 0.02)
    assert np.allclose(xs.var(axis=0), var, rtol=0.25)
    # adaptive ladder reached beta = 1 within budget
    ns = int(res.num_stages)
    assert 1 <= ns < 100
    betas = np.asarray(res.betas)[:ns]
    assert betas[-1] == pytest.approx(1.0, abs=1e-6)
    assert np.all(np.diff(np.concatenate([[0.0], betas])) > 0)
    assert np.all(np.isnan(np.asarray(res.betas)[ns:]))


def test_smc_ess_hits_target_and_acceptance_adapts():
    res, _, _ = _run_smc(n_particles=1024, seed=1, target_ess=0.6)
    ns = int(res.num_stages)
    ess = np.asarray(res.ess)[:ns]
    # every stage but the last (dbeta clipped at 1-beta) holds the target
    assert np.all(ess[:-1] >= 0.6 * 1024 * 0.98)
    acc = np.asarray(res.accept_rate)[:ns]
    # Robbins-Monro pulls acceptance toward 0.57 by the later stages
    assert 0.2 < acc[-1] < 0.95
    assert np.all(np.isfinite(np.asarray(res.step_sizes)[:ns]))


@pytest.mark.slow
def test_smc_cross_checks_stepping_stone():
    res, log_z, (d, n, s0, s) = _run_smc(n_particles=4096, seed=2)
    log_lik, log_prior, _, _ = _gaussian_model(seed=2)
    betas = samplers.power_ladder(12)
    var_k = 1.0 / (betas * n / s**2 + 1.0 / s0**2)
    ev = samplers.log_evidence(
        jax.random.key(3), log_lik, log_prior,
        {"x": jnp.zeros((32, d))}, betas, step_size=0.6 * var_k,
        num_warmup=500, num_samples=1000)
    assert abs(float(res.log_z) - log_z) < 0.1
    assert abs(float(res.log_z) - float(ev.log_z_ss)) < 0.25


def test_systematic_resample_is_weight_proportional():
    key = jax.random.key(0)
    logw = jnp.log(jnp.asarray([0.1, 0.2, 0.3, 0.4]))
    pos = {"x": jnp.arange(4.0)}
    counts = np.zeros(4)
    for s in range(200):
        out = samplers.systematic_resample(jax.random.fold_in(key, s),
                                           logw, pos)
        idx = np.asarray(out["x"]).astype(int)
        counts += np.bincount(idx, minlength=4)
    freq = counts / counts.sum()
    assert np.allclose(freq, [0.1, 0.2, 0.3, 0.4], atol=0.02)
    # systematic: per-draw counts deviate <1 from n*w
    out = samplers.systematic_resample(key, logw, pos)
    c = np.bincount(np.asarray(out["x"]).astype(int), minlength=4)
    assert np.all(np.abs(c - 4 * np.asarray([0.1, 0.2, 0.3, 0.4])) <= 1.0)


def test_smc_validation_and_jit():
    log_lik, log_prior, _, _ = _gaussian_model()
    with pytest.raises(ValueError):
        samplers.smc(jax.random.key(0), log_lik, log_prior,
                     {"x": jnp.zeros((8, 2))}, target_ess=1.5)
    with pytest.raises(ValueError):
        samplers.smc(jax.random.key(0), log_lik, log_prior,
                     {"x": jnp.zeros(())})
    # whole run is jittable (bounded while loop, fixed-size diagnostics)
    run = jax.jit(lambda k, p: samplers.smc(
        k, log_lik, log_prior, p, num_moves=2, max_stages=50).log_z)
    k_init, k_run = jax.random.split(jax.random.key(4))
    prior = {"x": 2.0 * jax.random.normal(k_init, (256, 2))}
    assert np.isfinite(float(run(k_run, prior)))
