"""Marginal-likelihood estimation gates (samplers/evidence.py).

The conjugate Gaussian model has a closed-form evidence, so both the
thermodynamic-integration and stepping-stone estimators are checked
against exact log Z — a gate the reference cannot express (it has no
model-comparison machinery; SURVEY.md §5.5).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_ode_tpu import samplers


def _gaussian_model(d=2, n=8, s0=2.0, s=0.5, seed=0):
    rng = np.random.default_rng(seed)
    x_true = rng.normal(0.0, s0, d)
    y = x_true + rng.normal(0.0, s, (n, d))
    y = jnp.asarray(y)

    def log_lik_batch(pos):
        x = pos["x"]                                        # (R, d)
        r2 = jnp.sum((y[None, :, :] - x[:, None, :]) ** 2, axis=(1, 2))
        return -0.5 * r2 / s**2 - 0.5 * n * d * jnp.log(2 * jnp.pi * s**2)

    def log_prior_batch(pos):
        x = pos["x"]
        return (-0.5 * jnp.sum(x * x, axis=-1) / s0**2
                - 0.5 * d * jnp.log(2 * jnp.pi * s0**2))

    # exact evidence: complete the square over x
    A = n / s**2 + 1.0 / s0**2
    m = np.sum(np.asarray(y), axis=0) / s**2
    log_z = (-0.5 * n * d * np.log(2 * np.pi * s**2)
             - 0.5 * np.sum(np.asarray(y) ** 2) / s**2
             - 0.5 * d * np.log(2 * np.pi * s0**2)
             + 0.5 * d * np.log(2 * np.pi / A)
             + 0.5 * np.sum(m**2) / A)
    return log_lik_batch, log_prior_batch, float(log_z), (d, n, s0, s)


def _run(K=16, C=32, num_warmup=600, num_samples=1500, seed=0):
    log_lik, log_prior, log_z, (d, n, s0, s) = _gaussian_model(seed=seed)
    betas = samplers.power_ladder(K)
    # per-rung step ~ the rung target's variance 1/(beta*n/s^2 + 1/s0^2)
    var_k = 1.0 / (betas * n / s**2 + 1.0 / s0**2)
    init = {"x": jnp.zeros((C, d))}
    res = samplers.log_evidence(
        jax.random.key(seed), log_lik, log_prior, init, betas,
        step_size=0.6 * var_k, num_warmup=num_warmup,
        num_samples=num_samples)
    return res, log_z


@pytest.mark.slow
def test_evidence_matches_conjugate_gaussian():
    res, log_z = _run()
    # stepping stone is unbiased given exact rung samples; TI carries
    # trapezoid quadrature bias on a 16-rung ladder
    assert abs(float(res.log_z_ss) - log_z) < 0.15
    assert abs(float(res.log_z_ti) - log_z) < 0.6
    # the two estimators agree with each other to quadrature error
    assert abs(float(res.log_z_ti) - float(res.log_z_ss)) < 0.6


def test_mean_loglik_monotone_and_acceptance_healthy():
    res, _ = _run(num_warmup=400, num_samples=800, seed=1)
    # d/dbeta E_beta[loglik] = Var_beta[loglik] >= 0
    mll = np.asarray(res.mean_log_lik)
    assert np.all(np.diff(mll) > -0.5)      # monotone up to MC noise
    acc = np.asarray(res.accept_rate)
    assert np.all(acc > 0.3) and np.all(acc <= 1.0)
    assert res.log_lik_draws.shape[1:] == (16, 32)


def test_ladder_validation():
    with pytest.raises(ValueError):
        samplers.power_ladder(1)
    log_lik, log_prior, _, _ = _gaussian_model()
    init = {"x": jnp.zeros((4, 2))}
    with pytest.raises(ValueError):   # must start at 0
        samplers.log_evidence(jax.random.key(0), log_lik, log_prior, init,
                              betas=jnp.array([0.1, 1.0]))
    with pytest.raises(ValueError):   # must end at 1
        samplers.log_evidence(jax.random.key(0), log_lik, log_prior, init,
                              betas=jnp.array([0.0, 0.9]))
    with pytest.raises(ValueError):   # step_size shape
        samplers.log_evidence(jax.random.key(0), log_lik, log_prior, init,
                              num_rungs=4, step_size=jnp.ones(3))


def test_thinning_and_scalar_step():
    log_lik, log_prior, log_z, _ = _gaussian_model(seed=2)
    init = {"x": jnp.zeros((16, 2))}
    res = samplers.log_evidence(
        jax.random.key(2), log_lik, log_prior, init, num_rungs=8,
        step_size=5e-3, num_warmup=300, num_samples=600, thin=3)
    assert res.log_lik_draws.shape[0] == 200
    assert np.isfinite(float(res.log_z_ss))
    with pytest.raises(ValueError):
        samplers.log_evidence(jax.random.key(2), log_lik, log_prior, init,
                              num_rungs=8, num_samples=10, thin=3)


def test_adapt_step_hits_target_acceptance():
    # warmup Robbins-Monro step adaptation (frozen for the measured
    # window) lands every rung's acceptance near target even from a
    # badly mistuned initial step
    log_lik, log_prior, log_z, _ = _gaussian_model(seed=3)
    init = {"x": jnp.zeros((24, 2))}
    res = samplers.log_evidence(
        jax.random.key(3), log_lik, log_prior, init, num_rungs=8,
        step_size=1e-5,                  # 3+ orders too small everywhere
        num_warmup=500, num_samples=600, adapt_step=True)
    acc = np.asarray(res.accept_rate)
    assert np.all(acc > 0.35) and np.all(acc < 0.8), acc
    # adapted steps increased by orders of magnitude and are per-rung
    steps = np.asarray(res.step_sizes)
    assert steps.min() > 1e-4 and steps[0] > steps[-1]
    # and the estimate is still exact-sampler quality
    assert abs(float(res.log_z_ss) - log_z) < max(0.3, 5 * float(res.ss_se))


def test_jackknife_ses_cover_truth():
    # SS jackknife SE is a usable error bar on the conjugate model:
    # 4 independent replicates each land within 4 SE of exact log Z
    log_lik, log_prior, log_z, (d, n, s0, s) = _gaussian_model(seed=4)
    betas = samplers.power_ladder(12)
    var_k = 1.0 / (betas * n / s**2 + 1.0 / s0**2)
    for seed in range(4):
        res = samplers.log_evidence(
            jax.random.key(10 + seed), log_lik, log_prior,
            {"x": jnp.zeros((24, 2))}, betas, step_size=0.6 * var_k,
            num_warmup=300, num_samples=600)
        se = float(res.ss_se)
        assert se > 0.0
        assert abs(float(res.log_z_ss) - log_z) < max(0.35, 4 * se)


def test_log_evidence_nonfinite_loglik_floor():
    """Non-finite loglik draws are floored to zero bridge weight:
    estimates stay finite, the count is reported, and TI — whose
    arithmetic rung means WOULD silently absorb the floor — is NaN'd
    instead.  MALA itself cannot ACCEPT a move into a -inf region (the
    MH ratio is non-finite), so the realistic producer of -inf retained
    draws is a chain that STARTS there and freezes (every proposal's
    log_alpha is NaN -> rejected) — e.g. an exploding initialization on
    ODE posteriors."""
    log_lik, log_prior, log_z, _ = _gaussian_model(seed=3)

    def log_lik_holed(p):
        ll = log_lik(p)
        far = jnp.sum(p["x"] ** 2, axis=-1) > 25.0
        return jnp.where(far, -jnp.inf, ll)

    C = 64
    x0 = 0.1 * jax.random.normal(jax.random.key(5), (C, 2))
    # freeze 8 of 64 chains inside the -inf region
    x0 = x0.at[:8].set(jnp.asarray([6.0, 6.0]))
    res = samplers.log_evidence(jax.random.key(6), log_lik_holed,
                                log_prior, {"x": x0}, num_rungs=8,
                                step_size=5e-2, num_warmup=200,
                                num_samples=200, adapt_step=True)
    # 8 frozen chains x 8 rungs x 200 kept draws
    assert int(res.num_nonfinite) == 8 * 8 * 200
    assert np.isfinite(float(res.log_z_ss))
    assert np.isfinite(float(res.ss_se))
    assert np.isnan(float(res.log_z_ti))         # floored TI is flagged
    # the healthy 56 chains keep the estimate in the truth's
    # neighborhood (an eighth of the population contributing zero
    # weight biases SS low — the point is finite and same-scale, not
    # unbiased: measured -54 vs truth -22)
    assert log_z - 60.0 < float(res.log_z_ss) < log_z + 5.0

    # clean target: no draws floored, TI intact
    res2 = samplers.log_evidence(jax.random.key(6), log_lik, log_prior,
                                 {"x": x0}, num_rungs=8, step_size=5e-2,
                                 num_warmup=200, num_samples=200,
                                 adapt_step=True)
    assert int(res2.num_nonfinite) == 0
    assert np.isfinite(float(res2.log_z_ti))


def test_ss_jackknife_se_finite_under_chain_dominance():
    """Regression (2026-08-21): in f32 the jackknife clamp 1 - 1e-12
    rounds to 1.0 and log1p(-1) = -inf made ss_se NaN whenever one chain
    dominated a rung's pooled bridge weight — exactly the GP-ODE hot-rung
    regime.  Construct dominance directly: one chain's loglik towers
    over the rest, all in f32."""
    C = 16

    def log_lik_batch(p):
        x = p["x"]                                  # (R, 1) rows
        # chain row 0 of every rung dominates by ~1e4 nats
        return jnp.where(x[:, 0] > 0.0, -10.0, -1e4).astype(jnp.float32)

    def log_prior_batch(p):
        return jnp.zeros(p["x"].shape[0], jnp.float32)

    x0 = -jnp.ones((C, 1), jnp.float32)
    x0 = x0.at[0].set(1.0)
    res = samplers.log_evidence(jax.random.key(1), log_lik_batch,
                                log_prior_batch, {"x": x0}, num_rungs=6,
                                step_size=1e-10, num_warmup=5,
                                num_samples=20)
    assert np.isfinite(float(res.log_z_ss))
    assert np.isfinite(float(res.ss_se)), float(res.ss_se)


def test_gss_matches_closed_form_with_tight_se():
    """Generalized stepping stone (posterior-fitted Gaussian reference):
    on the conjugate-Gaussian target it must reproduce the closed-form
    log Z with a much tighter jackknife SE than the prior-bridged ladder
    at the SAME budget — the whole point of bridging from the posterior
    side."""
    log_lik, log_prior, log_z, (d, n, s0, s) = _gaussian_model(seed=2)

    # posterior-typical draws (the conjugate posterior is known)
    rng = np.random.default_rng(2)
    x_true = rng.normal(0.0, s0, d)
    y = x_true + rng.normal(0.0, s, (n, d))
    A = n / s**2 + 1.0 / s0**2
    mean = (np.sum(y, axis=0) / s**2) / A
    C = 64
    draws = {"x": jnp.asarray(
        mean[None] + rng.normal(0.0, 1.0 / np.sqrt(A), (C, d)))}

    kw = dict(num_rungs=8, step_size=1e-2, num_warmup=200,
              num_samples=400, adapt_step=True)
    gss = samplers.log_evidence_gss(jax.random.key(7), log_lik, log_prior,
                                    draws, **kw)
    assert abs(float(gss.log_z_ss) - log_z) < 0.05, (
        float(gss.log_z_ss), log_z)
    assert float(gss.ss_se) < 0.05

    # same budget, prior-bridged: looser (the classic SS variance)
    plain = samplers.log_evidence(jax.random.key(7), log_lik, log_prior,
                                  {"x": jnp.zeros((C, d))}, **kw)
    assert float(gss.ss_se) < float(plain.ss_se)
    assert abs(float(gss.log_z_ss) - log_z) <= \
        abs(float(plain.log_z_ss) - log_z) + 0.05


def test_fit_gaussian_reference_normalized():
    # the fitted reference must be a NORMALIZED density: its own draws'
    # average exp(log q) over a huge sample integrates to 1 via
    # importance sampling against itself (trivially), so check the
    # closed-form: E_q[-log q] equals the fitted Gaussian entropy
    rng = np.random.default_rng(0)
    draws = {"a": jnp.asarray(rng.normal(1.0, 2.0, (4000, 3))),
             "b": jnp.asarray(rng.normal(-2.0, 0.5, (4000, 2, 2)))}
    log_ref, sample = samplers.fit_gaussian_reference(draws)
    xs = sample(jax.random.key(1), 20000)
    ent_mc = -float(jnp.mean(log_ref(xs)))
    sds = np.concatenate([np.std(np.asarray(draws["a"]), 0).ravel(),
                          np.std(np.asarray(draws["b"]), 0).ravel()])
    ent_true = 0.5 * len(sds) * np.log(2 * np.pi * np.e) \
        + np.sum(np.log(sds))
    assert abs(ent_mc - ent_true) < 0.05
    # and sampling matches the fitted moments
    assert np.allclose(np.asarray(jnp.mean(xs["a"], 0)), 1.0, atol=0.1)


def test_log_evidence_all_nonfinite_is_nan_flagged():
    """ADVICE r4: when EVERY retained draw is non-finite the floor used
    to degenerate (max over an all-False mask = -inf, floor stays -inf,
    log_z_ss/-inf ss_se/NaN "despite" the floor).  Now both TI and SS
    are NaN-flagged and the count reports the condition."""
    log_lik, log_prior, _, _ = _gaussian_model(seed=4)

    def log_lik_inf(p):
        return jnp.full(jax.tree.leaves(p)[0].shape[0], -jnp.inf)

    C = 8
    x0 = 0.1 * jax.random.normal(jax.random.key(5), (C, 2))
    res = samplers.log_evidence(jax.random.key(6), log_lik_inf, log_prior,
                                {"x": x0}, num_rungs=4, step_size=5e-2,
                                num_warmup=20, num_samples=20,
                                adapt_step=True)
    assert int(res.num_nonfinite) == 4 * C * 20
    assert np.isnan(float(res.log_z_ss))
    assert np.isnan(float(res.log_z_ti))


def test_evidence_reliability_flags():
    """VERDICT r4 #6: the measured estimator regime on GP-ODE posteriors
    must be machine-visible.  Healthy numbers -> SMC/GSS primary, SS ok,
    TI diagnostic-only; the known pathological case (SS hot-rung budget
    drift, Laplace above the WAIC bound, TI NaN from floored draws) ->
    flagged, and rank_by never contains TI or a drifted SS."""
    healthy = samplers.evidence_reliability(
        log_z_ti=-95.0, log_z_ss=-91.2, ss_se=0.4,
        log_z_gss=-91.0, gss_se=0.3, log_z_smc=-91.1, smc_se=0.2,
        log_z_laplace=-91.5, laplace_hessian_pd=True, waic_elpd=-85.0)
    est = healthy["estimators"]
    assert est["smc"]["status"] == "primary"
    assert est["gss"]["status"] == "primary"
    assert est["ss"]["status"] == "ok"
    assert est["ti"]["status"] == "diagnostic_only"
    assert est["laplace"]["status"] == "diagnostic_only"
    assert healthy["rank_by"] == ["smc", "gss"]

    # the GP-VDP pathological case (round-4 record): prior-bridged SS
    # +292-nat budget drift, Laplace hundreds of nats above SMC and
    # above the WAIC elpd bound, TI NaN (floored hot-rung draws)
    path = samplers.evidence_reliability(
        log_z_ti=float("nan"), log_z_ss=-180.0, ss_se=5.0,
        log_z_gss=-290.0, gss_se=2.0, log_z_smc=-293.0, smc_se=1.5,
        log_z_laplace=-60.0, laplace_hessian_pd=True, waic_elpd=-85.0,
        ladder_nonfinite=1200)
    est = path["estimators"]
    assert est["ss"]["status"] == "budget_sensitive"
    assert est["laplace"]["status"] == "inconsistent"
    assert est["smc"]["status"] == "primary"
    assert est["gss"]["status"] == "primary"
    assert "ti" not in path["rank_by"] and "ss" not in path["rank_by"]

    # SS drift detectable purely from the SMC gap (no floored draws)
    drift = samplers.evidence_reliability(
        log_z_ti=-3000.0, log_z_ss=-180.0, ss_se=5.0,
        log_z_gss=-291.0, gss_se=2.0, log_z_smc=-293.0, smc_se=1.5,
        log_z_laplace=-400.0, laplace_hessian_pd=True, waic_elpd=-85.0)
    assert drift["estimators"]["ss"]["status"] == "budget_sensitive"

    # single-repeat SMC (nan se) must not poison the gap test
    one_rep = samplers.evidence_reliability(
        log_z_ti=-95.0, log_z_ss=-91.2, ss_se=0.4,
        log_z_gss=-91.0, gss_se=0.3, log_z_smc=-91.1,
        smc_se=float("nan"), log_z_laplace=-91.5,
        laplace_hessian_pd=True, waic_elpd=-85.0)
    assert one_rep["estimators"]["ss"]["status"] == "ok"

    # degenerate: SMC failed -> rank_by falls back to finite estimators
    failed = samplers.evidence_reliability(
        log_z_ti=float("nan"), log_z_ss=-180.0, ss_se=5.0,
        log_z_gss=float("nan"), gss_se=float("nan"),
        log_z_smc=float("nan"), smc_se=float("nan"),
        log_z_laplace=float("nan"), laplace_hessian_pd=False,
        waic_elpd=-85.0)
    assert failed["estimators"]["smc"]["status"] == "failed"
    assert failed["rank_by"] == ["ss"]
