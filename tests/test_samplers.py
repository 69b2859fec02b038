"""Sampler correctness on exact Gaussian targets.

The reference tests samplers only "by eye" on toy plots (SURVEY.md §4);
here each kernel is run on closed-form targets and checked by moment
matching, acceptance behavior, and (for HAMCMC) against a dense BFGS
oracle.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_ode_tpu import samplers
from bayesian_ode_tpu.samplers import schedules
from bayesian_ode_tpu.samplers.hamcmc import hamcmc_dense_oracle, hamcmc_products

# 2-D correlated Gaussian target
COV = jnp.asarray([[1.0, 0.6], [0.6, 0.8]])
PREC = jnp.linalg.inv(COV)


def gauss_potential(x):
    return 0.5 * x @ PREC @ x


def run_chains(kernel, key, num_chains=32, num_samples=400, burn_in=200,
               x0=None, jitter=1.0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    x0 = jnp.zeros(2) if x0 is None else x0
    states = samplers.init_chains(kernel, k1, x0, num_chains, jitter=jitter)
    _, positions, infos = samplers.sample_chains(
        kernel, states, jax.random.split(k2, num_chains), num_samples,
        burn_in=burn_in,
    )
    return positions, infos  # (chains, samples, 2)


def check_moments(positions, mean_tol=0.15, cov_tol=0.25):
    flat = positions.reshape(-1, 2)
    mean = jnp.mean(flat, axis=0)
    cov = jnp.cov(flat.T)
    assert jnp.max(jnp.abs(mean)) < mean_tol, mean
    assert jnp.max(jnp.abs(cov - COV)) < cov_tol, cov


def test_mala_gaussian_moments_and_acceptance():
    kernel = samplers.mala(gauss_potential, step_size=0.25)
    positions, infos = run_chains(kernel, 0, num_samples=600)
    acc = jnp.mean(infos["accepted"].astype(jnp.float32))
    assert 0.3 < acc < 0.99, acc
    check_moments(positions)


def test_mala_batched_gaussian_moments_and_acceptance():
    # exact sampler over the batch contract: per-chain acceptance masks,
    # correct Gaussian moments, and acceptance in the healthy range
    kernel = samplers.mala_batched(jax.vmap(gauss_potential), 0.25)
    x0 = jax.random.normal(jax.random.PRNGKey(7), (32, 2))
    _, positions, infos = samplers.sample_chain(
        kernel, kernel.init(x0), jax.random.PRNGKey(8), num_samples=600,
        burn_in=200,
    )
    assert infos["accepted"].shape == (600, 32)
    acc = jnp.mean(infos["accepted"].astype(jnp.float32))
    assert 0.3 < acc < 0.99, acc
    # chains accept independently: per-chain acceptance rates differ
    per_chain = jnp.mean(infos["accepted"].astype(jnp.float32), axis=0)
    assert float(jnp.std(per_chain)) > 0.0
    check_moments(jnp.swapaxes(positions, 0, 1))


def test_mala_batched_preconditioned_exactness():
    # a fixed diagonal metric must leave the target invariant (G enters
    # both the proposal and the MH ratio); moments still match with a
    # deliberately anisotropic G
    G = jnp.asarray([4.0, 0.25])[None, :]          # shared across chains
    kernel = samplers.mala_batched(jax.vmap(gauss_potential), 0.1,
                                   precond=G)
    x0 = jax.random.normal(jax.random.PRNGKey(9), (32, 2))
    _, positions, infos = samplers.sample_chain(
        kernel, kernel.init(x0), jax.random.PRNGKey(10), num_samples=800,
        burn_in=300,
    )
    acc = jnp.mean(infos["accepted"].astype(jnp.float32))
    assert 0.2 < acc < 0.995, acc
    check_moments(jnp.swapaxes(positions, 0, 1))


def test_psgld_preconditioner_protocol():
    # the warmup-metric protocol: pSGLD warmup -> frozen
    # G = 1/(lambda+sqrt(V)) -> exact kernel with precond=G.  On a badly
    # scaled Gaussian the learned metric must (a) reflect the scale
    # separation and (b) restore useful MALA acceptance at a step size
    # where the unpreconditioned kernel's acceptance collapses.
    std = jnp.asarray([1.0, 30.0])

    def pot_b(x):  # (C, 2) -> (C,)
        return 0.5 * jnp.sum((x / std) ** 2, axis=-1)

    warm = samplers.psgld_batched(pot_b, 5e-3)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (64, 2)) * std
    wstate, _, _ = samplers.sample_chain(
        warm, warm.init(x0), jax.random.PRNGKey(1), num_samples=1,
        burn_in=1500)
    G = samplers.psgld_preconditioner(wstate)
    g = np.asarray(G)
    assert np.allclose(g, g[0], atol=1e-12)       # chain-shared
    # gradient scales are 1/std^2-ish => G ratio tracks the std ratio
    assert g[0, 1] / g[0, 0] > 5.0

    # mixing: on Gaussians plain MALA keeps high ACCEPTANCE even badly
    # scaled (the proposal stays near-Gaussian) — what the metric buys is
    # decorrelation of the wide direction at a step the narrow one
    # tolerates.  ESS of the std-30 dimension must improve materially.
    lr = 0.5
    k_plain = samplers.mala_batched(pot_b, lr)
    k_prec = samplers.mala_batched(pot_b, lr, precond=G)
    _, pos_p, _ = samplers.sample_chain(
        k_plain, k_plain.init(x0), jax.random.PRNGKey(2), 600, burn_in=200)
    _, pos_g, _ = samplers.sample_chain(
        k_prec, k_prec.init(x0), jax.random.PRNGKey(2), 600, burn_in=200)
    ess_plain = float(samplers.ess(jnp.swapaxes(pos_p, 0, 1)[:, :, 1]))
    ess_prec = float(samplers.ess(jnp.swapaxes(pos_g, 0, 1)[:, :, 1]))
    assert ess_prec > 2.0 * ess_plain, (ess_plain, ess_prec)
    # and the learned-metric chain still samples the exact target
    s = np.asarray(pos_g).reshape(-1, 2).std(0)
    assert np.all(np.abs(s / np.asarray(std) - 1.0) < 0.25)


def test_sgld_gaussian_moments():
    kernel = samplers.sgld(gauss_potential, step_size=0.02)
    positions, infos = run_chains(kernel, 1, num_samples=1500, burn_in=300)
    assert bool(jnp.all(infos["accepted"]))
    check_moments(positions, cov_tol=0.3)


def test_sgld_polynomial_decay_schedule():
    sched = schedules.polynomial_decay(lr0=0.1, gamma=0.55, t0=100, alpha=1.0)
    kernel = samplers.sgld(gauss_potential, step_size=sched)
    positions, infos = run_chains(kernel, 2, num_samples=400, burn_in=100)
    lrs = infos["step_size"]
    # decaying lr: lr(t) = lr0/(t0 + t)^gamma (langevin.py:205-210)
    assert float(lrs[0, 0]) > float(lrs[0, -1])
    np.testing.assert_allclose(
        np.asarray(lrs[0, 0]), 0.1 / (100 + 100) ** 0.55, rtol=1e-6
    )


def test_psgld_gaussian_moments():
    kernel = samplers.psgld(gauss_potential, step_size=0.02, alpha=0.99)
    positions, _ = run_chains(kernel, 3, num_samples=1500, burn_in=300)
    # pSGLD's preconditioner skews the invariant measure slightly (no Gamma
    # term, as in the reference); moments still near target.
    check_moments(positions, mean_tol=0.2, cov_tol=0.4)


def test_csgld_phases_and_schedule():
    total = 300
    kernel = samplers.csgld(gauss_potential, lr0=0.05, num_cycles=3,
                            total_iters=total, beta=0.25)
    positions, infos = run_chains(kernel, 4, num_samples=total, burn_in=0)
    phase = infos["sampling_phase"][0]
    # both exploration and sampling steps occur, in cycle-periodic blocks
    assert bool(jnp.any(phase)) and bool(jnp.any(~phase))
    lrs = infos["step_size"][0]
    ceil = (total + 3) // 3
    # cosine restarts: lr at a cycle start is near lr0
    assert float(lrs[1 + ceil]) > float(lrs[ceil - 1])


def test_asghmc_gaussian_moments():
    kernel = samplers.asghmc(gauss_potential, step_size=0.1,
                             burn_in_steps=200, mom_decay=0.05)
    positions, _ = run_chains(kernel, 5, num_samples=2000, burn_in=300)
    check_moments(positions, mean_tol=0.25, cov_tol=0.45)


def test_asghmc_batched_matches_per_chain():
    # The batched kernel (fused-potential contract, one state for the whole
    # batch) must reproduce the vmapped per-chain kernel exactly: with the
    # noise and momentum resampling off, every part of the update is
    # deterministic and elementwise.
    C = 8
    x0 = jax.random.normal(jax.random.PRNGKey(0), (C, 2))
    per_chain = samplers.asghmc(gauss_potential, step_size=0.1,
                                burn_in_steps=20, mom_decay=0.05,
                                add_noise=False)
    states = jax.vmap(per_chain.init)(x0)
    _, pos_ref, _ = samplers.sample_chains(
        per_chain, states, jax.random.split(jax.random.PRNGKey(1), C),
        num_samples=40, burn_in=0,
    )                                           # (C, samples, 2)

    batched = samplers.asghmc_batched(
        jax.vmap(gauss_potential), step_size=0.1, burn_in_steps=20,
        mom_decay=0.05, add_noise=False,
    )
    _, pos_b, infos = samplers.sample_chain(
        batched, batched.init(x0), jax.random.PRNGKey(2), num_samples=40,
        burn_in=0,
    )                                           # (samples, C, 2)
    assert infos["potential"].shape == (40, C)
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(pos_b, 0, 1)),
                               np.asarray(pos_ref), rtol=1e-6, atol=1e-6)


def test_baoab_gaussian_moments():
    # 2nd-order splitting: even at a fairly large step the Gaussian
    # moments come out clean
    kernel = samplers.baoab(gauss_potential, step_size=0.3, friction=1.0,
                            burn_in_steps=100)
    positions, _ = run_chains(kernel, 11, num_samples=1500, burn_in=300)
    check_moments(positions, mean_tol=0.15, cov_tol=0.25)


def test_baoab_batched_matches_per_chain():
    # deterministic comparison is impossible (noise enters every step),
    # so check the batched kernel with shared RNG yields a valid chain
    # and matching moments on the exact Gaussian
    kernel = samplers.baoab_batched(jax.vmap(gauss_potential),
                                    step_size=0.3, friction=1.0,
                                    burn_in_steps=100)
    x0 = jax.random.normal(jax.random.PRNGKey(12), (32, 2))
    _, positions, infos = samplers.sample_chain(
        kernel, kernel.init(x0), jax.random.PRNGKey(13), num_samples=1500,
        burn_in=300,
    )
    assert infos["potential"].shape == (1500, 32)
    check_moments(jnp.swapaxes(positions, 0, 1), mean_tol=0.15,
                  cov_tol=0.25)


def test_acsghmc_batched_matches_per_chain():
    # cyclical variant: noise only in sampling phases, so compare full
    # trajectories with a fixed schedule and noise globally disabled via
    # beta=1.0 (cycle position never exceeds 1, so no phase injects noise)
    C = 4
    x0 = jax.random.normal(jax.random.PRNGKey(10), (C, 2))
    kw = dict(lr0=0.05, num_cycles=2, total_iters=30, burn_in_steps=10,
              beta=1.0, mom_decay=0.05)
    per_chain = samplers.acsghmc(gauss_potential, **kw)
    states = jax.vmap(per_chain.init)(x0)
    _, pos_ref, _ = samplers.sample_chains(
        per_chain, states, jax.random.split(jax.random.PRNGKey(11), C),
        num_samples=30, burn_in=0,
    )
    batched = samplers.acsghmc_batched(jax.vmap(gauss_potential), **kw)
    _, pos_b, _ = samplers.sample_chain(
        batched, batched.init(x0), jax.random.PRNGKey(12), num_samples=30,
        burn_in=0,
    )
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(pos_b, 0, 1)),
                               np.asarray(pos_ref), rtol=1e-6, atol=1e-6)


def test_asghmc_batched_gaussian_moments():
    kernel = samplers.asghmc_batched(jax.vmap(gauss_potential),
                                     step_size=0.1, burn_in_steps=200,
                                     mom_decay=0.05)
    x0 = jax.random.normal(jax.random.PRNGKey(3), (32, 2))
    _, positions, _ = samplers.sample_chain(
        kernel, kernel.init(x0), jax.random.PRNGKey(4), num_samples=2000,
        burn_in=300,
    )
    check_moments(jnp.swapaxes(positions, 0, 1), mean_tol=0.25,
                  cov_tol=0.45)


def test_mmala_softabs_gaussian():
    metric = samplers.softabs_metric(gauss_potential, softabs_coeff=1e3)
    kernel = samplers.mmala(gauss_potential, step_size=0.5, metric_fn=metric)
    positions, infos = run_chains(kernel, 6, num_samples=600, burn_in=200)
    acc = jnp.mean(infos["accepted"].astype(jnp.float32))
    assert acc > 0.3, acc
    check_moments(positions)


def test_softabs_metric_properties():
    metric = samplers.softabs_metric(gauss_potential, softabs_coeff=1e4)
    m = metric(jnp.asarray([0.3, -0.2]))
    # Hessian of the quadratic potential is the precision matrix
    np.testing.assert_allclose(np.asarray(m["hess"]), np.asarray(PREC), atol=1e-8)
    # softabs(lambda) ~ |lambda| for large coeff; Metric ~ PREC here (PD)
    np.testing.assert_allclose(np.asarray(m["Metric"]), np.asarray(PREC), atol=1e-4)
    # invMetric is an actual inverse (reference returned Metric, metrics.py:66-68)
    np.testing.assert_allclose(
        np.asarray(m["invMetric"] @ m["Metric"]), np.eye(2), atol=1e-4
    )
    # sqrtinv @ sqrtinv^T == invMetric
    np.testing.assert_allclose(
        np.asarray(m["sqrtinvMetric"] @ m["sqrtinvMetric"].T),
        np.asarray(m["invMetric"]), atol=1e-6,
    )


def test_hessian_and_identity_metrics():
    m = samplers.hessian_metric(gauss_potential)(jnp.zeros(2))
    np.testing.assert_allclose(np.asarray(m["invMetric"]), np.asarray(COV),
                               atol=1e-5)
    mi = samplers.identity_metric(2)(jnp.zeros(2))
    np.testing.assert_allclose(np.asarray(mi["invMetric"]), np.eye(2))


def test_hamcmc_recursion_matches_dense_oracle():
    # The matrix-free square-root recursion must reproduce the dense BFGS
    # inverse Hessian (the reference's `_compute_vector_prod_old` oracle,
    # langevin.py:669-715).
    rng = np.random.RandomState(0)
    P, n_pairs = 6, 4
    s = jnp.asarray(rng.randn(n_pairs, P))
    # build y = A s + small noise with A SPD so s^T y > 0
    A = rng.randn(P, P)
    A = A @ A.T + P * np.eye(P)
    y = jnp.asarray(s @ A.T)
    valid = jnp.ones(n_pairs, bool)
    H_gamma = 2.0

    H_dense = hamcmc_dense_oracle(s, y, valid, H_gamma)
    g = jnp.asarray(rng.randn(P))
    Hg, _ = hamcmc_products(s, y, valid, H_gamma, g, jnp.zeros(P))
    np.testing.assert_allclose(np.asarray(Hg), np.asarray(H_dense @ g),
                               rtol=1e-8, atol=1e-8)

    # S S^T == H: apply S to the identity columns
    S_cols = jnp.stack([
        hamcmc_products(s, y, valid, H_gamma, jnp.zeros(P),
                        jnp.eye(P)[i])[1]
        for i in range(P)
    ], axis=1)
    np.testing.assert_allclose(np.asarray(S_cols @ S_cols.T),
                               np.asarray(H_dense), rtol=1e-7, atol=1e-8)

    # invalid pairs are identity operations: H0 = B0^{-1} = H_gamma * I
    none_valid = jnp.zeros(n_pairs, bool)
    Hg0, Sn0 = hamcmc_products(s, y, none_valid, H_gamma, g, g)
    np.testing.assert_allclose(np.asarray(Hg0), H_gamma * np.asarray(g),
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(Sn0), np.sqrt(H_gamma) * np.asarray(g),
                               rtol=1e-8)


def test_hamcmc_pair_filtering():
    # pairs violating s^T y > eps s^T s are rejected (langevin.py:875-882)
    rng = np.random.RandomState(1)
    P = 4
    s = jnp.asarray(rng.randn(2, P))
    y = -s  # s^T y < 0
    valid = jnp.ones(2, bool)
    H = hamcmc_dense_oracle(s, y, valid, 1.0)
    np.testing.assert_allclose(np.asarray(H), np.eye(P))  # untouched


@pytest.mark.parametrize("variant", [1, 2, 3, 4])
def test_hamcmc_gaussian_moments(variant):
    kernel = samplers.hamcmc(gauss_potential, step_size=0.02, memory=3,
                             variant=variant, warmup_extra=20)
    positions, infos = run_chains(kernel, 7 + variant, num_samples=1200,
                                  burn_in=300)
    # after warm-up the metric path is active and pairs accumulate
    assert bool(jnp.all(infos["using_metric"][:, -1]))
    assert int(jnp.max(infos["n_pairs"])) > 0
    check_moments(positions, mean_tol=0.25, cov_tol=0.5)


@pytest.mark.slow
def test_svgd_gaussian_particles():
    kernel = samplers.svgd(gauss_potential, step_size=0.3)
    key = jax.random.PRNGKey(42)
    particles = jax.random.normal(key, (256, 2)) * 2.0 + 3.0
    state = kernel.init(particles)
    # deterministic flow: run 2000 steps under scan
    state, _, _ = samplers.sample_chain(kernel, state, jax.random.PRNGKey(0),
                                        num_samples=1, burn_in=2000)
    mean = jnp.mean(state.particles, axis=0)
    cov = jnp.cov(state.particles.T)
    assert jnp.max(jnp.abs(mean)) < 0.05, mean
    # SVGD's finite-ensemble covariance is slightly shrunk vs the target
    assert jnp.max(jnp.abs(cov - COV)) < 0.1, cov


def test_diagnostics_ess_rhat():
    key = jax.random.PRNGKey(0)
    iid = jax.random.normal(key, (4, 1000))
    e = samplers.ess(iid)
    assert 2000 < float(e) < 6500, e  # ~ m*n for iid

    # AR(1) with strong correlation has much smaller ESS
    def ar1(key):
        def body(x, eps):
            x = 0.95 * x + jnp.sqrt(1 - 0.95**2) * eps
            return x, x
        _, xs = jax.lax.scan(body, 0.0, jax.random.normal(key, (1000,)))
        return xs

    corr = jax.vmap(ar1)(jax.random.split(key, 4))
    assert float(samplers.ess(corr)) < 0.25 * float(e)

    r_good = samplers.split_rhat(iid)
    assert abs(float(r_good) - 1.0) < 0.05
    shifted = iid + jnp.arange(4)[:, None] * 3.0
    assert float(samplers.split_rhat(shifted)) > 1.5


def test_kernel_stein_discrepancy():
    key = jax.random.PRNGKey(3)
    n, d = 800, 2
    exact = jax.random.normal(key, (n, d))
    score = lambda x: -x                       # N(0, I) target

    ksd_exact = float(samplers.kernel_stein_discrepancy(exact, score))
    ksd_shift = float(samplers.kernel_stein_discrepancy(exact + 1.5, score))
    ksd_wide = float(samplers.kernel_stein_discrepancy(1.8 * exact, score))
    assert ksd_exact < 0.5 * ksd_shift
    assert ksd_exact < 0.5 * ksd_wide

    # unbiased U-statistic is ~0 for exact samples, clearly positive for
    # wrong ones
    u_exact = float(samplers.kernel_stein_discrepancy(
        exact, score, u_statistic=True))
    u_shift = float(samplers.kernel_stein_discrepancy(
        exact + 1.5, score, u_statistic=True))
    assert abs(u_exact) < 0.05
    assert u_shift > 10 * abs(u_exact)

    # it sees what ESS can't: SGLD at a huge step mixes fast (high ESS)
    # but samples a biased stationary law
    kern = samplers.sgld_batched(
        lambda p: 0.5 * jnp.sum(p["x"] ** 2, -1), 0.8)
    state = kern.init({"x": jnp.zeros((n, d))})
    ks = jax.random.split(jax.random.PRNGKey(4), 400)
    state, _ = jax.lax.scan(lambda s, k: (kern.step(k, s)[0], None),
                            state, ks)
    ksd_sgld = float(samplers.kernel_stein_discrepancy(
        state.position["x"], score))
    assert ksd_sgld > 1.5 * ksd_exact

    with pytest.raises(ValueError):
        samplers.kernel_stein_discrepancy(exact, score, beta=0.5)
    with pytest.raises(ValueError):
        samplers.kernel_stein_discrepancy(exact, lambda x: x[:, :1])


def test_sgrhmc_gaussian_moments():
    # completed SGRHMC (reference stub, hamiltonian.py:337-340)
    kernel = samplers.sgrhmc(gauss_potential, step_size=0.05, friction=0.3)
    positions, _ = run_chains(kernel, 21, num_samples=2000, burn_in=500)
    check_moments(positions, mean_tol=0.25, cov_tol=0.45)


def test_adam_sgld_gaussian_moments():
    # the Adam-preconditioned SGLD the reference's aSGLD intended to be
    kernel = samplers.adam_sgld(gauss_potential, step_size=0.01, a=0.5)
    positions, _ = run_chains(kernel, 22, num_samples=2000, burn_in=500)
    check_moments(positions, mean_tol=0.25, cov_tol=0.5)


def test_hamcmc_metropolis_correction():
    # paper-faithful MH option (the reference's accept_or_reject is a
    # stub): exactness on the Gaussian target with reasonable acceptance
    kernel = samplers.hamcmc(gauss_potential, step_size=0.05, memory=3,
                             variant=1, warmup_extra=20, accept_reject=True)
    positions, infos = run_chains(kernel, 31, num_samples=1500, burn_in=300)
    acc = float(jnp.mean(infos["accepted"][:, -500:].astype(jnp.float32)))
    assert 0.1 < acc <= 1.0, acc
    check_moments(positions, mean_tol=0.25, cov_tol=0.4)


def test_guard_finite_batched_freezes_only_divergent_chains():
    # batched kernels hold ALL chains in one state; the per-chain guard
    # must freeze exactly the divergent chains while the rest keep
    # sampling (plain guard_finite would freeze the whole batch).
    C = 8

    def pot_batch(p):                               # (C, 1) -> (C,)
        # confining near the origin, NaN far out: healthy chains sample
        # the Gaussian and never reach the bad region
        return jnp.sum(
            jnp.where(jnp.abs(p) > 100.0, jnp.nan, 0.5 * p * p), axis=-1
        )

    kernel = samplers.guard_finite_batched(samplers.sgld_batched(pot_batch,
                                                                 0.05))
    # chains 0 and 3 start inside the NaN region; the rest at 0
    x0 = jnp.zeros((C, 1)).at[0, 0].set(1e3).at[3, 0].set(1e3)
    _, positions, infos = samplers.sample_chain(
        kernel, kernel.init(x0), jax.random.PRNGKey(0), num_samples=20
    )
    pos = np.asarray(positions)                     # (20, C, 1)
    fin = np.asarray(infos["finite"])               # (20, C)
    assert fin.shape == (20, C)
    assert np.isfinite(pos).all()
    assert not fin[:, 0].all() and not fin[:, 3].all()
    healthy = [c for c in range(C) if c not in (0, 3)]
    assert fin[:, healthy].all()
    # healthy chains keep moving (Langevin noise changes every step)
    assert (np.abs(np.diff(pos[:, healthy, 0], axis=0)) > 0).all()
    # divergent chains freeze at their last finite state
    for c in (0, 3):
        first_bad = int(np.argmin(fin[:, c]))
        assert np.array_equal(
            pos[first_bad:, c], np.broadcast_to(pos[first_bad, c],
                                                pos[first_bad:, c].shape))


def test_guard_finite_batched_scalar_leaf():
    # a kernel whose state lists a 0-dim float field FIRST must not crash
    # the chain-count inference; the scalar gates globally
    from typing import NamedTuple

    class S(NamedTuple):
        temp: jnp.ndarray      # ()  float
        pos: jnp.ndarray       # (C, 1)

    def init(position):
        return S(jnp.asarray(1.0), position)

    def step(key, state):
        pos = state.pos + jax.random.normal(key, state.pos.shape)
        return S(state.temp, pos), {"potential": jnp.zeros(pos.shape[0]),
                                    "accepted": jnp.asarray(True),
                                    "step_size": 0.1}

    kernel = samplers.guard_finite_batched(
        samplers.TransitionKernel(init, step))
    st, info = kernel.step(jax.random.PRNGKey(0),
                           kernel.init(jnp.zeros((4, 1))))
    assert info["finite"].shape == (4,) and bool(info["finite"].all())


def test_guard_finite_freezes_divergent_chain():
    # TPU-native replacement for the reference's raise-on-NaN sanitizer
    # (langevin.py:184-192): a non-finite step is rejected (retried with
    # fresh noise next step) and flagged info["finite"] instead of
    # poisoning the batch; this potential diverges persistently, so the
    # chain freezes.
    div = jnp.asarray([3.0])

    def potential(x):
        # blows up once |x| crosses 2: gradient pushes x past it quickly
        return jnp.sum(jnp.where(jnp.abs(x) > 2.0, jnp.nan, -10.0 * x))

    kernel = samplers.guard_finite(samplers.sgld(potential, 0.5))
    state = kernel.init(jnp.asarray([0.0]))
    key = jax.random.PRNGKey(0)
    _, positions, infos = samplers.sample_chain(kernel, state, key,
                                                num_samples=20)
    pos = np.asarray(positions)
    fin = np.asarray(infos["finite"])
    assert not fin.all()              # it did diverge at some point
    assert np.isfinite(pos).all()     # ...but no NaN ever reached the chain
    # frozen: once non-finite, the position stops moving
    first_bad = int(np.argmin(fin))
    assert np.array_equal(pos[first_bad:], np.broadcast_to(
        pos[first_bad], pos[first_bad:].shape))


def test_rbf_bandwidth_subsample():
    # first-k-rows submatrix median vs the exact n^2 median: exchangeable
    # particles make the submatrix a plain k^2-pair sample, so the
    # bandwidth estimate must land within a few percent on a non-trivial
    # (bimodal, anisotropic) cloud
    key = jax.random.PRNGKey(7)
    k1, k2, k3 = jax.random.split(key, 3)
    a = jax.random.normal(k1, (2048, 8)) * jnp.arange(1.0, 9.0)
    b = jax.random.normal(k2, (2048, 8)) + 5.0
    X = jnp.concatenate([a, b])
    X = jax.random.permutation(k3, X)  # exchangeable order
    from bayesian_ode_tpu.samplers.stein import rbf_bandwidth

    g_exact = float(rbf_bandwidth(X))
    g_sub = float(rbf_bandwidth(X, median_subsample=256))
    assert abs(jnp.log(g_sub / g_exact)) < 0.1, (g_exact, g_sub)

    # at or below the subsample size the path is bit-identical to exact
    g_small_exact = rbf_bandwidth(X[:256])
    g_small_sub = rbf_bandwidth(X[:256], median_subsample=256)
    assert float(g_small_exact) == float(g_small_sub)

    # fixed sigma ignores the subsample entirely
    assert float(rbf_bandwidth(X, sigma=1.3)) == float(
        rbf_bandwidth(X, sigma=1.3, median_subsample=4))

    # STRUCTURED (non-exchangeable) order: two well-separated modes laid
    # out contiguously.  A first-k-rows slice would see only mode A
    # (within-mode distances -> wildly wrong bandwidth); the strided
    # subsample (ADVICE r3) must stay close to exact anyway.
    mode_a = jax.random.normal(k1, (2048, 4))
    mode_b = jax.random.normal(k2, (2048, 4)) + 40.0
    Xs = jnp.concatenate([mode_a, mode_b])      # sorted-by-mode layout
    g_exact_s = float(rbf_bandwidth(Xs))
    g_sub_s = float(rbf_bandwidth(Xs, median_subsample=256))
    assert abs(jnp.log(g_sub_s / g_exact_s)) < 0.1, (g_exact_s, g_sub_s)


def test_rbf_kernel_cross_median_pools_xy():
    # rbf_kernel(X, Y) with sigma=None medians the d2(X, Y) matrix it
    # applies (reference RBFKernel behavior; ADVICE r3) — not X-X alone.
    from bayesian_ode_tpu.samplers.stein import pairwise_sq_dists, rbf_kernel

    key = jax.random.PRNGKey(11)
    kx, ky = jax.random.split(key)
    X = jax.random.normal(kx, (64, 3))
    Y = jax.random.normal(ky, (96, 3)) + 10.0   # cross-distances dominate
    K, gamma = rbf_kernel(X, Y)
    d2 = pairwise_sq_dists(X, Y)
    h = jnp.median(d2) / (2.0 * jnp.log(X.shape[0] + 1.0))
    np.testing.assert_allclose(float(gamma), float(1.0 / (1e-8 + 2.0 * h)),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(K),
                               np.asarray(jnp.exp(-gamma * d2)), rtol=1e-6)
    # X == Y keeps the self-median (and symmetric K)
    K2, g2 = rbf_kernel(X, X)
    np.testing.assert_allclose(np.asarray(K2), np.asarray(K2).T, atol=1e-6)


def test_svgd_info_potential_rides_score_pass():
    # info["potential"] is the PRE-update ensemble mean, evaluated in the
    # same value_and_grad pass as the scores (no second potential call)
    kernel = samplers.svgd(gauss_potential, step_size=0.3)
    particles = jax.random.normal(jax.random.PRNGKey(3), (64, 2)) * 2.0
    state = kernel.init(particles)
    _, info = kernel.step(jax.random.PRNGKey(0), state)
    expected = jnp.mean(jax.vmap(gauss_potential)(particles))
    np.testing.assert_allclose(float(info["potential"]), float(expected),
                               rtol=1e-6)

    def gauss_batched(x):
        return jax.vmap(gauss_potential)(x)

    kb = samplers.svgd_batched(gauss_batched, step_size=0.3)
    sb = kb.init(particles)
    _, info_b = kb.step(jax.random.PRNGKey(0), sb)
    np.testing.assert_allclose(float(info_b["potential"]), float(expected),
                               rtol=1e-6)


def test_svgd_batched_matches_svgd():
    # svgd_batched (fused-potential score plumbing) must take the exact
    # same deterministic flow as svgd when the batched potential is the
    # vmapped scalar one
    def gauss_batched(x):
        return jax.vmap(gauss_potential)(x)

    k_scalar = samplers.svgd(gauss_potential, step_size=0.3)
    k_batch = samplers.svgd_batched(gauss_batched, step_size=0.3)
    particles = jax.random.normal(jax.random.PRNGKey(42), (128, 2)) * 2.0

    s1 = k_scalar.init(particles)
    s2 = k_batch.init(particles)
    for i in range(5):
        s1, i1 = k_scalar.step(jax.random.PRNGKey(i), s1)
        s2, i2 = k_batch.step(jax.random.PRNGKey(i), s2)
    np.testing.assert_allclose(np.asarray(s1.particles),
                               np.asarray(s2.particles), rtol=1e-6,
                               atol=1e-8)

    # pytree positions (the sampler-facing layout, leading particle axis)
    def pot_tree(p):
        return (jnp.sum(p["U"] ** 2, (-2, -1))
                + jnp.sum(p["logsn"] ** 2, -1)) / 2

    kt = samplers.svgd_batched(pot_tree, step_size=0.3)
    st = kt.init({"U": particles[:, :1, None], "logsn": particles[:, 1:]})
    st, _ = kt.step(jax.random.PRNGKey(0), st)
    assert np.all(np.isfinite(np.asarray(st.particles)))


@pytest.mark.slow
def test_svgd_adagrad_contracts_badly_scaled_target():
    # AdaGrad step control (Liu & Wang's recipe): on a potential whose
    # score scales differ by 1e4 across coordinates, a global step either
    # diverges or freezes one coordinate; AdaGrad handles both.  Both
    # kernels must agree and the potential must decrease.
    scales = jnp.asarray([1.0, 1e4])

    def pot_scalar(x):
        return 0.5 * jnp.sum(scales * x * x)

    def pot_batch(x):
        return 0.5 * jnp.sum(scales * x * x, axis=-1)

    particles = jax.random.normal(jax.random.PRNGKey(3), (64, 2)) * 2.0
    k1 = samplers.svgd(pot_scalar, step_size=0.05, adagrad=True)
    k2 = samplers.svgd_batched(pot_batch, step_size=0.05, adagrad=True)
    s1, s2 = k1.init(particles), k2.init(particles)
    p0 = None
    for i in range(60):
        s1, i1 = k1.step(jax.random.PRNGKey(i), s1)
        s2, i2 = k2.step(jax.random.PRNGKey(i), s2)
        if p0 is None:
            p0 = float(i1["potential"])
    np.testing.assert_allclose(np.asarray(s1.particles),
                               np.asarray(s2.particles), rtol=1e-6,
                               atol=1e-8)
    assert np.all(np.isfinite(np.asarray(s1.particles)))
    assert float(i1["potential"]) < 0.5 * p0, (p0, float(i1["potential"]))


def test_csgld_batched_matches_per_chain():
    # Exploration-phase steps (r <= beta) are pure gradient descent, so
    # with noise off the batched kernel must reproduce the vmapped
    # per-chain csgld exactly; the full run must show both phases.
    C, total = 8, 100
    x0 = jax.random.normal(jax.random.PRNGKey(0), (C, 2))
    per_chain = samplers.csgld(gauss_potential, lr0=0.05, num_cycles=1,
                               total_iters=total, beta=0.5,
                               add_noise=False)
    states = jax.vmap(per_chain.init)(x0)
    _, pos_ref, _ = samplers.sample_chains(
        per_chain, states, jax.random.split(jax.random.PRNGKey(1), C),
        num_samples=40, burn_in=0,
    )                                           # (C, samples, 2)

    batched = samplers.csgld_batched(
        jax.vmap(gauss_potential), lr0=0.05, num_cycles=1,
        total_iters=total, beta=0.5, add_noise=False,
    )
    _, pos_b, infos = samplers.sample_chain(
        batched, batched.init(x0), jax.random.PRNGKey(2), num_samples=40,
        burn_in=0,
    )                                           # (samples, C, 2)
    # step 0 reads r = ((0-1) mod ceil)/ceil ~ 1 (the reference's 1-based
    # step convention, schedules.cycle_position) so it is sampling-phase;
    # steps 1..40 of a beta=0.5 single cycle are all exploration
    phase0 = infos["sampling_phase"]
    assert bool(phase0[0]) and not bool(jnp.any(phase0[1:]))
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(pos_b, 0, 1)),
                               np.asarray(pos_ref), rtol=1e-6, atol=1e-6)

    # full cyclical run: both phases occur, cosine restarts at cycle
    # boundaries, and moments stay sane with noise on
    batched_n = samplers.csgld_batched(
        jax.vmap(gauss_potential), lr0=0.05, num_cycles=3,
        total_iters=300, beta=0.25,
    )
    _, pos_n, infos_n = samplers.sample_chain(
        batched_n, batched_n.init(x0), jax.random.PRNGKey(3),
        num_samples=300, burn_in=0,
    )
    phase = infos_n["sampling_phase"]
    assert bool(jnp.any(phase)) and bool(jnp.any(~phase))
    lrs = infos_n["step_size"]
    ceil = (300 + 3) // 3
    assert float(lrs[1 + ceil]) > float(lrs[ceil - 1])
    assert bool(jnp.all(jnp.isfinite(pos_n)))


def test_adam_sgld_batched_gaussian_moments():
    # adam_sgld on the fused batch contract: (C,) potentials per step,
    # finite chains, and correct moments on the exact Gaussian (the Adam
    # update is elementwise, so batching cannot change the math; noise
    # keys differ per shape, so moment matching is the right gate)
    C = 32
    x0 = jax.random.normal(jax.random.PRNGKey(0), (C, 2))
    batched = samplers.adam_sgld_batched(jax.vmap(gauss_potential), 0.01,
                                         a=0.5)
    state = batched.init(x0)
    assert state.potential.shape == (C,)
    _, pos, infos = samplers.sample_chain(
        batched, state, jax.random.PRNGKey(1), num_samples=2000,
        burn_in=500,
    )
    assert infos["potential"].shape == (2000, C)
    # same tolerances as the per-chain adam_sgld gate: the Adam metric
    # (no Gamma correction, as intended by the reference) skews the
    # invariant measure at finite step size
    check_moments(jnp.swapaxes(pos, 0, 1), mean_tol=0.25, cov_tol=0.5)


def test_sgrhmc_batched_gaussian_moments():
    # SGRHMC on the fused batch contract: same gate as the per-chain test
    C = 32
    x0 = jax.random.normal(jax.random.PRNGKey(3), (C, 2))
    batched = samplers.sgrhmc_batched(jax.vmap(gauss_potential), 0.05,
                                      friction=0.3)
    state = batched.init(x0)
    assert state.potential.shape == (C,)
    _, pos, infos = samplers.sample_chain(
        batched, state, jax.random.PRNGKey(4), num_samples=2000,
        burn_in=500,
    )
    assert infos["potential"].shape == (2000, C)
    check_moments(jnp.swapaxes(pos, 0, 1), mean_tol=0.25, cov_tol=0.45)


# ---------------------------------------------------------------- HMC

def test_hmc_gaussian_moments_and_acceptance():
    # exact HMC: large steps, high acceptance, correct moments
    kernel = samplers.hmc(gauss_potential, step_size=0.35, num_leapfrog=8,
                          jitter=0.2)
    positions, infos = run_chains(kernel, 11, num_samples=400, burn_in=100)
    acc = jnp.mean(infos["accepted"].astype(jnp.float32))
    assert 0.6 < acc <= 1.0, acc
    check_moments(positions)


def test_hmc_exact_at_large_step():
    # at eps=0.6, L=5 an uncorrected discretization would be visibly
    # biased on a unit Gaussian; the MH correction keeps the variance
    # honest
    kernel = samplers.hmc(lambda x: 0.5 * jnp.sum(x**2), step_size=0.6,
                          num_leapfrog=5, jitter=0.2)
    x0 = jnp.zeros(2)
    states = samplers.init_chains(kernel, jax.random.PRNGKey(3), x0, 64)
    _, positions, infos = samplers.sample_chains(
        kernel, states, jax.random.split(jax.random.PRNGKey(4), 64),
        num_samples=500, burn_in=200,
    )
    flat = positions.reshape(-1, 2)
    var = jnp.var(flat, axis=0)
    assert jnp.max(jnp.abs(var - 1.0)) < 0.12, var
    acc = jnp.mean(infos["accepted"].astype(jnp.float32))
    assert acc > 0.7, acc


def test_hmc_batched_gaussian_moments_and_independent_acceptance():
    kernel = samplers.hmc_batched(jax.vmap(gauss_potential), 0.35,
                                  num_leapfrog=8, jitter=0.2)
    x0 = jax.random.normal(jax.random.PRNGKey(21), (32, 2))
    _, positions, infos = samplers.sample_chain(
        kernel, kernel.init(x0), jax.random.PRNGKey(22), num_samples=500,
        burn_in=150,
    )
    assert infos["accepted"].shape == (500, 32)
    per_chain = jnp.mean(infos["accepted"].astype(jnp.float32), axis=0)
    assert float(jnp.std(per_chain)) > 0.0
    acc = jnp.mean(infos["accepted"].astype(jnp.float32))
    assert 0.6 < acc <= 1.0, acc
    check_moments(jnp.swapaxes(positions, 0, 1))


def test_hmc_batched_preconditioned_exactness():
    # fixed diagonal inverse-mass G enters the momentum draw, the drift,
    # and the kinetic energy; the target must stay invariant with a
    # deliberately anisotropic G
    G = jnp.asarray([4.0, 0.25])[None, :]
    kernel = samplers.hmc_batched(jax.vmap(gauss_potential), 0.15,
                                  num_leapfrog=8, precond=G, jitter=0.2)
    x0 = jax.random.normal(jax.random.PRNGKey(23), (32, 2))
    _, positions, infos = samplers.sample_chain(
        kernel, kernel.init(x0), jax.random.PRNGKey(24), num_samples=600,
        burn_in=200,
    )
    acc = jnp.mean(infos["accepted"].astype(jnp.float32))
    assert 0.5 < acc <= 1.0, acc
    check_moments(jnp.swapaxes(positions, 0, 1))


def test_hmc_pytree_state_and_jit():
    # dict positions through leapfrog/kinetic reductions, under jit
    def pot(p):
        return 0.5 * jnp.sum(p["a"] ** 2) + 0.5 * jnp.sum(p["b"] ** 2)

    kernel = samplers.hmc(pot, 0.4, num_leapfrog=5)
    x0 = {"a": jnp.zeros(3), "b": jnp.zeros((2, 2))}
    state = kernel.init(x0)
    step = jax.jit(kernel.step)
    state, info = step(jax.random.PRNGKey(0), state)
    assert jnp.isfinite(info["potential"])
    assert state.position["a"].shape == (3,)


def test_adaptive_hmc_step_size_and_moments():
    # dual averaging must walk eps from a bad initial guess (0.01) to a
    # useful value and land near the target acceptance; moments exact
    kernel = samplers.adaptive_hmc(gauss_potential, num_adapt=300,
                                   step_size=0.01, num_leapfrog=8)
    positions, infos = run_chains(kernel, 31, num_samples=400, burn_in=300)
    acc = jnp.mean(infos["accepted"].astype(jnp.float32))
    assert 0.6 < acc <= 1.0, acc
    eps = float(jnp.mean(infos["step_size"]))
    assert eps > 0.1, eps            # walked up from 0.01
    check_moments(positions)


def test_adaptive_hmc_mass_fixes_bad_scaling():
    # condition-number-1e4 diagonal Gaussian: without the Welford mass the
    # slow direction barely moves (ESS ~ tens); with it both variances are
    # recovered.  The strongest evidence the two-phase warmup works.
    var = jnp.asarray([100.0, 0.01])
    pot = lambda x: 0.5 * jnp.sum(x**2 / var)
    kernel = samplers.adaptive_hmc(pot, num_adapt=600, step_size=0.01,
                                   num_leapfrog=10)
    states = samplers.init_chains(kernel, jax.random.PRNGKey(41),
                                  jnp.zeros(2), 64, jitter=0.1)
    fs, positions, infos = samplers.sample_chains(
        kernel, states, jax.random.split(jax.random.PRNGKey(42), 64),
        num_samples=600, burn_in=600,
    )
    v = jnp.var(positions.reshape(-1, 2), axis=0)
    assert abs(v[0] - 100.0) / 100.0 < 0.25, v
    assert abs(v[1] - 0.01) / 0.01 < 0.25, v
    assert float(samplers.ess(positions[:, :, 0])) > 2000.0
    # warmup state is frozen after num_adapt: per-chain mass learned
    assert fs.mass_g.shape == (64, 2)
    assert float(jnp.mean(fs.mass_g[:, 0])) > 5.0


def test_adaptive_hmc_batched_moments():
    kernel = samplers.adaptive_hmc_batched(jax.vmap(gauss_potential),
                                           num_adapt=300, step_size=0.01,
                                           num_leapfrog=8)
    x0 = jax.random.normal(jax.random.PRNGKey(43), (32, 2))
    _, positions, infos = samplers.sample_chain(
        kernel, kernel.init(x0), jax.random.PRNGKey(44), num_samples=400,
        burn_in=300,
    )
    assert infos["accepted"].shape == (400, 32)
    acc = jnp.mean(infos["accepted"].astype(jnp.float32))
    assert 0.6 < acc <= 1.0, acc
    # per-chain adaptation: chains end at different step sizes
    assert infos["step_size"].shape[-1] == 32
    assert float(jnp.std(infos["step_size"][-1])) > 0.0
    check_moments(jnp.swapaxes(positions, 0, 1))
