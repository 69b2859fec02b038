"""Smoke tests for bench.py phase functions at tiny shapes.

bench.py is the driver-run benchmark (one process per round on the real
chip); these gates keep its phase functions importable and runnable on
the CPU backend so a bench-side regression surfaces in CI instead of at
the end of a round.  Throughput values are not asserted — only that the
phases complete and produce finite, internally consistent results.
"""
import numpy as np
import pytest

bench = pytest.importorskip("bench")


@pytest.mark.slow
def test_hamcmc_phase_smoke():
    # BASELINE configs[3]: HAMCMC on the GP VDP posterior, vmapped chains
    data, static, params0, kr = bench.build_problem()
    eff, sps, dt, pairs = bench.hamcmc_effective_samples(
        data, static, params0, kr, n_chains=8, num_samples=6, burn_in=6
    )
    assert sps > 0 and dt > 0
    assert np.isfinite(eff)
    assert 0 <= pairs <= 5  # memory=5 -> at most 5 curvature pairs


@pytest.mark.slow
def test_npsde_phase_smoke():
    # beyond-reference NPSDE phase: batched EM pseudo-likelihood pSGLD
    _, static, params0, _ = bench.build_problem()
    eff, sps, dt, C = bench.npsde_psgld_effective_samples(
        static, params0, n_chains=128, num_samples=6, burn_in=6
    )
    assert sps > 0 and dt > 0 and C == 128
    assert np.isfinite(eff)


@pytest.mark.slow
def test_spiral_phase_smoke():
    # BASELINE configs[1]: spiral neural-ODE fit, dopri5 + adjoint
    adj, disc, adj_loss, disc_loss = bench.spiral_adjoint_throughput(
        n_iters=3, data_size=64, batch_time=5, batch_size=4
    )
    assert adj > 0 and disc > 0
    # the two gradient engines take the same training trajectory
    np.testing.assert_allclose(adj_loss, disc_loss, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_exact_sampler_phase_smoke():
    # VERDICT r3 #2: exact NUTS/HMC over the fused GP batch potential
    data, static, params0, kr = bench.build_problem()
    for which in ("nuts", "hmc"):
        eff, lps, dt, C, leap, acc, mom = bench.exact_sampler_effective_samples(
            data, static, params0, kr, n_chains=128, num_samples=6,
            burn_in=6, which=which, max_depth=2, num_leapfrog=2,
            warm_steps=4)
        assert dt > 0 and C == 128 and lps > 0
        assert 0.0 <= acc <= 1.0
        assert leap >= 1.0
        assert all(np.isfinite(m) for m in mom["logsn_mean"])


@pytest.mark.slow
def test_cnf_phase_smoke():
    ips, l0, l1, spread = bench.cnf_training_throughput(
        n_iters=3, n_data=64, hidden=(8,), n_steps_grid=4)
    assert ips > 0 and spread >= 0
    assert np.isfinite(l0) and np.isfinite(l1)


@pytest.mark.slow
def test_latent_sde_phase_smoke():
    ips, l0, l1, spread = bench.latent_sde_training_throughput(
        n_iters=3, B=4, T=9, latent_dim=3)
    assert ips > 0 and spread >= 0
    assert np.isfinite(l0) and np.isfinite(l1)


@pytest.mark.slow
def test_svgd_ksd_phase_smoke():
    # VERDICT r3 #4: the SVGD phase's KSD quality metric
    data, static, params0, kr = bench.build_problem()
    res = bench.svgd_throughput(data, static, params0, kr, [64], 3)
    r = res[0]
    assert np.isfinite(r["ksd_init"]) and np.isfinite(r["ksd_final"])
    assert r["ksd_init"] >= 0 and r["ksd_final"] >= 0
