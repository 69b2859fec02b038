"""NUTS correctness: exactness, tree dynamics, warmup adaptation.

Beyond the reference suite (its exact kernels are MALA/MMALA; SURVEY.md
§2.2) — these gates check the dynamic-trajectory machinery the simpler
kernels don't have: U-turn termination scales trajectories with the
target's width, divergences are flagged and frozen, the multinomial
proposal keeps the chain exact at any step size, and the Stan-style
warmup recovers step size and diagonal mass per chain.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_ode_tpu import samplers

COV = jnp.asarray([[1.0, 0.8], [0.8, 1.0]])
PREC = jnp.linalg.inv(COV)


def gauss_potential(x):
    return 0.5 * x @ PREC @ x


def gauss_potential_batch(x):  # (C, 2) -> (C,)
    return 0.5 * jnp.einsum("ci,ij,cj->c", x, PREC, x)


def run_chains(kernel, seed, num_chains=32, num_samples=400, burn_in=200,
               dim=2, jitter=1.0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    states = samplers.init_chains(kernel, k1, jnp.zeros(dim), num_chains,
                                  jitter=jitter)
    _, positions, infos = samplers.sample_chains(
        kernel, states, jax.random.split(k2, num_chains), num_samples,
        burn_in=burn_in)
    return positions, infos


def check_gauss_moments(positions, mean_tol=0.12, cov_tol=0.2):
    flat = np.asarray(positions).reshape(-1, 2)
    assert np.max(np.abs(flat.mean(0))) < mean_tol
    assert np.max(np.abs(np.cov(flat.T) - np.asarray(COV))) < cov_tol


def test_nuts_correlated_gaussian_moments():
    positions, infos = run_chains(
        samplers.nuts(gauss_potential, step_size=0.4), seed=0)
    check_gauss_moments(positions)
    # trajectories actually doubled (NUTS is not degenerating to MALA)
    assert float(np.asarray(infos["depth"], float).mean()) > 1.5
    assert not np.any(np.asarray(infos["diverging"]))


def test_nuts_exact_at_large_step():
    # multinomial weights correct the discretization error exactly: even
    # a coarse step gives unbiased moments (only mixing degrades).
    positions, infos = run_chains(
        samplers.nuts(gauss_potential, step_size=0.9), seed=1,
        num_samples=600)
    check_gauss_moments(positions, mean_tol=0.15, cov_tol=0.25)
    a = float(np.asarray(infos["accept_prob"]).mean())
    assert 0.3 < a < 1.0


def test_nuts_batched_engine_moments():
    kernel = samplers.nuts_batched(gauss_potential_batch, step_size=0.4)
    pos0 = jax.random.normal(jax.random.PRNGKey(2), (32, 2))
    state = kernel.init(pos0)
    _, positions, infos = samplers.sample_chain(
        kernel, state, jax.random.PRNGKey(3), num_samples=400,
        burn_in=200)
    check_gauss_moments(positions)
    # per-chain trees: depths differ across chains within a step
    depths = np.asarray(infos["depth"])  # (samples, chains)
    assert depths.std(axis=1).max() > 0


def test_nuts_trajectory_scales_with_target_width():
    # U-turn criterion adapts trajectory length to the widest direction:
    # same eps, 10x wider target => deeper trees.
    def narrow(x):
        return 0.5 * jnp.sum(x * x)

    def wide(x):
        return 0.5 * jnp.sum((x / 10.0) ** 2)

    _, info_n = run_chains(samplers.nuts(narrow, step_size=0.3), seed=4,
                           num_samples=100, burn_in=50)
    _, info_w = run_chains(samplers.nuts(wide, step_size=0.3,
                                         max_depth=9), seed=4,
                           num_samples=100, burn_in=50, jitter=5.0)
    d_n = float(np.asarray(info_n["depth"], float).mean())
    d_w = float(np.asarray(info_w["depth"], float).mean())
    assert d_w > d_n + 2.0
    # and the wide scale is actually explored
    # (leapfrog count ~ pi*scale/eps ~ 100 needs depth ~ 7)
    assert float(np.asarray(info_w["n_leapfrog"], float).mean()) > 30


def test_nuts_energy_identity():
    # E[U] = d/2 for a standard Gaussian (exactness, not just moments)
    d = 4

    def pot(x):
        return 0.5 * jnp.sum(x * x)

    kernel = samplers.nuts(pot, step_size=0.5)
    positions, infos = run_chains(kernel, seed=5, num_samples=500,
                                  burn_in=200, dim=d)
    u = np.asarray(infos["potential"])
    assert abs(u.mean() - d / 2) < 0.12


def test_nuts_divergence_flagged_and_frozen():
    # a cliff potential at |x| > 3 blows up the energy: transitions into
    # it must flag diverging and keep the chain at a finite state.
    def pot(x):
        r2 = jnp.sum(x * x)
        return 0.5 * r2 + jnp.where(r2 > 9.0, 1e8 * (r2 - 9.0), 0.0)

    kernel = samplers.nuts(pot, step_size=0.6)
    positions, infos = run_chains(kernel, seed=6, num_samples=300,
                                  burn_in=0, jitter=2.0)
    assert np.all(np.isfinite(np.asarray(positions)))
    assert np.any(np.asarray(infos["diverging"]))


def test_nuts_fixed_precond_invariance():
    # diag inverse-mass G = variances makes an anisotropic Gaussian
    # isotropic: tree depth drops vs identity mass at the same eps.
    std = jnp.asarray([1.0, 10.0])

    def pot(x):
        return 0.5 * jnp.sum((x / std) ** 2)

    _, info_id = run_chains(samplers.nuts(pot, step_size=0.3,
                                          max_depth=9), seed=7,
                            num_samples=100, burn_in=50, jitter=3.0)
    kern_pc = samplers.nuts(pot, step_size=0.3, precond=std ** 2)
    pos_pc, info_pc = run_chains(kern_pc, seed=7, num_samples=200,
                                 burn_in=50, jitter=3.0)
    # measured: ~3.4 preconditioned vs ~5.0 identity (the narrow axis
    # U-turns subtrees early under identity mass, so the gap is ~1.6
    # doublings, not the naive log2(10))
    assert float(np.asarray(info_pc["depth"], float).mean()) + 1.0 < \
        float(np.asarray(info_id["depth"], float).mean())
    s = np.asarray(pos_pc).reshape(-1, 2).std(0)
    assert np.all(np.abs(s / np.asarray(std) - 1.0) < 0.25)


def test_adaptive_nuts_warmup_recovers_scale_and_eps():
    std = jnp.asarray([1.0, 10.0])

    def pot(x):
        return 0.5 * jnp.sum((x / std) ** 2)

    num_adapt = 300
    kernel = samplers.adaptive_nuts(pot, num_adapt=num_adapt,
                                    step_size=0.05, max_depth=8)
    positions, infos = run_chains(kernel, seed=8, num_chains=16,
                                  num_samples=300, burn_in=num_adapt,
                                  jitter=0.5)
    s = np.asarray(positions).reshape(-1, 2).std(0)
    assert np.all(np.abs(s / np.asarray(std) - 1.0) < 0.2)
    # dual averaging walked eps up from 0.05 and hit the accept target
    eps = np.asarray(infos["step_size"])
    assert eps.mean() > 0.2
    a = float(np.asarray(infos["accept_prob"]).mean())
    assert 0.6 < a < 0.98
    # post-warmup eps is frozen (exactly constant across draws)
    assert np.all(eps[:, -1] == eps[:, 0])


def test_adaptive_nuts_batched_engine():
    num_adapt = 200
    kernel = samplers.adaptive_nuts_batched(
        gauss_potential_batch, num_adapt=num_adapt, step_size=0.05)
    pos0 = 0.5 * jax.random.normal(jax.random.PRNGKey(9), (24, 2))
    state = kernel.init(pos0)
    _, positions, infos = samplers.sample_chain(
        kernel, state, jax.random.PRNGKey(10), num_samples=400,
        burn_in=num_adapt)
    check_gauss_moments(positions, mean_tol=0.15, cov_tol=0.25)
    # each chain froze its own step size
    eps = np.asarray(infos["step_size"])  # (samples, chains)
    assert np.all(eps[-1] == eps[0])
    assert eps[-1].std() > 0


def test_nuts_pytree_positions():
    # dict-of-arrays positions flatten/unflatten through the kernel
    def pot(p):
        return 0.5 * jnp.sum(p["a"] ** 2) + \
            0.5 * jnp.sum((p["b"] / 2.0) ** 2)

    kernel = samplers.nuts(pot, step_size=0.4)
    k1, k2 = jax.random.split(jax.random.PRNGKey(11))
    x0 = {"a": jnp.zeros(3), "b": jnp.zeros((2, 2))}
    states = samplers.init_chains(kernel, k1, x0, 16, jitter=1.0)
    _, positions, _ = samplers.sample_chains(
        kernel, states, jax.random.split(k2, 16), 300, burn_in=150)
    sa = np.asarray(positions["a"]).reshape(-1, 3).std(0)
    sb = np.asarray(positions["b"]).reshape(-1, 4).std(0)
    assert np.all(np.abs(sa - 1.0) < 0.2)
    assert np.all(np.abs(sb - 2.0) < 0.4)


def test_adaptive_nuts_init_mass_seeds_warmup_metric():
    """init_mass (the psgld_preconditioner protocol) seeds warmup phase 1:
    on a badly scaled Gaussian the seeded sampler needs far fewer
    leapfrogs per draw during early warmup than identity-mass warmup,
    and the posterior moments still come out right."""
    scales = jnp.asarray([100.0, 1.0, 0.01])

    def pot_batch(p):
        return 0.5 * jnp.sum((p["x"] / scales) ** 2, axis=-1)

    C, T = 32, 60
    pos0 = {"x": 0.1 * scales * jax.random.normal(
        jax.random.PRNGKey(0), (C, 3))}
    leaps = {}
    for label, init_mass in (("identity", None),
                             ("seeded", {"x": scales ** 2})):
        kernel = samplers.adaptive_nuts_batched(
            pot_batch, num_adapt=T, step_size=0.02, max_depth=8,
            init_mass=init_mass)
        state = kernel.init(pos0)
        if init_mass is not None:
            np.testing.assert_allclose(np.asarray(state.mass_g["x"]),
                                       np.asarray(scales ** 2)[None] *
                                       np.ones((C, 1)))
        _, _, infos = samplers.sample_chain(
            kernel, state, jax.random.PRNGKey(1), num_samples=T,
            burn_in=0)
        leaps[label] = float(jnp.mean(
            infos["n_leapfrog"].astype(jnp.float32)))
    # the correct metric turns a 1e4-condition problem into a unit one
    assert leaps["seeded"] * 4 < leaps["identity"], leaps

    # and with the seeded metric the frozen chain hits the right moments
    kernel = samplers.adaptive_nuts_batched(
        pot_batch, num_adapt=200, step_size=0.02, max_depth=8,
        init_mass={"x": scales ** 2})
    state = kernel.init(pos0)
    _, positions, _ = samplers.sample_chain(
        kernel, state, jax.random.PRNGKey(2), num_samples=300,
        burn_in=200)
    got = np.asarray(positions["x"]).reshape(-1, 3).std(0)
    np.testing.assert_allclose(got, np.asarray(scales), rtol=0.25)


def test_adaptive_hmc_init_mass():
    scales = jnp.asarray([30.0, 0.1])

    def pot_batch(p):
        return 0.5 * jnp.sum((p["x"] / scales) ** 2, axis=-1)

    kernel = samplers.adaptive_hmc_batched(
        pot_batch, num_adapt=200, step_size=0.02, num_leapfrog=8,
        init_mass={"x": scales ** 2})
    pos0 = {"x": 0.1 * scales * jax.random.normal(
        jax.random.PRNGKey(3), (32, 2))}
    state = kernel.init(pos0)
    _, positions, infos = samplers.sample_chain(
        kernel, state, jax.random.PRNGKey(4), num_samples=300,
        burn_in=200)
    got = np.asarray(positions["x"]).reshape(-1, 2).std(0)
    np.testing.assert_allclose(got, np.asarray(scales), rtol=0.25)
    assert float(jnp.mean(infos["accepted"][-100:].astype(
        jnp.float32))) > 0.5
