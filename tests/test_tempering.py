"""Replica-exchange (parallel tempering) correctness.

The reference samples its multimodal toys (four_mixture, gaussian_grid;
reference scripts/toy/toy_plots.py:14-123) with single-temperature
kernels that cannot cross between well-separated modes — there is no
tempering machinery to gate against, so these tests check the physics
directly: mode-hopping a stuck-by-construction start, exactness on a
closed-form target, swap bookkeeping, and both engines.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_ode_tpu import samplers
from bayesian_ode_tpu.models.toy_densities import mixture_potential

# two well-separated modes: a single-temperature kernel started in one
# mode essentially never sees the other
BIMODAL = mixture_potential(
    mixture=(0.5, 0.5), means=((-3, -3), (3, 3)),
    sigmas=((0.5, 0.5), (0.5, 0.5)), corr=(0.0, 0.0))
LADDER = samplers.temperature_ladder(6, 0.02)


def run_pt_chains(kernel, seed, num_chains=16, num_samples=1200,
                  burn_in=400, x0=None):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    x0 = jnp.array([-3.0, -3.0]) if x0 is None else x0
    states = samplers.init_chains(kernel, k1, x0, num_chains, jitter=0.3)
    _, positions, infos = samplers.sample_chains(
        kernel, states, jax.random.split(k2, num_chains), num_samples,
        burn_in=burn_in)
    return positions, infos


def test_temperature_ladder_shape():
    b = np.asarray(samplers.temperature_ladder(5, 0.1))
    assert b.shape == (5,)
    assert b[0] == 1.0 and abs(b[-1] - 0.1) < 1e-6
    assert np.all(np.diff(b) < 0)
    # geometric: constant ratio
    r = b[1:] / b[:-1]
    assert np.allclose(r, r[0], rtol=1e-5)


def test_ladder_validation():
    with pytest.raises(ValueError):
        samplers.parallel_tempering(BIMODAL, [0.5, 0.2], 0.1)  # cold != 1
    with pytest.raises(ValueError):
        samplers.parallel_tempering(BIMODAL, [1.0, 0.5, 0.7], 0.1)
    with pytest.raises(ValueError):
        samplers.parallel_tempering(BIMODAL, LADDER, 0.1, inner="nope")


def test_pt_hops_modes_where_mala_cannot():
    # all chains start in the left mode; PT must recover the 50/50 split
    positions, infos = run_pt_chains(
        samplers.parallel_tempering(BIMODAL, LADDER, step_size=0.15),
        seed=0)
    right = float((np.asarray(positions).reshape(-1, 2)[:, 0] > 0).mean())
    assert 0.35 < right < 0.65
    swap = float(np.asarray(infos["swap_accepted"]).mean())
    assert 0.2 < swap < 0.95
    # the control: plain MALA from the same start stays stuck
    posm, _ = run_pt_chains(samplers.mala(BIMODAL, 0.15), seed=0)
    stuck = float((np.asarray(posm).reshape(-1, 2)[:, 0] > 0).mean())
    assert stuck < 0.01


def test_pt_mode_means_and_spread():
    positions, _ = run_pt_chains(
        samplers.parallel_tempering(BIMODAL, LADDER, step_size=0.15),
        seed=1, num_samples=1500)
    flat = np.asarray(positions).reshape(-1, 2)
    left = flat[flat[:, 0] < 0]
    right = flat[flat[:, 0] > 0]
    assert np.allclose(left.mean(0), [-3, -3], atol=0.15)
    assert np.allclose(right.mean(0), [3, 3], atol=0.15)
    assert np.all(np.abs(np.concatenate([left.std(0), right.std(0)])
                         - 0.5) < 0.12)


def test_pt_exact_on_gaussian():
    # on a unimodal Gaussian PT must reproduce the target exactly (the
    # exchange move preserves each tempered marginal)
    cov = jnp.array([[1.0, 0.6], [0.6, 0.8]])
    prec = jnp.linalg.inv(cov)

    def pot(x):
        return 0.5 * x @ prec @ x

    kernel = samplers.parallel_tempering(
        pot, samplers.temperature_ladder(4, 0.1), step_size=0.25)
    positions, _ = run_pt_chains(kernel, seed=2, x0=jnp.zeros(2),
                                 num_samples=800, burn_in=300)
    flat = np.asarray(positions).reshape(-1, 2)
    assert np.max(np.abs(flat.mean(0))) < 0.12
    assert np.max(np.abs(np.cov(flat.T) - np.asarray(cov))) < 0.15


def test_pt_batched_engine():
    def pot_b(x):
        return jax.vmap(BIMODAL)(x)

    kernel = samplers.parallel_tempering_batched(
        pot_b, LADDER, step_size=0.15)
    C = 32
    pos0 = jnp.tile(jnp.array([-3.0, -3.0]), (C, 1)) \
        + 0.3 * jax.random.normal(jax.random.PRNGKey(3), (C, 2))
    state = kernel.init(pos0)
    _, positions, infos = samplers.sample_chain(
        kernel, state, jax.random.PRNGKey(4), num_samples=1200,
        burn_in=400)
    flat = np.asarray(positions).reshape(-1, 2)
    assert flat.shape[0] == 1200 * C  # cold batch only is recorded
    right = float((flat[:, 0] > 0).mean())
    assert 0.35 < right < 0.65
    assert np.asarray(infos["swap_accepted"]).shape == (1200, C)


def test_pt_hmc_inner():
    kernel = samplers.parallel_tempering(
        BIMODAL, LADDER, step_size=0.1, inner="hmc", num_leapfrog=5)
    positions, infos = run_pt_chains(kernel, seed=5, num_samples=700,
                                     burn_in=300)
    right = float((np.asarray(positions).reshape(-1, 2)[:, 0] > 0).mean())
    assert 0.3 < right < 0.7
    assert float(np.asarray(infos["accepted"], float).mean()) > 0.5


def test_pt_sharded_replica_mesh():
    # one temperature per device over an 8-device mesh; swaps ride
    # ppermute between neighbors.  Same physics gates as in-chip PT.
    from bayesian_ode_tpu.parallel import (
        make_mesh, run_parallel_tempering_sharded)

    mesh = make_mesh(8, axis="replica")
    betas = np.geomspace(1.0, 0.02, 8)
    C = 16
    x0 = jnp.tile(jnp.array([-3.0, -3.0]), (C, 1)) \
        + 0.3 * jax.random.normal(jax.random.PRNGKey(0), (C, 2))
    cold, info = run_parallel_tempering_sharded(
        pot := BIMODAL, betas, 0.15, x0, jax.random.PRNGKey(1),
        num_samples=1200, burn_in=400, mesh=mesh)
    flat = np.asarray(cold).reshape(-1, 2)
    right = float((flat[:, 0] > 0).mean())
    assert 0.35 < right < 0.65
    assert 0.2 < float(np.asarray(info["swap_accepted"]).mean()) < 0.95
    assert float(np.asarray(info["accepted"], float).mean()) > 0.5
    # per-mode geometry intact
    left = flat[flat[:, 0] < 0]
    assert np.allclose(left.mean(0), [-3, -3], atol=0.2)


def test_pt_sharded_exact_on_gaussian():
    from bayesian_ode_tpu.parallel import (
        make_mesh, run_parallel_tempering_sharded)

    cov = jnp.array([[1.0, 0.6], [0.6, 0.8]])
    prec = jnp.linalg.inv(cov)

    def pot(x):
        return 0.5 * x @ prec @ x

    mesh = make_mesh(8, axis="replica")
    x0 = jnp.zeros((24, 2))
    cold, _ = run_parallel_tempering_sharded(
        pot, np.geomspace(1.0, 0.1, 8), 0.25, x0, jax.random.PRNGKey(2),
        num_samples=800, burn_in=300, mesh=mesh)
    flat = np.asarray(cold).reshape(-1, 2)
    assert np.max(np.abs(flat.mean(0))) < 0.12
    assert np.max(np.abs(np.cov(flat.T) - np.asarray(cov))) < 0.15


def test_pt_sharded_ladder_must_match_mesh():
    from bayesian_ode_tpu.parallel import (
        make_mesh, run_parallel_tempering_sharded)

    mesh = make_mesh(8, axis="replica")
    with pytest.raises(ValueError):
        run_parallel_tempering_sharded(
            BIMODAL, np.geomspace(1.0, 0.1, 4), 0.1,
            jnp.zeros((4, 2)), jax.random.PRNGKey(0), 10, mesh=mesh)


def test_pt_swap_every():
    kernel = samplers.parallel_tempering(BIMODAL, LADDER, step_size=0.15,
                                         swap_every=5)
    positions, infos = run_pt_chains(kernel, seed=6, num_samples=1500,
                                     burn_in=400)
    # swaps only fire on every 5th step: 4/5 of recorded rates are 0
    swaps = np.asarray(infos["swap_accepted"])
    frac_zero_rounds = float((swaps == 0).mean())
    assert frac_zero_rounds > 0.7
    right = float((np.asarray(positions).reshape(-1, 2)[:, 0] > 0).mean())
    assert 0.3 < right < 0.7
