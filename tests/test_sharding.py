"""Multi-device sharding gates on the 8 virtual CPU devices.

Validates the mesh layer: sharded chain sampling matches unsharded results
distributionally, and sharded SVGD matches the single-chip kernel
numerically (same collective-free/all-gather semantics the real ICI path
uses)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_ode_tpu import samplers
from bayesian_ode_tpu.parallel import (
    make_mesh,
    run_svgd_sharded,
    sample_chains_sharded,
)

COV = jnp.asarray([[1.0, 0.6], [0.6, 0.8]])
PREC = jnp.linalg.inv(COV)
potential = lambda x: 0.5 * x @ PREC @ x

needs_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@needs_devices
def test_sharded_chains_match_unsharded():
    mesh = make_mesh(8, axis="chain")
    kernel = samplers.mala(potential, step_size=0.25)
    n_chains = 64
    states = samplers.init_chains(kernel, jax.random.PRNGKey(0), jnp.zeros(2),
                                  n_chains, jitter=1.0)
    keys = jax.random.split(jax.random.PRNGKey(1), n_chains)

    _, pos_sharded, _ = sample_chains_sharded(
        kernel, states, keys, num_samples=200, mesh=mesh, burn_in=100
    )
    _, pos_plain, _ = samplers.sample_chains(
        kernel, states, keys, num_samples=200, burn_in=100
    )
    # identical PRNG streams -> identical results up to reduction order
    np.testing.assert_allclose(
        np.asarray(pos_sharded), np.asarray(pos_plain), atol=1e-9
    )


@needs_devices
def test_sharded_svgd_matches_single_device():
    mesh = make_mesh(8, axis="particle")
    particles = jax.random.normal(jax.random.PRNGKey(2), (128, 2)) * 2.0

    out_sharded = run_svgd_sharded(potential, particles, lr=0.3,
                                   num_steps=50, mesh=mesh)

    # single-chip reference path (SVGD is deterministic: 50 steps each way)
    kernel = samplers.svgd(potential, step_size=0.3)
    state = kernel.init(particles)
    state, _, _ = samplers.sample_chain(kernel, state, jax.random.PRNGKey(0),
                                        num_samples=50, burn_in=0)
    np.testing.assert_allclose(
        np.asarray(out_sharded), np.asarray(state.particles), atol=1e-8
    )


@needs_devices
def test_sharded_svgd_converges():
    mesh = make_mesh(8, axis="particle")
    particles = jax.random.normal(jax.random.PRNGKey(3), (256, 2)) * 2.0 + 3.0
    out = run_svgd_sharded(potential, particles, lr=0.3, num_steps=2000,
                           mesh=mesh)
    mean = jnp.mean(out, axis=0)
    cov = jnp.cov(out.T)
    assert jnp.max(jnp.abs(mean)) < 0.05
    assert jnp.max(jnp.abs(cov - COV)) < 0.1
