"""Pallas kernel gates (interpret mode on CPU; the same kernels run
compiled on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_ode_tpu.ops.pallas_rbf import (
    svgd_phi_pallas,
    svgd_phi_reference,
)


@pytest.mark.parametrize("n,d", [(256, 2), (300, 2), (256, 5), (130, 3)])
def test_svgd_phi_matches_reference(n, d):
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    particles = jax.random.normal(k1, (n, d), jnp.float32)
    scores = jax.random.normal(k2, (n, d), jnp.float32)
    gamma = 0.7

    ref = svgd_phi_reference(particles, scores, gamma)
    out = svgd_phi_pallas(particles, scores, gamma, tile_rows=128,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-6)


def test_svgd_phi_padding_isolated():
    # padded rows must not perturb real rows even with extreme scores
    n, d = 100, 2
    particles = jax.random.normal(jax.random.PRNGKey(1), (n, d), jnp.float32)
    scores = 1e3 * jax.random.normal(jax.random.PRNGKey(2), (n, d),
                                     jnp.float32)
    ref = svgd_phi_reference(particles, scores, 1.3)
    out = svgd_phi_pallas(particles, scores, 1.3, tile_rows=64,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-3)
