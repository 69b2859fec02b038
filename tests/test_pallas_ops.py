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


def test_gp_dopri5_fused_matches_generic():
    # The fused whole-step kernel must reproduce the generic adaptive
    # integrator: identical step decisions (NFE) and f32-level trajectories.
    from bayesian_ode_tpu import odeint_with_stats
    from bayesian_ode_tpu.models import kernel_regression as kr
    from bayesian_ode_tpu.models import make_dataset
    from bayesian_ode_tpu.ops.gp_dopri5 import gp_dopri5_solve

    data = make_dataset(jax.random.PRNGKey(2), "vdp", N=5, T=15, t_max=3.0,
                        noise=0.05, x0_scale=1.5)
    Z = kr.make_inducing_grid(data["Y"], M=6)
    static = kr.make_static(Z, sf=1.0, ell=0.75)
    p0 = kr.init_params(data["Y"], data["t"], static, noise=0.05)
    C = 128
    A = (static.KzzinvL @ p0["U"]).astype(jnp.float32)[None] + \
        3e-3 * jax.random.normal(jax.random.PRNGKey(0), (C, 36, 2),
                                 jnp.float32)
    x0 = data["x0"].astype(jnp.float32)

    ys, st = gp_dopri5_solve(A, x0, data["t"], static, interpret=True)
    assert bool(st["reached_final_time"])

    static32 = static._replace(
        Z=static.Z.astype(jnp.float32),
        KzzinvL=static.KzzinvL.astype(jnp.float32),
        Kzzinv=static.Kzzinv.astype(jnp.float32),
    )

    def solve_one(Ac):
        f = lambda tt, X: kr.vector_field_fast(Ac, static32, tt, X,
                                               jax.lax.Precision.HIGHEST)
        ys_, st_ = odeint_with_stats(f, x0, data["t"], 1e-7, 1e-9,
                                     method="dopri5")
        return ys_, st_["nfe"]

    ys_ref, nfe_ref = jax.vmap(solve_one)(A)
    ys_ref = jnp.moveaxis(ys_ref, 0, 1)
    # f32 op-order differences flip marginal accept decisions on a few
    # chains (+-2 steps); require per-chain NFE within 10% and matching
    # trajectories.
    np.testing.assert_allclose(np.asarray(st["nfe"]), np.asarray(nfe_ref),
                               rtol=0.1)
    assert float(jnp.max(jnp.abs(ys - ys_ref))) < 2e-3
