"""Model-layer gates: dynamics, GP kernel regression, MLP field, toys."""
import jax
import pytest
import jax.numpy as jnp
import numpy as np

from bayesian_ode_tpu import odeint
from bayesian_ode_tpu.models import (
    TOY_POTENTIALS,
    kernel_regression as kr,
    make_dataset,
    mlp,
    spiral,
    vdp,
)


def test_dynamics_values():
    x = jnp.asarray([[1.0, 2.0]])
    out = vdp(0.0, x)
    # x' = v = 2; v' = (1 - 1)*2 - 1 = -1
    np.testing.assert_allclose(np.asarray(out), [[2.0, -1.0]], atol=1e-12)


def test_make_dataset_shapes():
    data = make_dataset(jax.random.PRNGKey(0), "vdp", N=3, T=15, t_max=5.0)
    assert data["X"].shape == (3, 15, 2)
    assert data["Y"].shape == (3, 15, 2)
    assert float(jnp.max(jnp.abs(data["Y"] - data["X"]))) > 0


def test_rbf_kernel_properties():
    key = jax.random.PRNGKey(1)
    X = jax.random.normal(key, (7, 2))
    K = kr.rbf(X, X, sf=1.3, ell=0.75)
    np.testing.assert_allclose(np.asarray(K), np.asarray(K.T), atol=1e-12)
    np.testing.assert_allclose(np.diag(np.asarray(K)), 1.3**2, atol=1e-12)
    evals = np.linalg.eigvalsh(np.asarray(K))
    assert evals.min() > -1e-10


def test_gradient_matching_init_approximates_field():
    # With dense low-noise observations the gradient-matched GP field
    # should roughly reproduce the true VDP field on the grid.
    data = make_dataset(jax.random.PRNGKey(2), "vdp", N=5, T=80, t_max=8.0,
                        noise=0.01)
    Z = kr.make_inducing_grid(data["Y"], M=6)
    static = kr.make_static(Z, sf=1.0, ell=0.75)
    params = kr.init_params(data["Y"], data["t"], static, noise=0.01)
    f_hat = kr.vector_field(params, static, 0.0, Z)
    f_true = vdp(0.0, Z)
    # correlation between predicted and true field components
    corr = np.corrcoef(np.asarray(f_hat).ravel(), np.asarray(f_true).ravel())[0, 1]
    assert corr > 0.75, corr


@pytest.mark.slow
def test_gp_potential_finite_and_prior_terms():
    data = make_dataset(jax.random.PRNGKey(3), "vdp", N=3, T=20, t_max=5.0)
    Z = kr.make_inducing_grid(data["Y"], M=4)
    static = kr.make_static(Z, sf=1.0, ell=0.75)
    params = kr.init_params(data["Y"], data["t"], static, noise=0.1)
    solve = lambda f, x0, t: odeint(f, x0, t, method="rk4")
    pot = kr.make_potential(static, data["x0"], data["t"], data["Y"], solve)
    pot_sse = kr.make_potential(static, data["x0"], data["t"], data["Y"],
                                solve, add_prior=False)
    u = pot(params)
    assert jnp.isfinite(u)
    assert float(pot_sse(params)) >= 0.0
    # gradient flows through the solve
    g = jax.grad(pot)(params)
    assert np.isfinite(np.asarray(g["U"])).all()
    assert g["logsn"].shape == (2,)


def test_mlp_field_and_curriculum():
    params = mlp.init_mlp(jax.random.PRNGKey(0), [2, 20, 20, 2])
    out = mlp.mlp_vector_field(params, 0.0, jnp.ones((4, 2)))
    assert out.shape == (4, 2)
    assert int(mlp.curriculum_length(0, 50)) == 3
    assert int(mlp.curriculum_length(10, 50)) == 5
    assert int(mlp.curriculum_length(10_000, 50)) == 50


def test_spiral_model():
    t = jnp.linspace(0.0, 25.0, 200)
    true_y = odeint(spiral.true_field, spiral.TRUE_Y0, t, method="dopri5")
    params = spiral.init_params(jax.random.PRNGKey(0))
    by0, bt, by = spiral.get_batch(jax.random.PRNGKey(1), true_y, t,
                                   batch_time=10, batch_size=8)
    assert by0.shape == (8, 2) and by.shape == (10, 8, 2)
    solve = lambda f, y0, tt: odeint(f, y0, tt, method="rk4")
    loss = spiral.make_loss(solve, by0, bt, by)
    val, grad = jax.value_and_grad(loss)(params)
    assert jnp.isfinite(val)
    assert np.isfinite(np.asarray(grad["w1"])).all()


def test_toy_potentials():
    banana = TOY_POTENTIALS["banana"]()
    # 0.5*(0.2*1 + (2*1 + 1)^2) at (1, 1)
    np.testing.assert_allclose(float(banana(jnp.asarray([1.0, 1.0]))),
                               0.5 * (0.2 + 9.0), rtol=1e-12)
    for name, builder in TOY_POTENTIALS.items():
        pot = builder()
        v = pot(jnp.asarray([0.3, -0.4]))
        assert jnp.isfinite(v), name
        g = jax.grad(pot)(jnp.asarray([0.3, -0.4]))
        assert jnp.all(jnp.isfinite(g)), name


def test_gp_log_density_parts():
    # make_log_density_parts: normalized split consistent with
    # make_potential's shape, pointwise sums to total, prior draws have
    # the advertised moments, and an analytic normalization gate
    from bayesian_ode_tpu import odeint

    data = make_dataset(jax.random.PRNGKey(5), "vdp", N=2, T=10, t_max=2.0,
                        noise=0.1)
    Z = kr.make_inducing_grid(data["Y"], M=3)
    static = kr.make_static(Z, sf=1.0, ell=0.75)
    params = kr.init_params(data["Y"], data["t"], static, noise=0.1)
    solve = lambda f, x0, t: odeint(f, x0, t, method="rk4")
    parts = kr.make_log_density_parts(static, data["x0"], data["t"],
                                      data["Y"], solve, noise=0.1)

    pt = parts.pointwise_log_lik(params)
    assert pt.shape == (20,)                      # N*T deletion points
    np.testing.assert_allclose(float(parts.log_lik(params)),
                               float(jnp.sum(pt)), rtol=1e-6)

    # log_lik differs from the unnormalized potential's data terms by
    # exactly the Gaussian normalizer -numel/2 log(2 pi)
    pot_ref = kr.make_potential(static, data["x0"], data["t"], data["Y"],
                                solve)
    numel = data["Y"].size
    sn2 = jnp.exp(params["logsn"]) ** 2
    prior_ref = jnp.trace(params["U"].T @ (static.Kzzinv @ params["U"])) / 2
    data_terms_ref = float(pot_ref(params)) - float(prior_ref)
    expect_ll = -data_terms_ref - 0.5 * numel * np.log(2 * np.pi)
    np.testing.assert_allclose(float(parts.log_lik(params)), expect_ll,
                               rtol=1e-6)

    # potential = -(ll + lp), gradients finite
    np.testing.assert_allclose(
        float(parts.potential(params)),
        -(float(parts.log_lik(params)) + float(parts.log_prior(params))),
        rtol=1e-6)
    g = jax.grad(parts.potential)(params)
    assert all(bool(jnp.isfinite(l).all()) for l in jax.tree.leaves(g))

    # prior draws: U columns ~ N(0, Kzz) (MC covariance), logsn ~
    # N(log noise, 1)
    draws = parts.sample_prior(jax.random.PRNGKey(0), 4000)
    U = np.asarray(draws["U"])                    # (n, P, D)
    Kzz = np.asarray(kr.rbf(static.Z, static.Z, static.sf, static.ell))
    emp = np.einsum("npd,nqd->pq", U, U) / (4000 * U.shape[-1])
    np.testing.assert_allclose(emp, Kzz, atol=0.12)
    ls = np.asarray(draws["logsn"])
    assert abs(ls.mean() - np.log(0.1)) < 0.05
    assert abs(ls.std() - 1.0) < 0.05

    # prior log-density is NORMALIZED: MC check int q(x) dx = 1 via
    # importance sampling identity E_prior[1] under its own draws is
    # trivial, so instead check log_prior at the prior mode equals the
    # analytic Gaussian peak height
    P, D = U.shape[1], U.shape[2]
    mode = {"U": jnp.zeros((P, D)), "logsn": jnp.full((D,), np.log(0.1))}
    sign, logdet = np.linalg.slogdet(Kzz)
    expect = (-0.5 * D * logdet - 0.5 * P * D * np.log(2 * np.pi)
              - 0.5 * D * np.log(2 * np.pi))     # logsn_sd = 1
    np.testing.assert_allclose(float(parts.log_prior(mode)), expect,
                               rtol=1e-6)
