"""SDE stack (sde/): scheme exactness, strong-order convergence against
analytic Ito/Stratonovich solutions, gradients, and the Euler-Maruyama
pseudo-likelihood inference layer (closed-form OU conjugate gate).

The vendored reference is ODE-only, so every gate here is against
analytic truth.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_ode_tpu import sde


def _gbm(mu, sigma):
    drift = lambda t, y: mu * y
    diff = lambda t, y: sigma * y
    return drift, diff


def _brownian(key, n_steps, shape, dt):
    return jax.random.normal(key, (n_steps,) + shape) * np.sqrt(dt)


def test_zero_diffusion_is_euler_ode():
    # sigma=0 reduces EM to explicit Euler on dy/dt = -y
    ts = np.linspace(0.0, 1.0, 101)
    ys = sde.sdeint(lambda t, y: -y, lambda t, y: jnp.zeros_like(y),
                    jnp.asarray(2.0), ts, jax.random.PRNGKey(0))
    euler = 2.0 * (1.0 - 0.01) ** 100
    np.testing.assert_allclose(float(ys[-1]), euler, rtol=1e-12)
    assert ys.shape == (101,)


def test_em_ou_discretization_is_exact_ar1():
    # The EM chain on dy = -theta y dt + sigma dW is EXACTLY the AR(1)
    # y_{k+1} = (1 - theta dt) y_k + sigma sqrt(dt) eps — machinery gate
    # with zero discretization tolerance: moments over many paths match
    # the AR(1) recursion's analytic mean/variance to MC error.
    theta, sigma, dt, n = 1.3, 0.7, 0.05, 40
    npaths = 200_000
    ts = np.arange(n + 1) * dt
    y0 = jnp.full((npaths,), 1.5)
    ys = sde.sdeint(lambda t, y: -theta * y,
                    lambda t, y: jnp.full_like(y, sigma),
                    y0, ts, jax.random.PRNGKey(1))
    a = 1.0 - theta * dt
    mean_true = 1.5 * a ** n
    var_true = sigma**2 * dt * (1 - a ** (2 * n)) / (1 - a**2)
    yT = np.asarray(ys[-1])
    assert abs(yT.mean() - mean_true) < 4 * np.sqrt(var_true / npaths)
    np.testing.assert_allclose(yT.var(), var_true, rtol=0.02)


def test_strong_order_em_and_milstein():
    # GBM strong error vs the exact Ito solution on a SHARED refined
    # Brownian path: EM slope ~0.5, Milstein ~1.0
    mu, sigma, T = 0.7, 0.8, 1.0
    npaths = 4096
    levels = [2**k for k in (4, 5, 6, 7, 8)]
    n_fine = levels[-1]
    dW_fine = _brownian(jax.random.PRNGKey(2), n_fine, (npaths,), T / n_fine)
    WT = jnp.sum(dW_fine, axis=0)
    y_exact = np.exp((mu - 0.5 * sigma**2) * T + sigma * np.asarray(WT))

    drift, diff = _gbm(mu, sigma)
    errs = {"euler_maruyama": [], "milstein": []}
    for n in levels:
        agg = jnp.sum(dW_fine.reshape(n, n_fine // n, npaths), axis=1)
        ts = np.linspace(0.0, T, n + 1)
        for method in errs:
            ys = sde.sdeint(drift, diff, jnp.ones(npaths), ts, None,
                            method=method, options={"dW": agg})
            errs[method].append(
                float(jnp.mean(jnp.abs(ys[-1] - y_exact))))

    def slope(es):
        x = -np.log2(np.asarray(levels, float))
        y = np.log2(np.asarray(es))
        return np.polyfit(x, y, 1)[0]

    s_em = slope(errs["euler_maruyama"])
    s_mil = slope(errs["milstein"])
    assert 0.35 < s_em < 0.7, (s_em, errs["euler_maruyama"])
    assert 0.85 < s_mil < 1.2, (s_mil, errs["milstein"])
    # Milstein strictly dominates at every level on this elementwise SDE
    assert all(m < e for m, e in zip(errs["milstein"],
                                     errs["euler_maruyama"]))


def test_heun_converges_to_stratonovich():
    # Heun solves the STRATONOVICH GBM: y = y0 exp(mu T + sigma W_T)
    # (no -sigma^2/2 Ito correction)
    mu, sigma, T = 0.4, 0.6, 1.0
    npaths = 4096
    n = 512
    dW = _brownian(jax.random.PRNGKey(3), n, (npaths,), T / n)
    WT = np.asarray(jnp.sum(dW, axis=0))
    y_strat = np.exp(mu * T + sigma * WT)
    y_ito = np.exp((mu - 0.5 * sigma**2) * T + sigma * WT)

    drift, diff = _gbm(mu, sigma)
    ys = sde.sdeint(drift, diff, jnp.ones(npaths), np.linspace(0, T, n + 1),
                    None, method="heun", options={"dW": dW})
    yT = np.asarray(ys[-1])
    err_strat = np.mean(np.abs(yT - y_strat))
    err_ito = np.mean(np.abs(yT - y_ito))
    assert err_strat < 0.02, err_strat
    assert err_strat < 0.2 * err_ito  # clearly the Stratonovich limit


def test_general_noise_single_step():
    # g: (B, D, M) against M=3 Brownian dims; one EM step checked by hand
    B, D, M = 4, 2, 3
    key = jax.random.PRNGKey(4)
    G = jax.random.normal(key, (B, D, M))
    y0 = jax.random.normal(jax.random.PRNGKey(5), (B, D))
    dW = jax.random.normal(jax.random.PRNGKey(6), (1, B, M)) * np.sqrt(0.1)

    drift = lambda t, y: -y
    diff = lambda t, y: jnp.broadcast_to(G, y.shape[:-1] + (D, M))
    ys = sde.sdeint(drift, diff, y0, np.asarray([0.0, 0.1]), None,
                    noise_type="general", options={"dW": dW})
    expected = y0 - 0.1 * y0 + jnp.einsum("bdm,bm->bd", G, dW[0])
    np.testing.assert_allclose(np.asarray(ys[-1]), np.asarray(expected),
                               rtol=1e-12)


def test_substeps_match_fine_grid():
    # substeps=k with explicit dW equals integrating the fine grid directly
    drift, diff = _gbm(0.5, 0.3)
    n, k = 10, 8
    T = 1.0
    dW = _brownian(jax.random.PRNGKey(7), n * k, (16,), T / (n * k))
    ts_coarse = np.linspace(0, T, n + 1)
    ts_fine = np.linspace(0, T, n * k + 1)
    y0 = jnp.ones(16)
    ys_sub = sde.sdeint(drift, diff, y0, ts_coarse, None,
                        options={"substeps": k, "dW": dW})
    ys_fine = sde.sdeint(drift, diff, y0, ts_fine, None,
                         options={"dW": dW})
    np.testing.assert_allclose(np.asarray(ys_sub),
                               np.asarray(ys_fine[::k]), rtol=1e-12)
    assert ys_sub.shape == (n + 1, 16)


def test_gradients_match_fd_and_checkpoint():
    # d y_T / d mu on a fixed Brownian path, EM: AD vs finite differences;
    # checkpoint=True is bit-compatible with the plain scan
    sigma, T, n = 0.4, 1.0, 64
    dW = _brownian(jax.random.PRNGKey(8), n, (), T / n)
    ts = np.linspace(0, T, n + 1)

    def endpoint(mu, ckpt=False):
        drift, diff = _gbm(mu, sigma)
        ys = sde.sdeint(drift, diff, jnp.asarray(1.0), ts, None,
                        options={"dW": dW, "checkpoint": ckpt})
        return ys[-1]

    g = float(jax.grad(endpoint)(0.6))
    eps = 1e-6
    fd = float((endpoint(0.6 + eps) - endpoint(0.6 - eps)) / (2 * eps))
    np.testing.assert_allclose(g, fd, rtol=1e-5)
    g_ckpt = float(jax.grad(lambda m: endpoint(m, True))(0.6))
    np.testing.assert_allclose(g, g_ckpt, rtol=1e-12)


def test_key_reproducible_and_batch_consistent():
    drift, diff = _gbm(0.2, 0.5)
    ts = np.linspace(0, 1, 33)
    y0 = jnp.ones(8)
    a = sde.sdeint(drift, diff, y0, ts, jax.random.PRNGKey(9))
    b = sde.sdeint(drift, diff, y0, ts, jax.random.PRNGKey(9))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = sde.sdeint(drift, diff, y0, ts, jax.random.PRNGKey(10))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-3


def test_validation_errors():
    drift, diff = _gbm(0.1, 0.1)
    y0 = jnp.ones(())
    ts = np.asarray([0.0, 1.0])
    with pytest.raises(ValueError, match="unknown SDE method"):
        sde.sdeint(drift, diff, y0, ts, jax.random.PRNGKey(0), method="x")
    with pytest.raises(ValueError, match="unknown noise_type"):
        sde.sdeint(drift, diff, y0, ts, jax.random.PRNGKey(0),
                   noise_type="x")
    with pytest.raises(ValueError, match="unknown sdeint options"):
        sde.sdeint(drift, diff, y0, ts, jax.random.PRNGKey(0),
                   options={"step_size": 0.1})
    with pytest.raises(ValueError, match="increasing"):
        sde.sdeint(drift, diff, y0, np.asarray([1.0, 0.0]),
                   jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="needs `key`"):
        sde.sdeint(drift, diff, y0, ts, None)
    with pytest.raises(ValueError, match="diagonal"):
        sde.sdeint(drift, diff, y0, ts, jax.random.PRNGKey(0),
                   method="milstein", noise_type="general")
    with pytest.raises(ValueError, match="concrete"):
        jax.jit(lambda t: sde.sdeint(drift, diff, y0, t,
                                     jax.random.PRNGKey(0)))(jnp.asarray(ts))


# ---------------------------------------------------------------------------
# inference layer


def _simulate_ou(theta, sigma, y0, ts, key, substeps=20):
    ys = sde.sdeint(lambda t, y: -theta * y,
                    lambda t, y: jnp.full_like(y, sigma),
                    y0, ts, key, options={"substeps": substeps})
    return ys


def test_ou_conjugate_posterior_closed_form():
    # EM pseudo-likelihood of dy = -theta y dt + sigma dW is exactly
    # quadratic in theta; with a N(0, tau^2) prior the posterior is
    # Gaussian with precision P = sum(y_k^2 dt)/sigma^2 + 1/tau^2 and
    # mean  = -sum(y_k (y_{k+1}-y_k))/sigma^2 / P.  The potential's
    # minimizer and curvature must reproduce it exactly.
    sigma, tau = 0.5, 2.0
    ts = np.linspace(0.0, 4.0, 161)
    Y = _simulate_ou(0.8, sigma, jnp.full((32,), 2.0), ts,
                     jax.random.PRNGKey(11))          # (T, R)
    pot = sde.make_sde_potential(
        lambda th: (lambda t, y: -th * y),
        lambda th: (lambda t, y: jnp.full_like(y, sigma)),
        ts, Y,
        log_prior=lambda th: -0.5 * th**2 / tau**2)

    dt = float(ts[1] - ts[0])
    Yn = np.asarray(Y)
    y0s, y1s = Yn[:-1], Yn[1:]
    P = (y0s**2).sum() * dt / sigma**2 + 1.0 / tau**2
    mean = -(y0s * (y1s - y0s)).sum() / sigma**2 / P

    # quadratic potential: curvature from AD, minimizer from one Newton step
    g = jax.grad(pot)
    h = jax.grad(g)
    th0 = jnp.asarray(0.3)
    curv = float(h(th0))
    argmin = float(th0 - g(th0) / curv)
    np.testing.assert_allclose(curv, P, rtol=1e-9)
    np.testing.assert_allclose(argmin, mean, rtol=1e-9, atol=1e-12)
    # and the recovered drift rate is near the simulation truth
    assert abs(argmin - 0.8) < 0.1, argmin


def test_ou_posterior_nuts_moments():
    # the same potential through the sampler contract: NUTS moments match
    # the closed-form Gaussian posterior
    from bayesian_ode_tpu import samplers

    sigma, tau = 0.5, 2.0
    ts = np.linspace(0.0, 4.0, 81)
    Y = _simulate_ou(0.8, sigma, jnp.full((8,), 2.0), ts,
                     jax.random.PRNGKey(12))
    pot = sde.make_sde_potential(
        lambda th: (lambda t, y: -th * y),
        lambda th: (lambda t, y: jnp.full_like(y, sigma)),
        ts, Y,
        log_prior=lambda th: -0.5 * th**2 / tau**2)

    dt = float(ts[1] - ts[0])
    Yn = np.asarray(Y)
    P = (Yn[:-1] ** 2).sum() * dt / sigma**2 + 1.0 / tau**2
    mean = -(Yn[:-1] * (Yn[1:] - Yn[:-1])).sum() / sigma**2 / P

    kernel = samplers.nuts(pot, step_size=0.5 / np.sqrt(P))
    states = samplers.init_chains(kernel, jax.random.PRNGKey(13),
                                  jnp.asarray(mean), num_chains=64,
                                  jitter=float(1.0 / np.sqrt(P)))
    keys = jax.random.split(jax.random.PRNGKey(14), 64)
    _, positions, _ = samplers.sample_chains(kernel, states, keys,
                                             num_samples=150, burn_in=50)
    draws = np.asarray(positions).ravel()
    se = 1.0 / np.sqrt(P) / np.sqrt(400)   # generous ESS floor
    assert abs(draws.mean() - mean) < 6 * se, (draws.mean(), mean)
    np.testing.assert_allclose(draws.std(), 1.0 / np.sqrt(P), rtol=0.15)


def test_gp_sde_potential_batched_matches_per_chain():
    # the fused-contract batched NPSDE potential == vmap of the scalar one
    from bayesian_ode_tpu.models import kernel_regression as kr

    ts = np.linspace(0.0, 3.0, 31)
    # 2-D replicate data: (R, T, 2)
    y0 = jax.random.normal(jax.random.PRNGKey(31), (6, 2))
    A = jnp.asarray([[-0.4, 0.9], [-0.9, -0.4]])
    ys = sde.sdeint(lambda t, y: y @ A.T,
                    lambda t, y: jnp.full_like(y, 0.2),
                    y0, ts, jax.random.PRNGKey(32), options={"substeps": 4})
    Y = jnp.moveaxis(ys, 0, 1)

    Z = kr.make_inducing_grid(Y, M=4)
    static = kr.make_static(Z, sf=1.0, ell=1.0)
    pot = sde.make_gp_sde_potential(
        static, ts, Y, precision=jax.lax.Precision.HIGHEST)
    pot_b = sde.make_gp_sde_potential_batched(
        static, ts, Y, precision=jax.lax.Precision.HIGHEST)

    C = 5
    params = {
        "U": jax.random.normal(jax.random.PRNGKey(33), (C, 16, 2)) * 0.3,
        "logsd": jax.random.normal(jax.random.PRNGKey(34), (C, 2)) * 0.2,
    }
    got = pot_b(params)
    want = jax.vmap(pot)(params)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-6)
    # gradients agree too (the sampler consumes them)
    gb = jax.grad(lambda p: jnp.sum(pot_b(p)))(params)
    gv = jax.vmap(jax.grad(pot))(params)
    for k in params:
        np.testing.assert_allclose(np.asarray(gb[k]), np.asarray(gv[k]),
                                   rtol=1e-4, atol=1e-6)


def test_latent_sde_girsanov_kl_channel_analytic():
    # The augmented-state KL trick latent_sde.make_loss rides: with
    # constant drift mismatch (h - f) = c and diffusion g, the Girsanov
    # penalty integrates to T * |c/g|^2 / 2 exactly (the "kl" channel has
    # zero diffusion and a deterministic drift here).
    c, g, T = jnp.asarray([0.6, -0.2]), 0.5, 2.0
    ts = np.linspace(0.0, T, 41)

    def drift(t, s):
        u = c / g
        return {"z": jnp.zeros_like(s["z"]),
                "kl": jnp.full_like(s["kl"], 0.5 * jnp.sum(u * u))}

    def diffusion(t, s):
        return {"z": jnp.full_like(s["z"], g),
                "kl": jnp.zeros_like(s["kl"])}

    path = sde.sdeint(drift, diffusion,
                      {"z": jnp.zeros((3, 2)), "kl": jnp.zeros((3,))},
                      ts, jax.random.PRNGKey(20))
    np.testing.assert_allclose(np.asarray(path["kl"][-1]),
                               T * float(jnp.sum((c / g) ** 2)) / 2,
                               rtol=1e-6)


def test_latent_sde_shapes_and_grads():
    from bayesian_ode_tpu.models import latent_sde

    params = latent_sde.init_params(jax.random.PRNGKey(21), latent_dim=3,
                                    obs_dim=2, ctx_dim=4, nhidden=8,
                                    rnn_nhidden=8)
    B, T = 5, 9
    ts = np.linspace(0.0, 1.0, T)
    xs = jax.random.normal(jax.random.PRNGKey(22), (B, T, 2))

    ctx, qm, qlv = latent_sde.encode(params, xs)
    assert ctx.shape == (B, T, 4)
    assert qm.shape == (B, 3) and qlv.shape == (B, 3)

    loss = latent_sde.make_loss(ts, xs, substeps=2)
    val, g = jax.value_and_grad(loss)(params, jax.random.PRNGKey(23))
    assert np.isfinite(float(val))
    # every parameter group gets a finite, somewhere-nonzero gradient
    for name, leaf_tree in params.items():
        leaves = jax.tree.leaves(g[name])
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves), name
        assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves), name

    prior = latent_sde.sample_prior(params, jax.random.PRNGKey(24), ts, 6)
    assert prior.shape == (6, T, 2)
    post = latent_sde.sample_posterior(params, jax.random.PRNGKey(25), ts, xs)
    assert post.shape == (B, T, 2)
    assert np.isfinite(np.asarray(prior)).all()
    assert np.isfinite(np.asarray(post)).all()


@pytest.mark.slow
def test_latent_sde_elbo_improves():
    from bayesian_ode_tpu.models import latent_sde

    # noisy sinusoid batch, same flavor as the latent ODE spiral gate
    B, T = 16, 25
    ts = np.linspace(0.0, 3.0, T)
    phase = jax.random.uniform(jax.random.PRNGKey(26), (B, 1)) * 2 * np.pi
    clean = jnp.stack([jnp.sin(ts[None] + phase), jnp.cos(ts[None] + phase)],
                      axis=-1)
    xs = clean + 0.1 * jax.random.normal(jax.random.PRNGKey(27), clean.shape)

    params = latent_sde.init_params(jax.random.PRNGKey(28), latent_dim=4,
                                    obs_dim=2, ctx_dim=8, nhidden=16,
                                    rnn_nhidden=16)
    loss = latent_sde.make_loss(ts, xs, noise_std=0.1, substeps=2)

    import optax

    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, key):
        val, g = jax.value_and_grad(loss)(params, key)
        upd, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, val

    key = jax.random.PRNGKey(29)
    losses = []
    for _ in range(60):
        key, sub = jax.random.split(key)
        params, opt_state, val = step(params, opt_state, sub)
        losses.append(float(val))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) - 1.0, (
        np.mean(losses[:10]), np.mean(losses[-10:]))


def test_gp_sde_map_recovers_linear_drift():
    # NPSDE: GP drift + learnable constant diffusion, MAP-fit on 2-D
    # linear-SDE data; fitted drift at the data points approaches the true
    # field and logsd recovers the simulation sigma
    from bayesian_ode_tpu.models import kernel_regression as kr

    A = jnp.asarray([[-0.5, 1.0], [-1.0, -0.5]])
    sigma = 0.15
    ts = np.linspace(0.0, 6.0, 121)
    y0 = jax.random.normal(jax.random.PRNGKey(15), (24, 2)) * 1.5
    ys = sde.sdeint(lambda t, y: y @ A.T,
                    lambda t, y: jnp.full_like(y, sigma),
                    y0, ts, jax.random.PRNGKey(16),
                    options={"substeps": 10})          # (T, R, 2)
    Y = jnp.moveaxis(ys, 0, 1)                          # (R, T, 2)

    Z = kr.make_inducing_grid(Y, M=6)
    static = kr.make_static(Z, sf=1.0, ell=1.0)
    pot = sde.make_gp_sde_potential(static, ts, Y)
    params = {
        "U": kr.gradient_matching_init(Y, jnp.asarray(ts), static),
        "logsd": jnp.zeros((2,)),
    }

    import optax

    opt = optax.adam(3e-2)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        loss, g = jax.value_and_grad(pot)(params)
        upd, state = opt.update(g, state)
        return optax.apply_updates(params, upd), state, loss

    for _ in range(400):
        params, state, loss = step(params, state)
    assert np.isfinite(float(loss))

    # diffusion recovered
    sd_hat = np.exp(np.asarray(params["logsd"]))
    np.testing.assert_allclose(sd_hat, sigma, rtol=0.25)

    # drift field error at the data points well below the field scale
    X = Y.reshape(-1, 2)
    f_true = X @ A.T
    Afit = kr.precompute_weights({"U": params["U"]}, static)
    f_hat = kr.vector_field_fast(Afit, static, 0.0, X)
    rel = float(jnp.linalg.norm(f_hat - f_true) / jnp.linalg.norm(f_true))
    assert rel < 0.25, rel


# ---------------------------------------------------------------------------
# sdeint_adjoint: O(1)-memory reversible adjoint (sde/adjoint.py)
# ---------------------------------------------------------------------------

def _neural_sde_setup(substeps=1, n_out=9):
    """Small nonlinear SDE with closure params in drift AND diffusion."""
    ts = np.linspace(0.0, 0.8, n_out)
    n_steps = (n_out - 1) * substeps
    key = jax.random.PRNGKey(7)
    k_w, k_dw = jax.random.split(key)
    W = jax.random.normal(k_w, (3, 3)) * 0.4
    b = jnp.asarray([0.1, -0.2, 0.3])
    c = jnp.asarray(0.25)
    y0 = jnp.asarray([0.5, -0.3, 0.8])
    # internal-grid dt for the increments
    dt = (ts[-1] - ts[0]) / n_steps
    dW = jax.random.normal(k_dw, (n_steps, 3)) * np.sqrt(dt)
    return ts, y0, W, b, c, dW


def test_sdeint_adjoint_forward_parity():
    # identical step map => bit-level parity with
    # sdeint(method="reversible_heun") on the same increments
    for substeps in (1, 3):
        ts, y0, W, b, c, dW = _neural_sde_setup(substeps=substeps)
        drift = lambda t, y: jnp.tanh(W @ y) + b
        diff = lambda t, y: c * jnp.cos(y)
        ys_ref = sde.sdeint(drift, diff, y0, ts, None,
                            method="reversible_heun",
                            options={"dW": dW, "substeps": substeps})
        ys_adj = sde.sdeint_adjoint(drift, diff, y0, ts, None,
                                    options={"dW": dW,
                                             "substeps": substeps})
        np.testing.assert_array_equal(np.asarray(ys_ref),
                                      np.asarray(ys_adj))


@pytest.mark.parametrize("substeps", [1, 2])
def test_sdeint_adjoint_grads_match_scan_autodiff(substeps):
    # grads w.r.t. y0, closure params (drift + diffusion), and dW against
    # plain reverse-mode through the stored-trajectory scan; cotangent on
    # a MID-OUTPUT slice (not just the endpoint) exercises the
    # substeps-aware injection in _rev_bwd
    ts, y0, W, b, c, dW = _neural_sde_setup(substeps=substeps)

    def loss(method_adjoint, y0, W, b, c, dW):
        drift = lambda t, y: jnp.tanh(W @ y) + b
        diff = lambda t, y: c * jnp.cos(y)
        if method_adjoint:
            ys = sde.sdeint_adjoint(drift, diff, y0, ts, None,
                                    options={"dW": dW,
                                             "substeps": substeps})
        else:
            ys = sde.sdeint(drift, diff, y0, ts, None,
                            method="reversible_heun",
                            options={"dW": dW, "substeps": substeps})
        # weight every output point incl. an interior one asymmetrically
        wts = jnp.linspace(0.3, 1.7, ys.shape[0])[:, None]
        return jnp.sum(wts * ys**2) + 3.0 * jnp.sum(ys[ys.shape[0] // 2])

    g_adj = jax.grad(lambda *a: loss(True, *a), argnums=(0, 1, 2, 3, 4))(
        y0, W, b, c, dW)
    g_ref = jax.grad(lambda *a: loss(False, *a), argnums=(0, 1, 2, 3, 4))(
        y0, W, b, c, dW)
    for ga, gr in zip(g_adj, g_ref):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gr),
                                   rtol=2e-5, atol=2e-6)


def test_sdeint_adjoint_jits_and_draws_noise():
    # key-driven path (no explicit dW) under jit; value finite and
    # reproducible across calls
    ts = np.linspace(0.0, 0.5, 6)
    y0 = jnp.asarray([1.0, -1.0])

    @jax.jit
    def run(key):
        return sde.sdeint_adjoint(lambda t, y: -y,
                                  lambda t, y: 0.3 * jnp.ones_like(y),
                                  y0, ts, key)

    a = run(jax.random.PRNGKey(3))
    b = run(jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.all(np.isfinite(np.asarray(a)))
