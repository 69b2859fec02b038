"""The minimum end-to-end slice (SURVEY.md §7.3): GP Van der Pol posterior,
rk4 + continuous adjoint, SGLD kernel vmapped over chains, chain + ESS out.
This is the workload shape of BASELINE.json config #1."""
import jax
import pytest
import jax.numpy as jnp
import numpy as np

from bayesian_ode_tpu import odeint_adjoint, samplers
from bayesian_ode_tpu.models import kernel_regression as kr
from bayesian_ode_tpu.models import make_dataset
from bayesian_ode_tpu.optim import lbfgs_minimize
from bayesian_ode_tpu.samplers import schedules


# end-to-end integration (test_end_to_end.py): compile-dominated; the fast
# core gate deselects with -m 'not slow', plain pytest runs all
pytestmark = pytest.mark.slow


def _setup(M=6, N=5, T=60):
    data = make_dataset(jax.random.PRNGKey(2), "vdp", N=N, T=T, t_max=6.0,
                        noise=0.05, x0_scale=1.5)
    Z = kr.make_inducing_grid(data["Y"], M=M)
    static = kr.make_static(Z, sf=1.0, ell=0.75)
    params0 = kr.init_params(data["Y"], data["t"], static, noise=0.05)
    solve = lambda f, x0, t: odeint_adjoint(f, x0, t, method="rk4")
    potential = kr.make_potential(static, data["x0"], data["t"], data["Y"],
                                  solve)
    return data, static, params0, potential


@pytest.mark.slow
def test_sgld_gp_vdp_posterior_chains():
    data, static, params0, potential = _setup()
    sched = schedules.polynomial_decay(lr0=1e-5, gamma=0.55, t0=100)
    kernel = samplers.sgld(potential, step_size=sched)

    n_chains = 8
    states = samplers.init_chains(kernel, jax.random.PRNGKey(1), params0,
                                  n_chains, jitter=0.01)
    run = jax.jit(
        lambda s, k: samplers.sample_chains(kernel, s, k, num_samples=40,
                                            burn_in=40, thin=2)
    )
    _, positions, infos = run(states,
                              jax.random.split(jax.random.PRNGKey(2), n_chains))

    assert positions["U"].shape == (n_chains, 40, 36, 2)
    assert positions["logsn"].shape == (n_chains, 40, 2)
    pots = infos["potential"]
    assert np.isfinite(np.asarray(pots)).all()
    # Langevin dynamics descends into the posterior bulk
    assert float(jnp.median(pots[:, -1])) < float(jnp.median(pots[:, 0]))

    # chain diagnostics on a scalar summary (the ESS half of the
    # effective-samples/sec north-star metric)
    e = samplers.ess(positions["logsn"][:, :, 0])
    assert np.isfinite(float(e)) and float(e) > 0

    # posterior-mode (min potential) sample defines a field close to truth
    flat_idx = jnp.argmin(pots)
    ci, si = jnp.unravel_index(flat_idx, pots.shape)
    best = {
        "U": positions["U"][ci, si],
        "logsn": positions["logsn"][ci, si],
    }
    from bayesian_ode_tpu.models import vdp

    f_hat = kr.vector_field(best, static, 0.0, static.Z)
    f_true = vdp(0.0, static.Z)
    corr = np.corrcoef(np.asarray(f_hat).ravel(),
                       np.asarray(f_true).ravel())[0, 1]
    assert corr > 0.6, corr


def test_map_optimization_lbfgs():
    # The reference's run_optim MAP baseline (gp.py:120-139) with
    # FullBatchLBFGS + line search.
    data, static, params0, potential = _setup()
    u0 = float(potential(params0))
    x, value, trace, state = lbfgs_minimize(
        potential, params0, max_iters=30, line_search="armijo", history_size=8
    )
    assert float(value) < 0.5 * u0, (float(value), u0)
    assert np.isfinite(np.asarray(trace)).all()


def test_mala_gp_vdp_acceptance():
    data, static, params0, potential = _setup()
    kernel = samplers.mala(potential, step_size=2e-6)
    states = samplers.init_chains(kernel, jax.random.PRNGKey(3), params0, 4,
                                  jitter=0.01)
    _, positions, infos = samplers.sample_chains(
        kernel, states, jax.random.split(jax.random.PRNGKey(4), 4),
        num_samples=30, burn_in=20,
    )
    acc = float(jnp.mean(infos["accepted"].astype(jnp.float32)))
    assert acc > 0.2, acc


def test_svgd_gp_vdp_posterior():
    # BASELINE.json config #5: SVGD particle ensemble (64-1024) on the GP
    # mean-function nonparametric ODE posterior.
    data, static, params0, potential = _setup()
    from bayesian_ode_tpu.utils.pytree import ravel_pytree

    vec0, unravel = ravel_pytree(params0)
    pot_flat = lambda v: potential(unravel(v))

    kernel = samplers.svgd(pot_flat, step_size=2e-5, use_pallas="never")
    n_particles = 64
    particles = vec0[None] + 0.01 * jax.random.normal(
        jax.random.PRNGKey(0), (n_particles, vec0.shape[0]), vec0.dtype
    )
    state = kernel.init(particles)
    pots0 = jax.vmap(pot_flat)(state.particles)
    state, _, _ = samplers.sample_chain(kernel, state, jax.random.PRNGKey(1),
                                        num_samples=1, burn_in=60)
    pots1 = jax.vmap(pot_flat)(state.particles)
    # the particle ensemble flows toward the posterior bulk
    assert float(jnp.median(pots1)) < float(jnp.median(pots0))
    assert np.isfinite(np.asarray(state.particles)).all()


@pytest.mark.slow
def test_psgld_mlp_vdp_posterior():
    # BASELINE.json config #3: Van der Pol with the NN (MLP) mean-function
    # baseline under P-SGLD (RMSprop-style preconditioner).
    from bayesian_ode_tpu import odeint
    from bayesian_ode_tpu.models import mlp

    data = make_dataset(jax.random.PRNGKey(5), "vdp", N=3, T=30, t_max=4.0,
                        noise=0.05, x0_scale=1.2)
    solve = lambda f, x0, t: odeint(jax.checkpoint(f), x0, t, method="rk4")
    potential = mlp.make_potential(data["x0"], data["t"], data["X"], solve,
                                   reg=0.5)
    params0 = mlp.init_mlp(jax.random.PRNGKey(0), [2, 20, 20, 2])

    kernel = samplers.psgld(potential, step_size=1e-4, alpha=0.99)
    states = samplers.init_chains(kernel, jax.random.PRNGKey(1), params0, 8,
                                  jitter=0.01)
    _, positions, infos = jax.jit(
        lambda s, k: samplers.sample_chains(kernel, s, k, num_samples=80,
                                            burn_in=120)
    )(states, jax.random.split(jax.random.PRNGKey(2), 8))
    pots = infos["potential"]
    assert np.isfinite(np.asarray(pots)).all()
    # P-SGLD descends into the posterior bulk from the random init
    assert float(jnp.median(pots[:, -1])) < float(jnp.median(pots[:, 0]))
