"""Neural-ODE example models: latent ODE VAE and ODEnet classifier."""
import jax
import pytest
import jax.numpy as jnp
import numpy as np
import optax

from bayesian_ode_tpu import odeint, odeint_adjoint
from bayesian_ode_tpu.models import latent_ode, odenet, spiral


@pytest.mark.slow
def test_latent_ode_elbo_improves():
    orig, samp, orig_ts, samp_ts = latent_ode.generate_spiral2d(
        nspiral=32, ntotal=200, nsample=30, noise_std=0.3
    )
    samp = jnp.asarray(samp, jnp.float32)
    ts = jnp.asarray(samp_ts, jnp.float32)
    params = latent_ode.init_params(jax.random.PRNGKey(0))

    solve = lambda f, z0, t: odeint_adjoint(f, z0, t, rtol=1e-4, atol=1e-6,
                                            method="dopri5")
    loss_fn = latent_ode.make_loss(solve, samp, ts, noise_std=0.3)

    tx = optax.adam(5e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, key):
        val, g = jax.value_and_grad(loss_fn)(params, key)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, val

    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(30):
        key, sub = jax.random.split(key)
        params, opt_state, val = step(params, opt_state, sub)
        losses.append(float(val))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], (losses[0], losses[-1])


def test_latent_ode_encode_shapes():
    params = latent_ode.init_params(jax.random.PRNGKey(0))
    x = jnp.zeros((7, 25, 2))
    mu, logvar = latent_ode.encode(params["rec"], x)
    assert mu.shape == (7, 4) and logvar.shape == (7, 4)


@pytest.mark.slow
def test_odenet_forward_and_training_step():
    params = odenet.init_params(jax.random.PRNGKey(0), dim=16)
    key = jax.random.PRNGKey(1)
    images = jax.random.normal(key, (8, 28, 28, 1))
    labels = jax.random.randint(jax.random.PRNGKey(2), (8,), 0, 10)

    solve = lambda f, h0, t: odeint(f, h0, t, rtol=1e-3, atol=1e-3,
                                    method="rk4")
    logits = odenet.forward(params, images, solve)
    assert logits.shape == (8, 10)

    loss_fn = odenet.make_loss(solve, images, labels)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        val, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, val

    l0 = None
    for i in range(10):
        params, opt_state, val = step(params, opt_state)
        if l0 is None:
            l0 = float(val)
    # overfits the tiny batch
    assert float(val) < l0


def test_spiral_training_converges():
    # the ode_demo training loop shape (ode_demo.py:160-170), RMSprop on
    # random sub-trajectory batches
    t = jnp.linspace(0.0, 25.0, 400)
    true_y = odeint(spiral.true_field, spiral.TRUE_Y0, t, rtol=1e-7,
                    atol=1e-9, method="dopri5")
    params = spiral.init_params(jax.random.PRNGKey(0))
    tx = optax.rmsprop(1e-3)
    opt_state = tx.init(params)
    solve = lambda f, y0, tt: odeint(f, y0, tt, method="rk4")

    @jax.jit
    def step(params, opt_state, key):
        by0, bt, by = spiral.get_batch(key, true_y, t, batch_time=10,
                                       batch_size=16)
        loss = spiral.make_loss(solve, by0, bt, by)
        val, g = jax.value_and_grad(loss)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, val

    key = jax.random.PRNGKey(3)
    first = None
    for i in range(150):
        key, sub = jax.random.split(key)
        params, opt_state, val = step(params, opt_state, sub)
        if first is None:
            first = float(val)
    assert float(val) < 0.5 * first, (first, float(val))


@pytest.mark.slow
def test_odenet_resnet_baseline():
    # the reference's --network resnet switch (odenet_mnist.py:300-304)
    params = odenet.init_params(jax.random.PRNGKey(0), dim=8,
                                network="resnet", n_resblocks=2)
    images = jax.random.normal(jax.random.PRNGKey(1), (4, 28, 28, 1))
    logits = odenet.forward(params, images)
    assert logits.shape == (4, 10)
    labels = jnp.asarray([0, 1, 2, 3])
    loss_fn = odenet.make_loss(None, images, labels)
    val, g = jax.value_and_grad(loss_fn)(params)
    assert jnp.isfinite(val)


@pytest.mark.slow
def test_svgd_on_odenet_posterior():
    """BASELINE configs[4] tail clause: SVGD 'scales to odenet_mnist' —
    the SVGD kernel runs over the FULL ODEnet parameter pytree (each
    particle a complete network; leaves flattened internally), with the
    cross-entropy + L2 potential integrated by the ODE block.  Gate:
    particle-averaged potential decreases and stays finite."""
    from bayesian_ode_tpu import samplers

    n_particles = 4
    key = jax.random.PRNGKey(0)
    images = jax.random.normal(jax.random.PRNGKey(1), (8, 28, 28, 1))
    labels = jax.random.randint(jax.random.PRNGKey(2), (8,), 0, 10)
    solve = lambda f, h0, t: odeint(f, h0, t, rtol=1e-3, atol=1e-3,
                                    method="rk4")
    loss_fn = odenet.make_loss(solve, images, labels)

    def potential(params):
        flat = jnp.concatenate([x.ravel() for x in jax.tree.leaves(params)])
        return loss_fn(params) + 0.5 * 1e-3 * jnp.sum(flat**2)

    particles = jax.vmap(
        lambda k: odenet.init_params(k, dim=8)
    )(jax.random.split(key, n_particles))

    kernel = samplers.svgd(potential, step_size=1e-2, adagrad=True)
    state = kernel.init(particles)
    run = jax.jit(lambda s, k: samplers.sample_chain(
        kernel, s, k, num_samples=5, burn_in=0))
    _, positions, infos = run(state, jax.random.PRNGKey(3))
    pots = infos["potential"]
    assert bool(jnp.all(jnp.isfinite(pots)))
    assert float(pots[-1]) < float(pots[0])
    # recorded positions: flattened particle ensembles, full param dim
    n_params = sum(x.size for x in jax.tree.leaves(
        odenet.init_params(jax.random.PRNGKey(9), dim=8)))
    assert positions.shape == (5, n_particles, n_params)


@pytest.mark.slow
def test_svgd_on_latent_ode_posterior():
    """The latent_ode half of BASELINE configs[4]'s tail clause: SVGD over
    the full VAE parameter pytree (encoder RNN + latent field + decoder),
    potential = -ELBO at a fixed reparameterization key."""
    from bayesian_ode_tpu import samplers

    orig, samp, orig_ts, samp_ts = latent_ode.generate_spiral2d(
        nspiral=8, ntotal=60, nsample=12, noise_std=0.3
    )
    samp = jnp.asarray(samp, jnp.float32)
    ts = jnp.asarray(samp_ts, jnp.float32)
    solve = lambda f, z0, t: odeint(f, z0, t, rtol=1e-3, atol=1e-3,
                                    method="rk4")
    loss_fn = latent_ode.make_loss(solve, samp, ts, noise_std=0.3)
    fixed = jax.random.PRNGKey(7)
    potential = lambda p: loss_fn(p, fixed)

    particles = jax.vmap(latent_ode.init_params)(
        jax.random.split(jax.random.PRNGKey(0), 4))
    kernel = samplers.svgd(potential, step_size=1e-2, adagrad=True)
    state = kernel.init(particles)
    run = jax.jit(lambda s, k: samplers.sample_chain(
        kernel, s, k, num_samples=5, burn_in=0))
    _, positions, infos = run(state, jax.random.PRNGKey(3))
    pots = infos["potential"]
    assert bool(jnp.all(jnp.isfinite(pots)))
    assert float(pots[-1]) < float(pots[0])
