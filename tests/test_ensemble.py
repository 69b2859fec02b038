"""Goodman-Weare stretch-move gates (samplers/ensemble.py).

The headline property is affine invariance: identical sampling quality
on a condition-1e4 Gaussian with NO preconditioning — the regime where
unpreconditioned MALA/RWM stall.  Moment gates on isotropic and
correlated Gaussians also pin the z^(d-1) volume factor (a wrong d
biases every marginal variance).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_ode_tpu import samplers


def _run(potential_batch, init, steps=3000, burn=1000, seed=0, a=2.0):
    kernel = samplers.stretch_move(potential_batch, a=a)
    state = kernel.init(init)
    _, positions, infos = samplers.sample_chain(
        kernel, state, jax.random.key(seed), steps, burn_in=burn)
    return positions, infos


def test_isotropic_gaussian_moments():
    def pot(pos):
        return 0.5 * jnp.sum(pos["x"] ** 2, axis=-1)

    init = {"x": jax.random.normal(jax.random.key(1), (64, 3))}
    positions, infos = _run(pot, init)
    xs = np.asarray(positions["x"]).reshape(-1, 3)   # (S*N, 3)
    assert np.allclose(xs.mean(0), 0.0, atol=0.08)
    assert np.allclose(xs.var(0), 1.0, atol=0.12)
    acc = np.asarray(infos["accepted"], np.float64).mean()
    assert 0.15 < acc < 0.9
    assert infos["accepted"].shape[-1] == 64


def test_affine_invariance_on_ill_conditioned_gaussian():
    # diag(1, 1e-4) covariance: condition 1e4 with zero tuning
    s2 = jnp.asarray([1.0, 1e-4])

    def pot(pos):
        return 0.5 * jnp.sum(pos ** 2 / s2, axis=-1)

    init = 0.1 * jax.random.normal(jax.random.key(2), (128, 2))
    positions, infos = _run(pot, init, steps=4000, burn=2000)
    xs = np.asarray(positions).reshape(-1, 2)
    assert np.allclose(xs.var(0), np.asarray(s2), rtol=0.2)
    # acceptance does NOT collapse despite the 1e4 condition number
    assert np.asarray(infos["accepted"], np.float64).mean() > 0.15


def test_correlated_gaussian_and_pytree_positions():
    rho = 0.9
    prec = np.linalg.inv(np.asarray([[1.0, rho], [rho, 1.0]]))
    prec_j = jnp.asarray(prec)

    def pot(pos):
        v = jnp.stack([pos["a"], pos["b"]], axis=-1)
        return 0.5 * jnp.einsum("ni,ij,nj->n", v, prec_j, v)

    k1, k2 = jax.random.split(jax.random.key(3))
    init = {"a": jax.random.normal(k1, (64,)),
            "b": jax.random.normal(k2, (64,))}
    positions, _ = _run(pot, init, steps=4000, burn=2000)
    a = np.asarray(positions["a"]).ravel()
    b = np.asarray(positions["b"]).ravel()
    assert abs(np.corrcoef(a, b)[0, 1] - rho) < 0.05
    assert abs(a.var() - 1.0) < 0.15


def test_validation():
    def pot(pos):
        return 0.5 * jnp.sum(pos ** 2, axis=-1)

    with pytest.raises(ValueError):
        samplers.stretch_move(pot, a=1.0)
    kernel = samplers.stretch_move(pot)
    with pytest.raises(ValueError):       # odd ensemble
        kernel.init(jnp.zeros((7, 2)))
    with pytest.raises(ValueError):       # too few walkers
        kernel.init(jnp.zeros((2, 2)))


def test_jit_and_sharded_compatible_shapes():
    def pot(pos):
        return 0.5 * jnp.sum(pos ** 2, axis=-1)

    kernel = samplers.stretch_move(pot)
    state = kernel.init(jax.random.normal(jax.random.key(0), (32, 4)))
    step = jax.jit(kernel.step)
    state, info = step(jax.random.key(1), state)
    assert state.position.shape == (32, 4)
    assert info["potential"].shape == (32,)
