"""Gates for the FitzHugh-Nagumo registration on the public fused
engine (ops/fhn_dopri5.py) — the fourth field, and the first mechanistic
parameter-inference one (per-chain theta = (a, b, c)).

Protocol mirrors tests/test_fused_field.py's spiral gates: forward
parity against the generic dopri5 integrator, gradient parity against
float64 bounded-scan backprop truth, potential parity, and a
posterior-shape sanity check (the potential is minimized near the
generating parameters).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_ode_tpu import odeint
from bayesian_ode_tpu.ops.fhn_dopri5 import (
    fhn_dopri5_solve_stats,
    fhn_dopri5_trajectory,
    fhn_vector_field,
    make_fused_fhn_potential_dopri5,
)

_TRUTH = {"a": 0.2, "b": 0.2, "c": 3.0}


def _chain_theta(C, key=0, scale=0.1):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    return {
        name: (_TRUTH[name]
               + scale * jax.random.normal(k, (C,))).astype(jnp.float32)
        for name, k in zip(("a", "b", "c"), ks)
    }


def _gen_traj(theta, x0, ts, rtol, atol):
    """Generic per-chain dopri5 reference of the same field."""

    def one(th):
        f = lambda tt, X: fhn_vector_field(th, tt, X)
        return odeint(f, x0, ts, method="dopri5", rtol=rtol, atol=atol,
                      options={"mode": "bounded"})

    return jnp.moveaxis(jax.vmap(one)(theta), 0, 1)     # (T, C, N, 2)


@pytest.mark.slow
def test_fhn_dopri5_fused_matches_generic():
    f32, f64 = jnp.float32, jnp.float64
    N, T, C = 2, 10, 4
    rtol, atol = 1e-5, 1e-7
    theta = _chain_theta(C)
    x0 = jnp.asarray([[-1.0, 1.0], [0.5, -0.6]], f32)
    ts = jnp.linspace(0.0, 4.0, T).astype(f32)

    traj = fhn_dopri5_trajectory(theta, x0, ts, rtol=rtol, atol=atol,
                                 interpret=True)
    ref = _gen_traj(theta, x0, ts, rtol, atol)
    rel = float(jnp.max(jnp.abs(traj - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 1e-4, rel

    # gradient parity vs float64 ground truth (frozen-step-mesh adjoint
    # error is O(rtol) relative — same bound as the spiral gate)
    W = jax.random.normal(jax.random.PRNGKey(5), traj.shape, f64)
    t64 = jax.tree.map(lambda x: x.astype(f64), theta)
    g_truth = jax.grad(lambda p: jnp.sum(
        _gen_traj(p, x0.astype(f64), ts.astype(f64), rtol, atol) * W))(t64)
    g_fused = jax.grad(lambda p: jnp.sum(
        fhn_dopri5_trajectory(p, x0, ts, rtol=rtol, atol=atol,
                              interpret=True) * W.astype(f32)))(theta)
    t_flat = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g_truth)])
    f_flat = jnp.concatenate(
        [x.ravel() for x in jax.tree.leaves(g_fused)]).astype(f64)
    scale = float(jnp.max(jnp.abs(t_flat)))
    err = float(jnp.max(jnp.abs(f_flat - t_flat))) / scale
    assert err < 50 * rtol, err

    _, st = fhn_dopri5_solve_stats(theta, x0, ts, rtol=rtol, atol=atol,
                                   interpret=True)
    assert st["n_iterations"].shape == (C,)
    assert int(jnp.max(st["n_iterations"])) <= 128
    assert int(jnp.min(st["nfe"])) >= 6


@pytest.mark.slow
def test_fhn_potential_parity_and_shape():
    """Potential parity vs the directly-computed Gaussian posterior, and
    the posterior is lowest at the generating theta (a perturbed chain
    scores strictly worse)."""
    f32 = jnp.float32
    N, T = 1, 12
    rtol, atol = 1e-5, 1e-7
    x0 = jnp.asarray([[-1.0, 1.0]], f32)
    ts = jnp.linspace(0.0, 5.0, T).astype(f32)

    truth = {k: jnp.full((1,), v, f32) for k, v in _TRUTH.items()}
    clean = _gen_traj(truth, x0, ts, 1e-7, 1e-9)       # (T, 1, N, 2)
    noise = 0.05
    Y = np.transpose(np.asarray(clean[:, 0]), (1, 0, 2)) \
        + noise * np.asarray(jax.random.normal(
            jax.random.PRNGKey(7), (N, T, 2)))          # (N, T, 2)

    pot = make_fused_fhn_potential_dopri5(
        x0, ts, Y, noise=noise, prior_loc=(0.2, 0.2, 3.0), rtol=rtol,
        atol=atol, interpret=True)

    theta = {
        "a": jnp.asarray([0.2, 0.35, 0.2], f32),
        "b": jnp.asarray([0.2, 0.2, 0.5], f32),
        "c": jnp.asarray([3.0, 2.6, 3.4], f32),
    }
    got = pot(theta)

    # direct recomputation through the generic engine
    ref = _gen_traj(theta, x0, ts, rtol, atol)
    xode = jnp.transpose(ref, (1, 2, 0, 3))
    sse = jnp.sum((jnp.asarray(Y, f32)[None] - xode) ** 2, axis=(1, 2, 3))
    th = jnp.stack([theta["a"], theta["b"], theta["c"]], axis=-1)
    loc = jnp.asarray([0.2, 0.2, 3.0], f32)
    want = sse / (2 * noise**2) + 0.5 * jnp.sum((th - loc) ** 2, axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4)

    # the generating parameters beat both perturbed chains
    assert float(got[0]) < float(got[1])
    assert float(got[0]) < float(got[2])
