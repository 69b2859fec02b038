"""Spiral neural-ODE demo (reference neuralode_examples/ode_demo.py).

True dynamics dy/dt = y^3 @ A with A = [[-0.1, 2], [-2, -0.1]]
(ode_demo.py:30-41); the learned vector field is Linear(2, 50)-Tanh-
Linear(50, 2) applied to y^3 (ode_demo.py:111-128, weights ~ N(0, 0.1),
zero bias); training minibatches are random sub-trajectories
(ode_demo.py:44-49).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

# numpy, not jnp: a module-level jnp constant initializes the XLA
# backend at import, which breaks multi-host users who must call
# jax.distributed.initialize / parallel.runtime.init_runtime BEFORE the
# first device use (tests/test_runtime_multiprocess.py).  jnp ops accept
# numpy operands transparently.
TRUE_A = np.asarray([[-0.1, 2.0], [-2.0, -0.1]])
TRUE_Y0 = np.asarray([2.0, 0.0])


def true_field(t, y):
    return (y**3) @ TRUE_A


def init_params(key, hidden: int = 50):
    k1, k2 = jax.random.split(key)
    return {
        "w1": 0.1 * jax.random.normal(k1, (2, hidden)),
        "b1": jnp.zeros((hidden,)),
        "w2": 0.1 * jax.random.normal(k2, (hidden, 2)),
        "b2": jnp.zeros((2,)),
    }


def vector_field(params, t, y):
    h = jnp.tanh((y**3) @ params["w1"] + params["b1"])
    return h @ params["w2"] + params["b2"]


def get_batch(key, true_y, t, batch_time: int = 10, batch_size: int = 20):
    """Random sub-trajectory minibatch (ode_demo.py:44-49): returns
    (batch_y0 (B, 2), batch_t (batch_time,), batch_y (batch_time, B, 2))."""
    n = true_y.shape[0] - batch_time
    s = jax.random.choice(key, n, (batch_size,), replace=False)
    batch_y0 = true_y[s]
    batch_t = t[:batch_time]
    batch_y = jnp.stack([true_y[s + i] for i in range(batch_time)])
    return batch_y0, batch_t, batch_y


def make_potential(x0, ts, X, solve: Callable, reg: float = 0.5,
                   add_prior: bool = True):
    """SSE + L2 posterior potential of the spiral y^3-net field over N
    shared initial points (the mlp.make_potential convention, so the
    spiral architecture drops into the same driver/sampler contract;
    reference ode_demo.py trains this field by MSE — the Bayesian
    potential is its SSE/L2 counterpart).

    x0 (N, 2); ts (T,); X (N, T, 2) observations; params =
    `init_params`' dict.  Returns a per-chain scalar potential for
    `vmap`/the generic engine (the fused route is
    ops.spiral_dopri5.make_fused_spiral_potential_dopri5)."""

    def potential(params):
        f = lambda tt, y: vector_field(params, tt, y)  # noqa: E731
        traj = solve(f, x0, ts)                        # (T, N, 2)
        loss = jnp.sum((X - jnp.transpose(traj, (1, 0, 2))) ** 2)
        if add_prior:
            loss = loss + reg * sum(
                jnp.sum(v ** 2) for v in jax.tree.leaves(params))
        return loss

    return potential


def make_loss(odeint_fn: Callable, batch_y0, batch_t, batch_y):
    """mean |pred - batch| (ode_demo.py:165)."""

    def loss(params):
        pred = odeint_fn(
            lambda tt, y: vector_field(params, tt, y), batch_y0, batch_t
        )
        return jnp.mean(jnp.abs(pred - batch_y))

    return loss
