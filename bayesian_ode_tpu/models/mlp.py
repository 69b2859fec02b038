"""MLP (neural-network) ODE vector field.

Reference: notebooks/jai/nn.ipynb cell 4 — Linear(D, H)-ELU-Linear(H, H)-
ELU-Linear(H, D) with uniform(-0.5, 0.5) weight init, Bayesian closure
SSE + L2 prior (reg * sum p^2), and the incremental-sequence-learning
curriculum T = min(3 + itr//5, len(t)) (cell 6).
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from ..utils.pytree import tree_sum_squares


def init_mlp(key, sizes: Sequence[int]):
    """Layer params [{'w', 'b'}] with uniform(-0.5, 0.5) weights and zero
    biases (nn.ipynb init_normal)."""
    params = []
    for d_in, d_out in zip(sizes[:-1], sizes[1:]):
        key, sub = jax.random.split(key)
        params.append({
            "w": jax.random.uniform(sub, (d_in, d_out), minval=-0.5, maxval=0.5),
            "b": jnp.zeros((d_out,)),
        })
    return params


def mlp_vector_field(params, t, x, precision=None):
    """f(t, x) for x (..., D); ELU activations between layers.

    `precision`: pass jax.lax.Precision.HIGHEST when integrating with an
    ADAPTIVE solver on TPU (bf16 matmul passes make the error estimate
    chase rounding noise; see kernel_regression.rbf)."""
    h = x
    for layer in params[:-1]:
        h = jax.nn.elu(
            jnp.matmul(h, layer["w"], precision=precision) + layer["b"])
    last = params[-1]
    return jnp.matmul(h, last["w"], precision=precision) + last["b"]


def curriculum_length(itr, total: int) -> jax.Array:
    """Incremental sequence learning: T = min(3 + itr//5, total)
    (nn.ipynb cell 6)."""
    return jnp.minimum(3 + itr // 5, total)


def make_potential(x0, t, X, odeint_fn: Callable, reg: float = 0.5,
                   add_prior: bool = True, horizon=None,
                   precision=None) -> Callable:
    """SSE + L2 prior over MLP weights (nn.ipynb cell 6).

    `horizon`: optional static number of observation times to fit (the
    curriculum's T); None uses the full trajectory.  x0 (N, D), X (N, T, D).
    `precision`: RHS matmul precision (HIGHEST for adaptive solvers).
    """
    X = jnp.asarray(X)
    T = X.shape[1] if horizon is None else int(horizon)
    t_ = t[:T]
    X_ = X[:, :T, :]

    def potential(params):
        xode = odeint_fn(
            lambda tt, x: mlp_vector_field(params, tt, x, precision),
            x0, t_)
        xode = jnp.moveaxis(xode, 0, 1)
        loss = jnp.sum((X_ - xode) ** 2)
        if add_prior:
            loss += reg * tree_sum_squares(params)
        return loss

    return potential
