"""FitzHugh-Nagumo parameter-inference model: theta = (a, b, c).

The reference uses FHN only as a fixed ground-truth data generator
(scripts/vanderpol/gp.py:31-33) and approximates its field with GP/NN
surrogates; this model exposes the canonical Bayesian-ODE task those
surrogates sidestep — direct inference of the mechanistic parameters
(Ramsay et al. 2007; Girolami & Calderhead 2011 §9), classic
parameterization with truth (a, b, c) = (0.2, 0.2, 3.0):

    V' = c (V - V^3/3 + R)
    R' = -(V - a + b R) / c

`vector_field` broadcasts over any leading state axes (the
models/dynamics.py convention); `make_potential` follows the
spiral/mlp driver contract so theta drops into the same sampler /
L-BFGS / driver machinery.  The fused whole-solve route is
ops.fhn_dopri5 (the same field registered with the public engine).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

_THIRD = 1.0 / 3.0

TRUE_THETA = {"a": 0.2, "b": 0.2, "c": 3.0}


def vector_field(theta, t, x):
    """FHN field at theta {'a','b','c'} (scalars or arrays broadcasting
    against x's leading axes); x (..., 2)."""
    del t
    p, w = x[..., 0:1], x[..., 1:2]
    a, b, c = theta["a"], theta["b"], theta["c"]
    return jnp.concatenate(
        [c * (p - p**3 * _THIRD + w), -(p - a + b * w) / c], axis=-1)


def init_theta(key=None, scale: float = 0.0):
    """Initial theta at the classic truth, optionally jittered."""
    theta = {k: jnp.asarray(v, jnp.float32) for k, v in TRUE_THETA.items()}
    if key is not None and scale:
        ks = jax.random.split(key, 3)
        theta = {
            k: v + scale * jax.random.normal(kk, v.shape, v.dtype)
            for (k, v), kk in zip(theta.items(), ks)
        }
    return theta


def make_potential(x0, ts, X, solve: Callable, noise: float = 0.1,
                   prior_loc=(0.0, 0.0, 3.0), prior_scale=(1.0, 1.0, 1.0),
                   add_prior: bool = True):
    """Gaussian-likelihood posterior potential over theta.

    x0 (N, 2) initial points; ts (T,); X (N, T, 2) observations at known
    noise; independent Gaussian priors on (a, b, c).  Returns a
    per-chain scalar potential for `vmap`/the generic engine (the fused
    route is ops.fhn_dopri5.make_fused_fhn_potential_dopri5, which
    matches this up to solver tolerance).  Note c must stay positive
    (the field divides by it); the default prior keeps chains
    initialized near the truth well away from 0.
    """
    X = jnp.asarray(X, jnp.float32)
    inv_two_noise_sq = 0.5 / float(noise) ** 2
    loc = jnp.asarray(prior_loc, jnp.float32)
    scale = jnp.asarray(prior_scale, jnp.float32)

    def potential(theta):
        f = lambda tt, y: vector_field(theta, tt, y)  # noqa: E731
        traj = solve(f, x0, ts)                       # (T, N, 2)
        loss = inv_two_noise_sq * jnp.sum(
            (X - jnp.transpose(traj, (1, 0, 2))) ** 2)
        if add_prior:
            th = jnp.stack([theta["a"], theta["b"], theta["c"]])
            loss = loss + 0.5 * jnp.sum(((th - loc) / scale) ** 2)
        return loss

    return potential
