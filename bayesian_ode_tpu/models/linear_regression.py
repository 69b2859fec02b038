"""Bayesian linear regression toy (reference notebooks/jai/linear_reg.py).

1-D linear model y = w x + b + eps used as a smoke target for
MALA/SGLD/MMALA with the SoftAbs metric; the posterior is Gaussian, so
sampler output can be checked in closed form.
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp


def make_data(key, n: int = 50, w: float = 2.0, b: float = -0.7,
              noise: float = 0.3) -> Tuple[jax.Array, jax.Array]:
    kx, ke = jax.random.split(key)
    x = jax.random.uniform(kx, (n,), minval=-2.0, maxval=2.0)
    y = w * x + b + noise * jax.random.normal(ke, (n,))
    return x, y


def make_potential(x, y, noise: float = 0.3, prior_scale: float = 10.0
                   ) -> Callable:
    """U(theta) = NLL + Gaussian prior, theta = [w, b]."""

    def potential(theta):
        pred = theta[0] * x + theta[1]
        nll = jnp.sum((y - pred) ** 2) / (2.0 * noise**2)
        prior = jnp.sum(theta**2) / (2.0 * prior_scale**2)
        return nll + prior

    return potential


def exact_posterior(x, y, noise: float = 0.3, prior_scale: float = 10.0
                    ) -> Dict[str, jax.Array]:
    """Closed-form Gaussian posterior over [w, b]."""
    X = jnp.stack([x, jnp.ones_like(x)], axis=1)
    prec = X.T @ X / noise**2 + jnp.eye(2) / prior_scale**2
    cov = jnp.linalg.inv(prec)
    mean = cov @ (X.T @ y) / noise**2
    return {"mean": mean, "cov": cov}
