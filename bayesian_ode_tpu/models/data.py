"""Trajectory dataset generation for the Bayesian ODE experiments.

Mirrors the data dict created in notebooks/jai/gp.ipynb cell 6 and consumed
by scripts/vanderpol/gp.py:544: {N, R, noise, x0, t, X, Y, ODE} — N
trajectories from random initial conditions integrated with the true
dynamics, X clean, Y with additive Gaussian noise.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..ode import odeint
from .dynamics import DYNAMICS


def make_dataset(key, ode: str = "vdp", N: int = 5, T: int = 40,
                 t_max: float = 10.0, noise: float = 0.1,
                 x0_scale: float = 2.0, method: str = "dopri5",
                 rtol: float = 1e-7, atol: float = 1e-9) -> Dict:
    """Solve the true dynamics from N random x0 and add observation noise."""
    k_x0, k_noise = jax.random.split(key)
    f = DYNAMICS[ode]
    t = jnp.linspace(0.0, t_max, T)
    x0 = x0_scale * jax.random.normal(k_x0, (N, 2))
    X = odeint(f, x0, t, rtol, atol, method=method)      # (T, N, 2)
    X = jnp.moveaxis(X, 0, 1)                            # (N, T, 2)
    Y = X + noise * jax.random.normal(k_noise, X.shape)
    return {
        "N": N, "R": 1, "noise": noise, "x0": x0, "t": t, "X": X, "Y": Y,
        "ODE": ode,
    }
