"""Step-size schedules shared by the samplers.

Pure functions of the iteration index (carried in each kernel state), so
schedules trace into the scan body — no Python-side mutation as in the
reference's `get_lr` methods.
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp


def constant(lr: float) -> Callable:
    return lambda t: jnp.asarray(lr)


def polynomial_decay(lr0: float, gamma: float = 0.55, t0: float = 100.0,
                     alpha: float = 1.0) -> Callable:
    """lr(t) = lr0 / (t0 + alpha*t)^gamma (reference langevin.py:205-210)."""
    return lambda t: lr0 / jnp.power(t0 + alpha * t, gamma)


def cyclical_cosine(lr0: float, num_cycles: int, total_iters: int) -> Callable:
    """Cyclical cosine schedule of cSGLD/acSGHMC (langevin.py:1662-1670).

    lr(t) = lr0/2 * (cos(pi*r(t)) + 1) with
    r(t) = ((t-1) mod ceil) / ceil, ceil = (total_iters + M) // M.
    """
    ceil = (total_iters + num_cycles) // num_cycles

    def lr(t):
        r = cycle_position(t, num_cycles, total_iters)
        return lr0 / 2.0 * (jnp.cos(jnp.pi * r) + 1.0)

    return lr


def cycle_position(t, num_cycles: int, total_iters: int):
    """r(t) in [0, 1): position within the current cycle
    (reference `_r`, langevin.py:1668-1670)."""
    ceil = (total_iters + num_cycles) // num_cycles
    return jnp.mod(t - 1, ceil) / ceil


def resolve(step_size) -> Callable:
    """Accept either a float or a schedule callable."""
    if callable(step_size):
        return step_size
    return constant(float(step_size))
