"""Ground-truth 2-D dynamics: Van der Pol, FitzHugh-Nagumo, Lotka-Volterra.

Reference: scripts/vanderpol/gp.py:27-38.  State is (..., 2) — batched over
leading axes so one call serves N trajectories or thousands of vmapped
chains.
"""
from __future__ import annotations

import jax.numpy as jnp


def vdp(t, x):
    """Van der Pol: [x' = v, v' = (1 - x^2) v - x] (gp.py:27-29)."""
    p, v = x[..., 0:1], x[..., 1:2]
    return jnp.concatenate([v, (1.0 - p**2) * v - p], axis=-1)


def fhn(t, x):
    """FitzHugh-Nagumo (gp.py:31-33)."""
    p, w = x[..., 0:1], x[..., 1:2]
    return jnp.concatenate(
        [3.0 * (p - p**3 / 3.0 + w), (0.2 - 3.0 * p - 0.2 * w) / 3.0], axis=-1
    )


def lv(t, x):
    """Lotka-Volterra (gp.py:35-37)."""
    u, v = x[..., 0:1], x[..., 1:2]
    return jnp.concatenate([1.5 * u - u * v, -3.0 * v + u * v], axis=-1)


DYNAMICS = {"vdp": vdp, "fhn": fhn, "lv": lv}
