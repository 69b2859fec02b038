"""2-D toy target densities for sampler visualization/validation.

Reference: scripts/toy/toy_plots.py:14-123.  Each returns a potential
U(theta) = -log p(x, y) over theta = [x, y] (constants dropped), matching
the reference closures exactly.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def banana_potential(a: float = 0.2, b: float = 2.0, c: float = 1.0):
    """0.5*(a x^2 + (b y + c x^2)^2) (toy_plots.py:18-21)."""

    def potential(theta):
        x, y = theta[0], theta[1]
        return 0.5 * (a * x * x + (b * y + c * x * x) ** 2)

    return potential


def gaussian_potential(sigma1: float = 1.0, sigma2: float = 2.0,
                       corr: float = 0.5, mean=(2.0, 4.0)):
    """Correlated Gaussian centered at (2, 4) (toy_plots.py:94-99).

    Note: the reference's exponent lacks the usual global 1/2 factor — its
    target is a Gaussian with covariance halved relative to (sigma1, sigma2,
    corr); replicated as-is.
    """

    def potential(theta):
        x_ = (theta[0] - mean[0]) / sigma1
        y_ = (theta[1] - mean[1]) / sigma2
        return (x_**2 + y_**2 - 2 * corr * x_ * y_) / (2 * (1 - corr**2))

    return potential


def mixture_potential(mixture=(0.5, 0.5), means=((-1, -1), (1, 1)),
                      sigmas=((1, 0.5), (0.5, 1)), corr=(0.5, -0.5)):
    """-log of a Gaussian mixture (toy_plots.py:46-62); same
    un-normalized component form as the reference (no 1/2 exponent
    factor, 1/(s1 s2 sqrt(1-r^2)) weights)."""
    mixture = jnp.asarray(mixture)
    means = jnp.asarray(means, jnp.result_type(float))
    sigmas = jnp.asarray(sigmas).astype(jnp.result_type(float))
    corr = jnp.asarray(corr).astype(jnp.result_type(float))

    def potential(theta):
        x_ = (theta[0] - means[:, 0]) / sigmas[:, 0]
        y_ = (theta[1] - means[:, 1]) / sigmas[:, 1]
        comp = (
            mixture
            * jnp.exp(-(x_**2 + y_**2 - 2 * corr * x_ * y_) / (2 * (1 - corr**2)))
            / (sigmas[:, 0] * sigmas[:, 1] * jnp.sqrt(1 - corr**2))
        )
        return -jnp.log(jnp.sum(comp))

    return potential


def four_mixture_potential():
    """4-component mixture used in the reference grids."""
    return mixture_potential(
        mixture=(0.25, 0.25, 0.25, 0.25),
        means=((-2, -2), (-2, 2), (2, -2), (2, 2)),
        sigmas=((0.7, 0.7),) * 4,
        corr=(0.0, 0.0, 0.0, 0.0),
    )


def gaussian_grid_potential(n: int = 5, spacing: float = 2.0,
                            sigma: float = 0.3):
    """n x n grid of isotropic Gaussians (the reference's 5x5 grid toy)."""
    ax = (np.arange(n) - (n - 1) / 2.0) * spacing
    means = np.stack(np.meshgrid(ax, ax), axis=-1).reshape(-1, 2)
    k = means.shape[0]
    return mixture_potential(
        mixture=tuple([1.0 / k] * k),
        means=tuple(map(tuple, means)),
        sigmas=tuple([(sigma, sigma)] * k),
        corr=tuple([0.0] * k),
    )


TOY_POTENTIALS = {
    "banana": banana_potential,
    "gauss": gaussian_potential,
    "multimodal": mixture_potential,
    "four_mixture": four_mixture_potential,
    "gauss_grid": gaussian_grid_potential,
}
