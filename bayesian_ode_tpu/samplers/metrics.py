"""Riemannian metrics for MMALA (SoftAbs / Hessian / Identity).

Reference: samplers/metrics.py.  The dense per-row Hessian loops of
`eval_full_hessian` (metrics.py:11-31) collapse to `jax.hessian`; the
eigendecompositions run on-device.

Deliberate fixes vs the reference (documented, validated by tests):
  - SoftAbsMetric's full metric used an elementwise product in place of a
    matmul (`eigvec * mm(diag, eigvec.t())`, metrics.py:53-54) and returned
    the *metric* under the 'invMetric' key (metrics.py:66-68); here
    Metric = V diag(lam') V^T and invMetric is its actual inverse.
"""
from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from ..utils.pytree import PyTree, ravel_pytree


def flat_hessian(potential_fn: Callable, position: PyTree) -> jax.Array:
    """Dense Hessian of the potential on the flattened parameter vector
    (replaces eval_full_hessian, metrics.py:11-31)."""
    vec, unravel = ravel_pytree(position)
    return jax.hessian(lambda v: potential_fn(unravel(v)))(vec)


def softabs_metric(potential_fn: Callable, softabs_coeff: float = 1.0
                   ) -> Callable[[PyTree], Dict[str, jax.Array]]:
    """SoftAbs metric (Betancourt, arXiv:1212.4693; metrics.py:33-89).

    Eigendecompose the Hessian and regularize eigenvalues with
    lam' = lam / tanh(alpha * lam) (positive, smooth |lam|).
    """

    def metric(position):
        H = flat_hessian(potential_fn, position)
        lam, V = jnp.linalg.eigh(H)
        lam_m = lam / jnp.tanh(lam * softabs_coeff)
        return {
            "hess": H,
            "Metric": (V * lam_m) @ V.T,
            "invMetric": (V / lam_m) @ V.T,
            "sqrtMetric": V * jnp.sqrt(lam_m),
            "sqrtinvMetric": V / jnp.sqrt(lam_m),
            "log_det_sqrt": 0.5 * jnp.sum(jnp.log(lam_m)),
        }

    return metric


def hessian_metric(potential_fn: Callable, rcond: float = 1e-6,
                   identity_factor: float = 1e-8
                   ) -> Callable[[PyTree], Dict[str, jax.Array]]:
    """Raw-Hessian metric: pinverse + jittered Cholesky square root
    (metrics.py:104-137)."""

    def metric(position):
        H = flat_hessian(potential_fn, position)
        Hinv = jnp.linalg.pinv(H, rtol=rcond)
        L = jnp.linalg.cholesky(
            Hinv + identity_factor * jnp.eye(Hinv.shape[0], dtype=Hinv.dtype)
        )
        return {"Metric": H, "invMetric": Hinv, "sqrtinvMetric": L}

    return metric


def identity_metric(size: int) -> Callable[[PyTree], Dict[str, jax.Array]]:
    """Euclidean metric (metrics.py:91-102); MMALA degenerates to MALA."""
    eye = jnp.eye(size)

    def metric(position):
        return {"Metric": eye, "invMetric": eye, "sqrtinvMetric": eye}

    return metric
