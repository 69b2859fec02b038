"""Stochastic differential equations: fixed-grid solvers + Bayesian
Euler-Maruyama pseudo-likelihood inference (the NPSDE half of the npde
lineage the reference's GP model replicates)."""
from .sdeint import SDE_METHODS, sdeint  # noqa: F401
from .adjoint import sdeint_adjoint  # noqa: F401
from .inference import (  # noqa: F401
    em_log_likelihood,
    make_gp_sde_potential,
    make_gp_sde_potential_batched,
    make_sde_potential,
)

__all__ = [
    "SDE_METHODS",
    "em_log_likelihood",
    "make_gp_sde_potential",
    "make_gp_sde_potential_batched",
    "make_sde_potential",
    "sdeint",
    "sdeint_adjoint",
]
