"""Optimizers for MAP baselines (reference optims/LBFGS.py)."""
from .lbfgs import (  # noqa: F401
    LBFGSState,
    curvature_update,
    lbfgs_init,
    lbfgs_minimize,
    lbfgs_step,
    two_loop_recursion,
)

__all__ = [
    "LBFGSState",
    "curvature_update",
    "lbfgs_init",
    "lbfgs_minimize",
    "lbfgs_step",
    "two_loop_recursion",
]
