"""Experiment drivers + config grids (reference L5/L6, SURVEY.md §2.5-2.6)."""
from .config import (  # noqa: F401
    DEFAULT_VALUES,
    SENSIBLE_PARAMS,
    expand_grid,
    load_config,
    write_configs,
)
from .toy import run_toy  # noqa: F401
from .vanderpol_gp import build_model, run_optim, run_sampler, worker  # noqa: F401

__all__ = [
    "DEFAULT_VALUES",
    "SENSIBLE_PARAMS",
    "build_model",
    "expand_grid",
    "load_config",
    "run_optim",
    "run_sampler",
    "run_toy",
    "worker",
    "write_configs",
]
