"""bayesian_ode_tpu: a TPU-native framework for Bayesian inference in
(nonparametric) ODE models.

Built from scratch in JAX/XLA/Pallas with the capabilities of the reference
`jaivardhankapoor/bayesian-ode` repository (see SURVEY.md): a jittable ODE
solver stack with continuous-adjoint gradients, stochastic-gradient MCMC
samplers as pure transition kernels vmapped across chains, L-BFGS MAP
optimization, and nonparametric ODE models.
"""
from . import sde  # noqa: F401
from .sde import sdeint  # noqa: F401
from .ode import (  # noqa: F401
    SOLVERS,
    DenseSolution,
    odeint,
    odeint_adjoint,
    odeint_dense,
    odeint_event,
    odeint_event_with_stats,
    odeint_forward_sensitivity,
    odeint_with_stats,
)

__version__ = "0.1.0"
