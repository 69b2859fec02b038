"""TPU-native ODE solver stack: jittable adaptive/fixed integrators,
continuous-adjoint and forward-sensitivity gradients."""
from .odeint import SOLVERS, odeint, odeint_with_stats  # noqa: F401
from .adjoint import odeint_adjoint  # noqa: F401
from .sensitivity import odeint_forward_sensitivity  # noqa: F401
from .events import odeint_event, odeint_event_with_stats  # noqa: F401
from .dense import DenseSolution, odeint_dense  # noqa: F401

__all__ = [
    "SOLVERS",
    "DenseSolution",
    "odeint",
    "odeint_adjoint",
    "odeint_dense",
    "odeint_event",
    "odeint_event_with_stats",
    "odeint_forward_sensitivity",
    "odeint_with_stats",
]
