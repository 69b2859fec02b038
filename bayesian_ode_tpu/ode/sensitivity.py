"""Forward sensitivities of ODE solutions.

The reference sketches a forward-sensitivity autograd Function integrating
S' = J S + R jointly with the state (notebooks/jai/gp.ipynb cell 8,
`ODEINT_FS`/`ode_sens_rhs`).  In JAX the same computation — propagating
tangents through every solver step — is exactly forward-mode AD through the
integrator, and `lax.while_loop` supports JVPs, so the fast adaptive path
differentiates forward natively.  This helper packages it: the right tool
when the parameter count is small (the reference's Van der Pol models have
2-74 parameters), with cost O(n_params) solves fused into one.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax

from ..utils.pytree import PyTree
from .odeint import odeint


def odeint_forward_sensitivity(func: Callable, y0: PyTree, t, params: PyTree,
                               rtol: float = 1e-7, atol: float = 1e-9,
                               method: Optional[str] = None,
                               options: Optional[Dict[str, Any]] = None):
    """Returns (ys, dys/dparams) where `func(t, y, params)`.

    dys/dparams has the structure jacfwd produces: for each leaf pair the
    Jacobian of the stacked solution w.r.t. the parameter leaf.
    """
    def solve(p):
        return odeint(lambda t_, y_: func(t_, y_, p), y0, t, rtol, atol, method,
                      options)

    ys = solve(params)
    sens = jax.jacfwd(solve)(params)
    return ys, sens
