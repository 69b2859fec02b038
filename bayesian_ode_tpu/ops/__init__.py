"""Pallas TPU kernels for the hot ops (SURVEY.md §7.2 step 7).

- pallas_rbf: tiled SVGD phi (streamed n x n RBF kernel matrix)
- gp_dopri5: fused adaptive dopri5 for the GP vector field (per-step
  kernel + the faster whole-solve kernel with in-kernel while loop)
- gp_dopri5_grad: differentiable whole-solve dopri5 (records the accepted
  step mesh in-kernel; hand-written discrete-adjoint backward kernel)
- gp_rk4: fused rk4 trajectory + hand-written backward (custom VJP)
- mlp_rk4: the same for the MLP (neural-network) vector field
- mlp_dopri5: differentiable whole-solve dopri5 for the MLP field
- fused_adaptive: the shared recording/replay kernel bodies behind
  gp_dopri5_grad and mlp_dopri5 (field-callback parameterized)
- fused_field: the PUBLIC fused adaptive engine — register any vector
  field (FusedField) and get the differentiable whole-solve dopri5
  path without writing a kernel (docs/MIGRATION.md "Fusing a new
  model")
- spiral_dopri5: the spiral y^3-MLP field registered with fused_field
  (the worked example for new-field registration)
- fhn_dopri5: FitzHugh-Nagumo theta = (a, b, c) parameter inference
  registered with fused_field — the first MECHANISTIC fused field (the
  Ramsay/Girolami Bayesian-ODE benchmark posterior)
- gp_field: the GP field as a public-engine registration — the
  solver-agnostic route (method="tsit5") and the engine consistency
  gate; the hand-written gp_dopri5_grad adapter stays the production
  dopri5 path
"""
from .fhn_dopri5 import (  # noqa: F401
    fhn_dopri5_solve_stats,
    fhn_dopri5_trajectory,
    fhn_vector_field,
    make_fused_fhn_potential_dopri5,
)
from .fused_field import (  # noqa: F401
    FusedField,
    fused_dopri5_stats,
    fused_dopri5_trajectory,
)
from .gp_dopri5 import gp_dopri5_solve, gp_dopri5_solve_whole  # noqa: F401
from .gp_field import (  # noqa: F401
    gp_field_solve_stats,
    gp_field_trajectory,
)
from .gp_dopri5_grad import (  # noqa: F401
    gp_dopri5_trajectory,
    make_fused_gp_potential_dopri5,
)
from .gp_rk4 import gp_rk4_trajectory, make_fused_gp_potential  # noqa: F401
from .mlp_dopri5 import (  # noqa: F401
    make_fused_mlp_potential_dopri5,
    mlp_dopri5_solve_stats,
    mlp_dopri5_trajectory,
)
from .mlp_rk4 import make_fused_mlp_potential, mlp_rk4_trajectory  # noqa: F401
from .pallas_rbf import svgd_phi_pallas, svgd_phi_reference  # noqa: F401
from .spiral_dopri5 import (  # noqa: F401
    make_fused_spiral_potential_dopri5,
    spiral_dopri5_solve_stats,
    spiral_dopri5_trajectory,
)

__all__ = [
    "FusedField",
    "fhn_dopri5_solve_stats",
    "fhn_dopri5_trajectory",
    "fhn_vector_field",
    "make_fused_fhn_potential_dopri5",
    "gp_field_solve_stats",
    "gp_field_trajectory",
    "fused_dopri5_stats",
    "fused_dopri5_trajectory",
    "make_fused_spiral_potential_dopri5",
    "spiral_dopri5_solve_stats",
    "spiral_dopri5_trajectory",
    "gp_dopri5_solve",
    "gp_dopri5_solve_whole",
    "gp_dopri5_trajectory",
    "gp_rk4_trajectory",
    "make_fused_gp_potential",
    "make_fused_gp_potential_dopri5",
    "make_fused_mlp_potential",
    "make_fused_mlp_potential_dopri5",
    "mlp_dopri5_solve_stats",
    "mlp_dopri5_trajectory",
    "mlp_rk4_trajectory",
    "svgd_phi_pallas",
    "svgd_phi_reference",
]
