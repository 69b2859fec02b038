"""Device-mesh parallelism (chain data-parallel + particle-parallel SVGD)."""
from .chains import (  # noqa: F401
    gp_dopri5_solve_sharded,
    run_svgd_sharded,
    sample_chain_sharded_batched,
    sample_chains_sharded,
    svgd_step_sharded,
)
from .mesh import make_mesh, make_mesh_2d, replicated, shard_leading_axis  # noqa: F401

__all__ = [
    "gp_dopri5_solve_sharded",
    "make_mesh",
    "make_mesh_2d",
    "replicated",
    "run_svgd_sharded",
    "sample_chain_sharded_batched",
    "sample_chains_sharded",
    "shard_leading_axis",
    "svgd_step_sharded",
]
