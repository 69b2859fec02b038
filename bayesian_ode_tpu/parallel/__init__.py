"""Device-mesh parallelism (chain data-parallel + particle-parallel SVGD)."""
from .chains import (  # noqa: F401
    gp_dopri5_solve_sharded,
    run_svgd_sharded,
    sample_chain_sharded_batched,
    sample_chains_sharded,
    svgd_step_sharded,
)
from .mesh import make_mesh, make_mesh_2d, replicated, shard_leading_axis  # noqa: F401
from .smc import smc_sharded  # noqa: F401
from .tempering import run_parallel_tempering_sharded  # noqa: F401
from .runtime import (  # noqa: F401
    Runtime,
    coordinator_only,
    global_mesh,
    host_local_to_global,
    init_runtime,
    process_slice,
)

__all__ = [
    "Runtime",
    "coordinator_only",
    "global_mesh",
    "gp_dopri5_solve_sharded",
    "host_local_to_global",
    "init_runtime",
    "make_mesh",
    "make_mesh_2d",
    "process_slice",
    "replicated",
    "run_parallel_tempering_sharded",
    "run_svgd_sharded",
    "sample_chain_sharded_batched",
    "sample_chains_sharded",
    "shard_leading_axis",
    "smc_sharded",
    "svgd_step_sharded",
]
