"""Sharded Sequential Monte Carlo: particles distributed over the mesh.

SMC is the one many-particle algorithm with real cross-device structure
(SURVEY.md §2.9): likelihood/prior/gradient evaluations and the MALA
rejuvenation sweeps are embarrassingly parallel over particles, while
the stage decisions (ESS-bisection temperature choice, log Z increments)
and systematic resampling are GLOBAL operations.  `smc_sharded` keeps
the particle population sharded over a mesh axis and runs
`samplers.smc(..., axis_name=...)` under `jax.shard_map`:

  - the (N,) log-lik vector is `all_gather`ed per stage (tiny — scalars
    per particle ride ICI), so every device computes the identical next
    beta, conditional ESS, and log Z increment;
  - distributed systematic resampling: the global index vector is
    computed on the gathered weights, each device `all_gather`s the
    particle leaves once and takes its own slice of the indices;
  - every per-particle random draw inside `samplers.smc` is keyed by
    the particle's GLOBAL index, so the sharded run reproduces the
    single-device run's ladder, log Z, and final particles exactly
    (bit-for-bit for row-independent batch potentials).
"""
from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, PartitionSpec as P

from ..samplers.smc import SMCResult, smc
from ..utils.pytree import PyTree
from .mesh import shard_leading_axis

__all__ = ["smc_sharded"]


def smc_sharded(key: jax.Array,
                log_lik_batch: Callable[[PyTree], jax.Array],
                log_prior_batch: Callable[[PyTree], jax.Array],
                prior_particles: PyTree,
                mesh: Mesh,
                axis: str = "particle",
                **smc_kwargs) -> SMCResult:
    """`samplers.smc` with the particle axis sharded over `mesh`.

    `prior_particles` leaves carry a leading particle axis divisible by
    the mesh axis size.  `smc_kwargs` are forwarded to `samplers.smc`
    (num_moves, target_ess, step_scale, target_accept, adapt_rate,
    max_stages).  Returns the same `SMCResult` as the single-device call
    — `particles`/`log_lik` sharded over `axis`, scalars and stage
    diagnostics replicated.
    """
    n_dev = mesh.shape[axis]
    n = jax.tree.leaves(prior_particles)[0].shape[0]
    if n % n_dev:
        raise ValueError(
            f"particle count {n} must be divisible by the mesh axis "
            f"size {n_dev}")

    part_spec = jax.tree.map(lambda _: P(axis), prior_particles)

    def local_run(particles_local):
        return smc(key, log_lik_batch, log_prior_batch, particles_local,
                   axis_name=axis, **smc_kwargs)

    out_specs = SMCResult(
        particles=part_spec,
        log_z=P(), num_stages=P(), betas=P(), ess=P(),
        accept_rate=P(), step_sizes=P(), log_lik=P(axis),
    )
    run = jax.jit(
        jax.shard_map(local_run, mesh=mesh, in_specs=(part_spec,),
                      out_specs=out_specs, check_vma=False)
    )
    return run(shard_leading_axis(prior_particles, mesh, axis))
