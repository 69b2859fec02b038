"""Device mesh and sharding helpers.

The reference's only parallelism is `multiprocessing.Pool` per-config
processes and SLURM job arrays with zero inter-job communication
(SURVEY.md §2.9).  The TPU-native replacement: a named `jax.sharding.Mesh`
with a 'chain' axis for collective-free chain data-parallelism and a
'particle' axis for SVGD's all-pairs interactions (the one communicating
algorithm), with XLA collectives riding ICI.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "chain") -> Mesh:
    """1-D mesh over the first `n_devices` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def make_mesh_2d(n_chain: int, n_particle: int) -> Mesh:
    devs = np.asarray(jax.devices()[: n_chain * n_particle])
    return Mesh(devs.reshape(n_chain, n_particle), ("chain", "particle"))


def shard_leading_axis(tree, mesh: Mesh, axis: str = "chain"):
    """Place a pytree with device_put so every leaf's leading axis is
    sharded over `axis` and the rest replicated."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def replicated(tree, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )
