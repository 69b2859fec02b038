"""Sharded multi-chain sampling and multi-chip SVGD.

Chains are collective-free: `sample_chains_sharded` jits the vmapped chain
scan with the chain axis sharded over the mesh — XLA partitions the batch
with zero communication (the TPU replacement for the reference's
process-pool fan-out, gp.py:563-564).

SVGD is the one genuinely communicating algorithm (all-pairs kernel): the
sharded step keeps particles distributed over the 'particle' axis,
`all_gather`s positions and scores over ICI, and computes each device's
(n_local, n) kernel tile locally (SURVEY.md §2.9).  The median-heuristic
bandwidth is computed from the full gathered distance matrix, so sharded
and single-chip runs are numerically identical.
"""
from __future__ import annotations

import hashlib
from collections import OrderedDict
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..samplers import sample_chain, sample_chains
from ..samplers.base import TransitionKernel
from ..samplers.stein import pairwise_sq_dists
from .mesh import shard_leading_axis


def sample_chains_sharded(kernel: TransitionKernel, states, keys,
                          num_samples: int, mesh: Mesh, burn_in: int = 0,
                          thin: int = 1, axis: str = "chain"):
    """`samplers.sample_chains` with the chain axis sharded over `mesh`.

    states/keys must have a leading chain axis divisible by the mesh size.
    """
    states = shard_leading_axis(states, mesh, axis)
    keys = shard_leading_axis(keys, mesh, axis)

    fn = jax.jit(
        lambda s, k: sample_chains(kernel, s, k, num_samples, burn_in, thin)
    )
    return fn(states, keys)


def sample_chain_sharded_batched(kernel: TransitionKernel, position0, key,
                                 num_samples: int, mesh: Mesh,
                                 burn_in: int = 0, thin: int = 1,
                                 axis: str = "chain"):
    """Shard a *batched* kernel's chain axis over the mesh.

    For kernels built on fused batch potentials (`samplers.sgld_batched` /
    `psgld_batched` over `ops.gp_rk4` / `ops.mlp_rk4` potentials) the chain
    batch lives inside the state, so `sample_chains_sharded`'s vmap
    sharding doesn't apply.  Here each device runs the entire sampling
    scan — init included — on its local chain shard under `shard_map`:
    collective-free data parallelism where the Pallas trajectory kernels
    execute per-device on local shards (chains/chip ~10k at the measured
    single-chip rates; scaling is linear since no ICI traffic is needed).

    position0 leaves carry a leading chain axis divisible by the mesh
    axis size (and, for the Pallas potentials, each shard must be a
    multiple of 128).  Each device draws from an independent fold of
    `key`.  Returns (positions, potentials) with layouts
    (num_samples, C, ...) and (num_samples, C) — per-step scalar info
    (step sizes, accept flags) is device-local and dropped.
    """
    n_dev = mesh.shape[axis]
    keys = jax.random.split(key, n_dev)

    def local_run(pos_local, keys_local):
        state = kernel.init(pos_local)
        _, positions, infos = sample_chain(kernel, state, keys_local[0],
                                           num_samples, burn_in, thin)
        return positions, infos["potential"]

    run = jax.jit(
        jax.shard_map(
            local_run, mesh=mesh,
            in_specs=(jax.tree.map(lambda _: P(axis), position0), P(axis)),
            out_specs=(jax.tree.map(lambda _: P(None, axis), position0),
                       P(None, axis)),
            check_vma=False,
        )
    )
    position0 = shard_leading_axis(position0, mesh, axis)
    return run(position0, keys)


_SHARDED_SOLVE_CACHE: OrderedDict = OrderedDict()
_SHARDED_SOLVE_CACHE_MAX = 32


def _static_content_key(static) -> tuple:
    """Content hash of a GPVectorFieldStatic-like NamedTuple: array leaves
    by (dtype, shape, byte digest), scalars by value.  Rebuilding an
    identical `static` per call (the natural `make_static(...)` pattern)
    therefore hits the cache instead of silently re-tracing."""
    parts = []
    for leaf in static:
        if hasattr(leaf, "shape"):
            a = np.asarray(jax.device_get(leaf))
            parts.append(
                (str(a.dtype), a.shape,
                 hashlib.sha1(a.tobytes()).hexdigest())
            )
        else:
            parts.append(leaf)
    return (type(static).__name__, tuple(parts))


def _sharded_solve_fn(mesh: Mesh, axis: str, interpret: bool, static,
                      kwargs_items: tuple):
    """Build (or fetch) the jitted shard_map for one (mesh, config,
    static) combination.  `static` and the solve kwargs are baked into
    the traced program (the kernel needs them as Python constants), so
    the cache is keyed on the static object's CONTENT (arrays are tiny:
    M^2 <= 36 rows).  A/x0/ts remain traced arguments, so new values hit
    the jit cache.  LRU eviction keeps hot entries when the cache fills."""
    from ..ops.gp_dopri5 import gp_dopri5_solve_whole

    key = (mesh, axis, interpret, _static_content_key(static), kwargs_items)
    fn = _SHARDED_SOLVE_CACHE.get(key)
    if fn is not None:
        _SHARDED_SOLVE_CACHE.move_to_end(key)
        return fn
    solve_kwargs = dict(kwargs_items)

    def local_solve(A_local, x0, ts):
        ys, st = gp_dopri5_solve_whole(A_local, x0, ts, static,
                                       interpret=interpret, **solve_kwargs)
        # bool -> int so every stats leaf is a concatenation-friendly
        # per-shard array; reduced to a scalar by the caller
        st = dict(st, reached_final_time=st["reached_final_time"]
                  .astype(jnp.int32)[None])
        return ys, st

    fn = jax.jit(
        jax.shard_map(
            local_solve, mesh=mesh,
            in_specs=(P(axis), P(), P()),
            out_specs=(P(None, axis),
                       {"nfe": P(axis), "n_accepted": P(axis),
                        "n_rejected": P(axis),
                        "reached_final_time": P(axis)}),
            check_vma=False,
        )
    )
    while len(_SHARDED_SOLVE_CACHE) >= _SHARDED_SOLVE_CACHE_MAX:
        _SHARDED_SOLVE_CACHE.popitem(last=False)  # evict least-recent
    _SHARDED_SOLVE_CACHE[key] = fn
    return fn


def gp_dopri5_solve_sharded(A, x0, ts, static, mesh: Mesh,
                            axis: str = "chain", interpret: bool = False,
                            **solve_kwargs):
    """Shard the fused whole-solve dopri5 kernel's chain axis over the
    mesh (collective-free: each device integrates its local chain shard
    with `ops.gp_dopri5.gp_dopri5_solve_whole`, so solves/s scales
    linearly with devices at the measured single-chip rates).

    A (C, M, 2) with C divisible by the mesh axis size (each shard is
    padded to a tile multiple inside the kernel wrapper); x0/ts/static
    are replicated.  Returns (ys (T, C, N, 2), stats) with per-chain
    stats concatenated in mesh order and `reached_final_time` reduced
    over devices.  The jitted shard_map is cached per (mesh, config,
    static) — repeat calls with new A/x0/ts values are jit-cache hits.
    """
    run = _sharded_solve_fn(mesh, axis, interpret, static,
                            tuple(sorted(solve_kwargs.items())))
    A = jax.device_put(A, NamedSharding(mesh, P(axis)))
    ys, st = run(A, x0, ts)
    st["reached_final_time"] = jnp.all(st["reached_final_time"] > 0)
    return ys, st


def _local_svgd_phi(p_local, s_all, p_all, axis: str,
                    sigma: Optional[float],
                    median_subsample: Optional[int] = 256):
    """This device's rows of phi(X) from gathered positions/scores.

    Bandwidth comes from the GATHERED ensemble (tiled all_gather preserves
    the global particle order, so stein.rbf_bandwidth on p_all — including
    its first-k-rows median subsample — is bit-identical to the
    single-chip kernel's), computed redundantly per device: collective-free
    beyond the position/score gathers."""
    from ..samplers.stein import rbf_bandwidth

    n = p_all.shape[0]
    n_local = p_local.shape[0]
    d2_local = pairwise_sq_dists(p_local, p_all)        # (n_local, n)
    gamma = rbf_bandwidth(p_all, sigma, median_subsample)
    K_local = jnp.exp(-gamma * d2_local)
    ksum = jnp.sum(K_local, axis=1)
    grad_K = 2.0 * gamma * (p_local * ksum[:, None] - K_local @ p_all)
    return (K_local @ s_all + grad_K) / n


def run_svgd_sharded(potential_fn: Callable, particles, lr, num_steps: int,
                     mesh: Mesh, axis: str = "particle",
                     sigma: Optional[float] = None,
                     median_subsample: Optional[int] = 256):
    """Scan `num_steps` sharded SVGD updates in one jitted program.

    particles: (n, P) with n divisible by the mesh axis size.  Per step,
    each device computes local scores, all-gathers positions + scores over
    the `axis` (ICI), and applies its local rows of phi.
    `median_subsample` as in samplers.svgd (must match it for
    sharded == single-chip bit equality).
    """
    grad_fn = jax.grad(potential_fn)

    def local_run(p_local):
        def body(p_local, _):
            scores_local = -jax.vmap(grad_fn)(p_local)
            p_all = jax.lax.all_gather(p_local, axis, tiled=True)
            s_all = jax.lax.all_gather(scores_local, axis, tiled=True)
            phi = _local_svgd_phi(p_local, s_all, p_all, axis, sigma,
                                  median_subsample)
            return p_local + lr * phi, None

        p_local, _ = jax.lax.scan(body, p_local, None, length=num_steps)
        return p_local

    shard = NamedSharding(mesh, P(axis, None))
    particles = jax.device_put(particles, shard)
    run = jax.jit(
        jax.shard_map(
            local_run, mesh=mesh, in_specs=P(axis, None),
            out_specs=P(axis, None),
        )
    )
    return run(particles)


def svgd_step_sharded(potential_fn: Callable, particles, lr, mesh: Mesh,
                      axis: str = "particle",
                      sigma: Optional[float] = None):
    """One sharded SVGD update (see run_svgd_sharded)."""
    return run_svgd_sharded(potential_fn, particles, lr, 1, mesh, axis, sigma)
