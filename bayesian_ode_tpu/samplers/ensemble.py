"""Affine-invariant ensemble sampler (Goodman & Weare 2010 stretch move).

Beyond the reference suite: the reference's only gradient-free kernel is
random-walk-free — every sampler it ships needs grad(U) (SURVEY.md
§2.2).  The stretch move needs only the potential, which makes it the
sampler of choice for posteriors where gradients are unavailable or
untrustworthy: event-terminated solves with non-differentiable event
counts, solver-tolerance-noisy likelihoods, black-box legacy RHS.  Its
affine invariance means NO preconditioning is ever needed — performance
on a condition-1e6 Gaussian equals performance on an isotropic one,
where plain MALA/RWM collapse without a hand-tuned metric.

The emcee algorithm maps perfectly onto the fused batch-potential
contract: the walker ensemble IS the batch.  Each step runs two
red/black half-sweeps — walkers in one half move by

    y_i = x_j + z (x_i - x_j),   z ~ g(z) propto 1/sqrt(z) on [1/a, a],
    accept with min(1, z^{d-1} exp(U(x_i) - U(y_i))),

where x_j is a uniformly drawn walker from the OTHER (frozen) half
(parallelizable variant of Foreman-Mackey et al. 2013 §3), so each
sweep is one fused potential evaluation over N/2 rows plus elementwise
masks — two potential calls per step regardless of ensemble size.

Use >= 2*d+2 walkers (more is better; the move degenerates when the
ensemble does not span the parameter space).  `stretch_move` is a
`TransitionKernel` over walker-major pytrees: run it with
`sample_chain`, shard the walker axis with parallel.sample_chain_*.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.pytree import PyTree
from .base import TransitionKernel
from .langevin import _tree_where_per_chain

__all__ = ["EnsembleState", "stretch_move"]


class EnsembleState(NamedTuple):
    position: PyTree          # walker-major pytree (N, ...)
    potential: jax.Array      # (N,) cached U(x)
    step: jax.Array


def _dim_per_walker(position: PyTree) -> int:
    return sum(int(np.prod(l.shape[1:])) for l in jax.tree.leaves(position))


def stretch_move(potential_batch: Callable, a: float = 2.0,
                 ) -> TransitionKernel:
    """Goodman-Weare stretch move over a walker ensemble.

    `potential_batch` follows the fused batch-potential contract (leaves
    with leading walker axis R -> (R,) potentials); NO gradients are
    taken.  `a > 1` is the stretch scale (2.0 is the universal default;
    smaller = timider moves, higher acceptance).  The ensemble size N
    (leading axis of the position passed to `init`) must be even.
    """
    if a <= 1.0:
        raise ValueError("stretch scale must satisfy a > 1")

    def init(position):
        n = jax.tree.leaves(position)[0].shape[0]
        if n % 2:
            raise ValueError("ensemble size must be even (red/black halves)")
        if n < 4:
            raise ValueError("need at least 4 walkers")
        u = potential_batch(position)
        return EnsembleState(position=position, potential=u,
                          step=jnp.asarray(0, jnp.int32))

    def half_sweep(key, movers, frozen, u_movers, d):
        """Stretch-update `movers` against the `frozen` half.  Returns
        (new positions, new potentials, accept mask)."""
        h = jax.tree.leaves(movers)[0].shape[0]
        k_pick, k_z, k_mh = jax.random.split(key, 3)
        j = jax.random.randint(k_pick, (h,), 0, h)
        partners = jax.tree.map(lambda l: jnp.take(l, j, axis=0), frozen)
        # inverse-cdf draw from g(z) propto 1/sqrt(z) on [1/a, a]
        u01 = jax.random.uniform(k_z, (h,), dtype=u_movers.dtype)
        z = ((a - 1.0) * u01 + 1.0) ** 2 / a
        prop = jax.tree.map(
            lambda xj, xi: xj + z.reshape((h,) + (1,) * (xi.ndim - 1))
            .astype(xi.dtype) * (xi - xj),
            partners, movers)
        u_prop = potential_batch(prop)
        log_alpha = (d - 1.0) * jnp.log(z) + u_movers - u_prop
        accept = jnp.isfinite(log_alpha) & (
            jnp.log(jax.random.uniform(k_mh, (h,))) < log_alpha)
        return (_tree_where_per_chain(accept, prop, movers),
                jnp.where(accept, u_prop, u_movers), accept)

    def step(key, state):
        n = jax.tree.leaves(state.position)[0].shape[0]
        h = n // 2
        d = _dim_per_walker(state.position)
        red = jax.tree.map(lambda l: l[:h], state.position)
        black = jax.tree.map(lambda l: l[h:], state.position)
        u_red, u_black = state.potential[:h], state.potential[h:]
        k1, k2 = jax.random.split(key)
        red, u_red, acc_r = half_sweep(k1, red, black, u_red, d)
        black, u_black, acc_b = half_sweep(k2, black, red, u_black, d)
        position = jax.tree.map(
            lambda r, b: jnp.concatenate([r, b], axis=0), red, black)
        potential = jnp.concatenate([u_red, u_black])
        new_state = EnsembleState(position=position, potential=potential,
                               step=state.step + 1)
        info = {"potential": potential,
                "accepted": jnp.concatenate([acc_r, acc_b])}
        return new_state, info

    return TransitionKernel(init, step)
