"""Replica-exchange MCMC (parallel tempering) over the batch axis.

Beyond the reference suite: its multimodal 2-D toys (four_mixture,
gaussian_grid — reference scripts/toy/toy_plots.py:14-123) are sampled
there with single-temperature kernels that cannot cross between
well-separated modes; the reference has no tempering machinery at all.
Here a temperature ladder IS a batch axis: K replicas of every chain run
the framework's existing fused-batch kernels on the tempered potential
beta_k * U, and the exchange move is an elementwise compare+where between
adjacent rows — exactly the shape TPUs want (no host round-trips, no
per-replica processes; the reference's closest analogue, one process per
config via Pool/SLURM arrays, cannot exchange states at all).

Design: the inner sampler runs on row-major replicas (row = k*C + c for
K temperatures x C chains) through the standard fused batch-potential
contract, so one fused forward+backward per step covers every replica of
every chain.  Each replica k uses step size `lr / beta_k` (MALA, via the
diagonal-metric form of `mala_batched`) or `eps / sqrt(beta_k)` (HMC) —
hot, flat targets take proportionally bigger moves.  Swaps follow the
deterministic even/odd (DEO) pairing: round r pairs (i, i+1) for
i = r mod 2, accepted with probability
min(1, exp((beta_i - beta_j) (U_i - U_j))) on the UNIT-temperature
potentials; an accepted swap exchanges positions and rescales the cached
tempered potential/gradient by beta_i/beta_j (both are linear in beta,
so no re-evaluation is needed).  Only the cold (beta=1) replica is
recorded as `state.position` — it is the exact target-distribution
chain; hot replicas are scaffolding.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.pytree import PyTree
from .base import TransitionKernel
from .hamiltonian import hmc_batched
from .langevin import mala_batched

__all__ = ["parallel_tempering", "parallel_tempering_batched",
           "temperature_ladder"]


def temperature_ladder(num_replicas: int, beta_min: float) -> jax.Array:
    """Geometric inverse-temperature ladder 1 = beta_0 > ... > beta_min.

    Geometric spacing equalizes the expected swap acceptance between
    adjacent pairs when the potential scales roughly linearly in beta
    (the standard default ladder).
    """
    if num_replicas < 2:
        raise ValueError("need at least 2 replicas")
    return jnp.asarray(
        np.geomspace(1.0, beta_min, num_replicas), jnp.float32)


class PTState(NamedTuple):
    position: PyTree   # cold replica's position (the target chain)
    inner: Any         # inner batched kernel state over K*C replica rows
    step: jax.Array


def _check_betas(betas) -> np.ndarray:
    b = np.asarray(betas, np.float64)
    if b.ndim != 1 or b.size < 2:
        raise ValueError("betas must be a 1-D ladder with >= 2 entries")
    if abs(b[0] - 1.0) > 1e-6:
        raise ValueError("betas[0] must be 1.0 (the cold, target chain)")
    if np.any(b <= 0) or np.any(np.diff(b) >= 0):
        raise ValueError("betas must be positive and strictly decreasing")
    return b


def _make_pt(potential_rows: Callable, betas_np: np.ndarray,
             step_size: float, inner: str, swap_every: int,
             num_leapfrog: int, chain_axis: bool):
    """Core PT kernel over row-major replicas.

    `potential_rows((K*C, ...) leaves) -> (K*C,)` unit-temperature
    potentials; `chain_axis` says whether user positions carry a leading
    C axis (fused batch engine) or none (per-chain engine, C=1
    internally).
    """
    K = int(betas_np.size)
    betas = jnp.asarray(betas_np, jnp.float32)

    def rows_of(position):
        """Stack the user position to K*C replica rows (all replicas
        start at the same point; burn-in separates them)."""
        def one(leaf):
            lead = leaf.shape[0] if chain_axis else 1
            body = leaf.shape[1:] if chain_axis else leaf.shape
            return jnp.broadcast_to(leaf.reshape((1, lead) + body),
                                    (K, lead) + body
                                    ).reshape((K * lead,) + body)
        return jax.tree.map(one, position)

    def beta_rows_for(u_rows):
        C = u_rows.shape[0] // K
        return jnp.repeat(betas.astype(u_rows.dtype), C)

    def pot_tempered(x_rows):
        u = potential_rows(x_rows)
        return beta_rows_for(u) * u

    if inner not in ("mala", "hmc"):
        raise ValueError(f"unknown inner move '{inner}'"
                         " (supported: 'mala', 'hmc')")

    def build_inner(position_rows):
        if inner == "mala":
            # per-replica step lr/beta_k via mala_batched's diagonal
            # metric: proposal p - lr*G*g - sqrt(2*lr*G)*xi with
            # G_k = 1/beta_k (G enters the MH ratio, so exactness per
            # replica is kept).
            return mala_batched(pot_tempered, step_size,
                                precond=precond_like_rows(position_rows))
        C = jax.tree.leaves(position_rows)[0].shape[0] // K
        eps_rows = jnp.repeat(step_size / jnp.sqrt(betas), C)
        return hmc_batched(pot_tempered, lambda step: eps_rows,
                           num_leapfrog=num_leapfrog, jitter=0.2)

    def precond_like_rows(position_rows):
        def one(leaf):
            lead = leaf.shape[0] // K
            g = jnp.repeat(1.0 / betas, lead).astype(leaf.dtype)
            return g.reshape((K * lead,) + (1,) * (leaf.ndim - 1))
        return jax.tree.map(one, position_rows)

    def split_kc(leaf):
        return leaf.reshape((K, leaf.shape[0] // K) + leaf.shape[1:])

    def cold_of(inner_state):
        def one(leaf):
            cold = split_kc(leaf)[0]
            return cold if chain_axis else cold[0]
        return jax.tree.map(one, inner_state.position)

    def init(position):
        pos_rows = rows_of(position)
        kern = build_inner(pos_rows)
        s = kern.init(pos_rows)
        return PTState(cold_of(s), s, jnp.asarray(0, jnp.int32))

    def step(key, state):
        kern = build_inner(state.inner.position)
        k_move, k_swap = jax.random.split(key)
        s, info = kern.step(k_move, state.inner)

        # --- deterministic even/odd exchange round ----------------------
        round_idx = (state.step + 1) // swap_every
        do_swap = ((state.step + 1) % swap_every) == 0
        parity = round_idx % 2

        u_t = split_kc(s.potential)                 # (K, C) tempered
        C = u_t.shape[1]
        bcol = betas[:, None].astype(u_t.dtype)
        u = u_t / bcol                              # unit-temperature

        idx = jnp.arange(K)
        cand = jnp.where((idx - parity) % 2 == 0, idx + 1, idx - 1)
        partner = jnp.where((cand >= 0) & (cand < K) & (idx >= parity),
                            cand, idx)
        log_a = (bcol - bcol[partner]) * (u - u[partner])   # (K, C)
        lo = jnp.minimum(idx, partner)
        usw = jax.random.uniform(k_swap, (K, C), u.dtype)[lo]
        acc = do_swap & (partner != idx)[:, None] & \
            jnp.isfinite(log_a) & (jnp.log(usw) < log_a)    # (K, C)

        scale = bcol / bcol[partner]                        # (K, 1)
        u_t_new = jnp.where(acc, scale * u_t[partner], u_t)

        def swap_leaf(leaf, rescale):
            x = split_kc(leaf)
            a = acc.reshape(acc.shape + (1,) * (x.ndim - 2))
            src = x[partner]
            if rescale:
                sc = scale.reshape(scale.shape + (1,) * (x.ndim - 2))
                src = sc.astype(x.dtype) * src
            return jnp.where(a, src, x).reshape(leaf.shape)

        s = s._replace(
            position=jax.tree.map(lambda l: swap_leaf(l, False),
                                  s.position),
            potential=u_t_new.reshape(s.potential.shape),
            grad=jax.tree.map(lambda l: swap_leaf(l, True), s.grad),
        )

        cold_u = u_t_new[0]
        cold_acc = split_kc(info["accepted"])[0]
        swap_rate = jnp.sum(acc, axis=0).astype(u.dtype) / \
            jnp.maximum(jnp.sum((partner != idx)), 1).astype(u.dtype)
        if not chain_axis:
            cold_u, cold_acc, swap_rate = (cold_u[0], cold_acc[0],
                                           swap_rate[0])
        new_info = {"potential": cold_u, "accepted": cold_acc,
                    "swap_accepted": swap_rate,
                    "step_size": info["step_size"]}
        return (PTState(cold_of(s), s, state.step + 1), new_info)

    return TransitionKernel(init, step)


def parallel_tempering(potential_fn: Callable, betas, step_size: float,
                       inner: str = "mala", swap_every: int = 1,
                       num_leapfrog: int = 10) -> TransitionKernel:
    """Replica exchange over a per-chain potential.

    `betas`: inverse-temperature ladder, `betas[0] == 1` (see
    `temperature_ladder`).  The kernel's position is the COLD chain; the
    K replicas live inside the state and are vmapped across user chains
    by `sample_chains` like any other per-chain kernel.  `inner` is the
    per-replica move: "mala" (step lr/beta_k, exact) or "hmc"
    (eps/sqrt(beta_k), jittered leapfrog, exact).  Swaps run every
    `swap_every` steps with alternating even/odd pairings.
    """
    betas_np = _check_betas(betas)
    return _make_pt(jax.vmap(potential_fn), betas_np, step_size, inner,
                    swap_every, num_leapfrog, chain_axis=False)


def parallel_tempering_batched(potential_batch: Callable, betas,
                               step_size: float, inner: str = "mala",
                               swap_every: int = 1,
                               num_leapfrog: int = 10
                               ) -> TransitionKernel:
    """Replica exchange over the fused batch-potential contract: the
    K-replica ladder multiplies the chain batch (rows = K*C), so ONE
    fused forward+backward per step covers every replica of every chain
    and the exchange move is elementwise between adjacent row blocks.
    The recorded position/`info` refer to the cold (C, ...) batch."""
    betas_np = _check_betas(betas)
    return _make_pt(potential_batch, betas_np, step_size, inner,
                    swap_every, num_leapfrog, chain_axis=True)
