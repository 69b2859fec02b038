"""Mesh-sharded replica-exchange MCMC: one temperature per device.

Companion to `samplers/tempering.py` (in-chip PT over the batch axis)
for the regime where each replica's chain batch fills a chip: the
temperature ladder becomes a MESH AXIS, every device runs the tempered
move for its own beta on its local chains, and the exchange round is a
neighbor `ppermute` over ICI — the canonical nearest-neighbor collective
pattern (reference analogue: none; its multi-process fan-out has zero
inter-job communication, SURVEY.md §2.9).

Swap correctness across devices without a coordinator:
- replica state is stored at UNIT temperature (x, U(x), grad U(x)), so an
  accepted swap just adopts the partner's triple — nothing to rescale and
  no re-evaluation;
- the even/odd pairing alternates per round; `lax.ppermute` needs static
  permutations, so both pairings are traced and `lax.cond` picks one;
- both members of a pair must draw the SAME accept uniform: each derives
  it from `fold_in(key, round), fold_in(, lower replica index)` — no
  communication beyond the state exchange itself.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..samplers.base import batch_value_and_grad
from ..samplers.tempering import _check_betas

__all__ = ["run_parallel_tempering_sharded"]


def _pairings(K: int):
    """Static ppermute permutations for the two DEO parities.

    Each entry (src, dst); unpaired edge replicas send to themselves so
    ppermute does not zero their buffers."""
    def perm(parity):
        out = []
        for i in range(K):
            j = i + 1 if (i - parity) % 2 == 0 and i >= parity else i - 1
            if j < parity or j < 0 or j >= K or i < parity:
                j = i
            out.append((i, j))
        return out

    return perm(0), perm(1)


def run_parallel_tempering_sharded(
        potential_fn: Callable, betas, step_size: float, x0, key,
        num_samples: int, burn_in: int = 0, mesh: Optional[Mesh] = None,
        axis: str = "replica", swap_every: int = 1):
    """Run replica-exchange MALA with one temperature per mesh device.

    `betas`: ladder with exactly `mesh.shape[axis]` entries, betas[0]=1.
    `x0`: (C, ...) pytree of per-chain positions (every replica starts
    there).  Returns (cold_positions (num_samples, C, ...),
    info dict with per-step cold acceptance and swap acceptance).
    The tempered MALA move uses step lr/beta_k per replica, like the
    in-chip `samplers.parallel_tempering`.
    """
    if mesh is None:
        devs = jax.devices()
        mesh = Mesh(np.array(devs), (axis,))
    K = int(mesh.shape[axis])
    betas_np = _check_betas(betas)
    if betas_np.size != K:
        raise ValueError(f"len(betas)={betas_np.size} must equal the "
                         f"'{axis}' mesh axis size {K}")
    betas_arr = jnp.asarray(betas_np, jnp.float32)
    perm_even, perm_odd = _pairings(K)
    vag = batch_value_and_grad(jax.vmap(potential_fn))
    lr = float(step_size)

    def local_run(x_rep, key):
        # x_rep: (1, C, ...) local shard of the replica axis
        x = jax.tree.map(lambda l: l[0], x_rep)
        me = jax.lax.axis_index(axis)
        beta = betas_arr[me]
        lr_eff = lr / beta
        u, g = vag(x)                         # unit-temperature
        C = u.shape[0]
        key = jax.random.fold_in(key, 0)

        def sumsq(tree):
            return sum(jax.tree.leaves(jax.tree.map(
                lambda l: jnp.sum(l * l, axis=tuple(range(1, l.ndim))),
                tree)))

        def bc(s, leaf):
            return s.reshape(s.shape + (1,) * (leaf.ndim - s.ndim))

        def move(k, x, u, g):
            k_n, k_mh = jax.random.split(k)
            leaves, treedef = jax.tree.flatten(x)
            nkeys = jax.random.split(k_n, len(leaves))
            noise = jax.tree.unflatten(treedef, [
                jax.random.normal(kk, l.shape, l.dtype)
                for kk, l in zip(nkeys, leaves)])
            prop = jax.tree.map(
                lambda p, g_, n: p - lr_eff * beta * g_
                + jnp.sqrt(2.0 * lr_eff) * n, x, g, noise)
            u2, g2 = vag(prop)
            log_a = beta * (u - u2)
            rev = jax.tree.map(lambda a, b, g_: a - b + lr_eff * beta * g_,
                               x, prop, g2)
            log_a += -1.0 / (4 * lr_eff) * sumsq(rev)
            fwd = jax.tree.map(lambda a, b, g_: a - b + lr_eff * beta * g_,
                               prop, x, g)
            log_a -= -1.0 / (4 * lr_eff) * sumsq(fwd)
            acc = jnp.isfinite(log_a) & (
                jnp.log(jax.random.uniform(k_mh, (C,))) < log_a)
            x = jax.tree.map(lambda a, b: jnp.where(bc(acc, a), a, b),
                             prop, x)
            return x, jnp.where(acc, u2, u), jax.tree.map(
                lambda a, b: jnp.where(bc(acc, a), a, b), g2, g), acc

        def swap(k_round, rnd, do, x, u, g):
            parity = rnd % 2

            def ex(tree, pe_flag):
                pp = perm_even if pe_flag else perm_odd
                return jax.tree.map(
                    lambda l: jax.lax.ppermute(l, axis, pp), tree)

            x_p, u_p, g_p = jax.lax.cond(
                parity == 0,
                lambda args: ex(args, True),
                lambda args: ex(args, False),
                (x, u, g))
            cand = jnp.where((me - parity) % 2 == 0, me + 1, me - 1)
            partner = jnp.where((cand >= parity) & (cand < K)
                                & (me >= parity), cand, me)
            beta_p = betas_arr[partner]
            log_a = (beta - beta_p) * (u - u_p)
            lo = jnp.minimum(me, partner)
            k_pair = jax.random.fold_in(k_round, lo)
            usw = jax.random.uniform(k_pair, (C,))
            acc = do & (partner != me) & jnp.isfinite(log_a) & \
                (jnp.log(usw) < log_a)
            x = jax.tree.map(lambda a, b: jnp.where(bc(acc, a), a, b),
                             x_p, x)
            u = jnp.where(acc, u_p, u)
            g = jax.tree.map(lambda a, b: jnp.where(bc(acc, a), a, b),
                             g_p, g)
            return x, u, g, acc

        def body(carry, step_idx):
            x, u, g = carry
            k_step = jax.random.fold_in(key, step_idx)
            k_move = jax.random.fold_in(jax.random.fold_in(k_step, 1), me)
            x, u, g, acc_m = move(k_move, x, u, g)
            rnd = (step_idx + 1) // swap_every
            do = ((step_idx + 1) % swap_every) == 0
            k_round = jax.random.fold_in(jax.random.fold_in(key, 2), rnd)
            x, u, g, acc_s = swap(k_round, rnd, do, x, u, g)
            return (x, u, g), (x, u, acc_m, acc_s)

        (x, u, g), (xs, us, acc_m, acc_s) = jax.lax.scan(
            body, (x, u, g), jnp.arange(burn_in + num_samples))
        keep = lambda t: jax.tree.map(lambda l: l[burn_in:], t)
        # re-attach the (length-1) local replica axis for out_specs
        add_axis = lambda t: jax.tree.map(lambda l: l[None], t)
        return (add_axis(keep(xs)), add_axis(keep(us)),
                add_axis(keep(acc_m)), add_axis(keep(acc_s)))

    x_rep = jax.tree.map(
        lambda l: jax.device_put(
            jnp.broadcast_to(l[None], (K,) + l.shape),
            NamedSharding(mesh, P(axis))),
        x0)

    run = jax.jit(jax.shard_map(
        local_run, mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=(P(axis), P(axis), P(axis), P(axis)),
    ))
    xs, us, acc_m, acc_s = run(x_rep, key)
    cold = jax.tree.map(lambda l: l[0], xs)
    info = {
        "potential": us[0],
        "accepted": acc_m[0],
        "swap_accepted": jnp.mean(
            acc_s.astype(jnp.float32), axis=0),
    }
    return cold, info
