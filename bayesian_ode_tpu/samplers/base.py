"""Sampler kernel protocol and chain runners.

TPU-first redesign of the reference's sampler architecture: where the
reference subclasses `torch.optim.Optimizer` and mutates `param_groups` in
place one chain per process (samplers/sampler.py:9-21, §2.9 of SURVEY.md),
here every sampler is a pure transition kernel

    kernel.init(position)                  -> state
    kernel.step(key, state)                -> (state, info)

over pytree positions, built from a `potential_fn(theta) -> U` where
U = -log posterior (the reference's closure loss).  Chains run under
`lax.scan` and batch under `vmap`, so thousands of chains execute per chip
and the chain axis shards over a device mesh (see parallel/chains.py).

Info dicts carry per-step observability (potential, acceptance, step size) —
replacing the reference's print statements and `arr_closure` callbacks
(langevin.py:124-127, gp.py:355-357).
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..utils.pytree import PyTree


class TransitionKernel(NamedTuple):
    init: Callable[[PyTree], Any]
    step: Callable[[jax.Array, Any], tuple]


def sample_chain(kernel: TransitionKernel, state, key, num_samples: int,
                 burn_in: int = 0, thin: int = 1):
    """Run burn-in then collect `num_samples` states, keeping every
    `thin`-th step's position (thinning semantics of gp.py:381).

    Returns (final_state, positions, infos) where positions stacks
    state.position over samples and infos stacks the info pytree.
    """

    def one_step(state, key):
        state, info = kernel.step(key, state)
        return state, info

    if burn_in > 0:
        def burn_body(state, key):
            state, _ = kernel.step(key, state)
            return state, None

        key, sub = jax.random.split(key)
        state, _ = jax.lax.scan(burn_body, state, jax.random.split(sub, burn_in))

    def sample_body(state, key):
        if thin == 1:
            state, info = one_step(state, key)
        else:
            state, infos = jax.lax.scan(one_step, state, jax.random.split(key, thin))
            info = jax.tree.map(lambda x: x[-1], infos)
        return state, (state.position, info)

    state, (positions, infos) = jax.lax.scan(
        sample_body, state, jax.random.split(key, num_samples)
    )
    return state, positions, infos


def sample_chains(kernel: TransitionKernel, states, keys, num_samples: int,
                  burn_in: int = 0, thin: int = 1):
    """vmap of `sample_chain` over a leading chain axis of states/keys.

    This replaces the reference's `multiprocessing.Pool.starmap` chain
    fan-out (gp.py:563-564) with in-chip data parallelism; shard the chain
    axis over a mesh for multi-chip scaling.
    """
    return jax.vmap(
        lambda s, k: sample_chain(kernel, s, k, num_samples, burn_in, thin)
    )(states, keys)


def init_chains(kernel: TransitionKernel, key, init_position: PyTree,
                num_chains: int, jitter: float = 0.0):
    """Batched kernel states from a template position, optionally jittered
    with N(0, jitter^2) per chain for overdispersed starts."""
    keys = jax.random.split(key, num_chains)

    def one(k):
        if jitter > 0.0:
            leaves, treedef = jax.tree.flatten(init_position)
            subkeys = jax.random.split(k, len(leaves))
            pos = jax.tree.unflatten(
                treedef,
                [
                    x + jitter * jax.random.normal(sk, x.shape, x.dtype)
                    for sk, x in zip(subkeys, leaves)
                ],
            )
        else:
            pos = init_position
        return kernel.init(pos)

    return jax.vmap(one)(keys)


def potential_and_grad(potential_fn: Callable):
    return jax.value_and_grad(potential_fn)


def batch_value_and_grad(potential_batch: Callable):
    """Value-and-grad for the fused batch-potential contract.

    `potential_batch(params)` maps leaves with a leading chain axis C to a
    (C,) vector of potentials (e.g. ops.gp_rk4.make_fused_gp_potential,
    whose Pallas kernels need the whole batch in one call).  Returns
    `vag(position) -> ((C,) potentials, grads)` computed in ONE fused
    forward+backward pass — summing the potentials makes the batch grad
    exactly the stack of per-chain grads, since chains are independent.
    """

    def vag(position):
        def f(p):
            pots = potential_batch(p)
            return jnp.sum(pots), pots

        (_, pots), grads = jax.value_and_grad(f, has_aux=True)(position)
        return pots, grads

    return vag


def langevin_noise_scale(lr):
    """Effective Langevin noise std sqrt(2*lr).

    The reference draws Normal(0, 1/sqrt(0.5*lr)) and multiplies by lr
    (langevin.py:193-199), i.e. std lr/sqrt(lr/2) = sqrt(2*lr); here the
    noise is drawn standard and scaled once.
    """
    return jnp.sqrt(2.0 * lr)


def guard_finite(kernel: TransitionKernel) -> TransitionKernel:
    """Freeze a chain on its last finite state instead of propagating NaNs.

    The reference raises ValueError the moment a sampler step produces a
    non-finite parameter (langevin.py:184-192, 467-469, 946-948;
    hamiltonian.py:50-51) and aborts the process.  Under jit we cannot
    raise, and with 10^4 vmapped chains one divergent chain must not kill
    the other 9,999 — so the TPU-native sanitizer commits the wrapped
    kernel's new state only when every float leaf is finite, and reports
    per-step `info["finite"]`.  A rejected chain retries from its last
    fully-finite state with fresh noise on the next step, so transient
    excursions recover on their own; a persistently divergent chain
    effectively freezes, and downstream diagnostics can drop it by masking
    on `info["finite"]`.
    """

    def init(position):
        return kernel.init(position)

    def step(key, state):
        new_state, info = kernel.step(key, state)
        flags = [jnp.all(jnp.isfinite(leaf))
                 for leaf in jax.tree.leaves(new_state)
                 if jnp.issubdtype(leaf.dtype, jnp.floating)]
        finite = jnp.stack(flags).all() if flags else jnp.asarray(True)
        out_state = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old), new_state, state
        )
        info = dict(info)
        info["finite"] = finite
        return out_state, info

    return TransitionKernel(init, step)


def guard_finite_batched(kernel: TransitionKernel,
                         n_chains: Optional[int] = None) -> TransitionKernel:
    """Per-chain `guard_finite` for BATCHED kernels (fused batch-potential
    contract: one state whose float leaves carry a leading chain axis C).

    `guard_finite` reduces finiteness over the whole state, which is
    correct per vmap lane for per-chain kernels but would freeze ALL C
    chains of a batched kernel the moment one diverges.  Here each chain
    is masked independently: a chain's new state commits only if every
    one of ITS float entries is finite (float leaves without the leading
    chain axis — none in the shipped batched states — gate globally).
    `info["finite"]` is the (C,) per-chain mask.

    C comes from the POSITION pytree at `init` (chain-major by the batch
    contract), or from an explicit `n_chains` — not from state leaf
    order, where a future chain-count-sized auxiliary leaf ahead of the
    positions could silently re-anchor the mask to the wrong axis.  Only
    if `step` runs on a state whose `init` this wrapper never saw (e.g.
    a restored checkpoint) does it fall back to first-leading-axis
    inference.
    """
    c_ref = [n_chains]

    def init(position):
        if c_ref[0] is None:
            c_ref[0] = int(jax.tree.leaves(position)[0].shape[0])
        return kernel.init(position)

    def step(key, state):
        new_state, info = kernel.step(key, state)
        float_leaves = [l for l in jax.tree.leaves(new_state)
                        if jnp.issubdtype(l.dtype, jnp.floating)]
        # scalar float leaves (e.g. an adapted temperature) gate globally
        # and must not drive the fallback inference
        C = c_ref[0] if c_ref[0] is not None else next(
            (l.shape[0] for l in float_leaves if l.ndim >= 1), 1)

        def leaf_finite(leaf):
            if leaf.ndim >= 1 and leaf.shape[0] == C:
                return jnp.all(
                    jnp.isfinite(leaf).reshape(C, -1), axis=1
                )                                            # (C,)
            return jnp.broadcast_to(jnp.all(jnp.isfinite(leaf)), (C,))

        finite = jnp.ones((C,), bool)
        for leaf in float_leaves:
            finite = finite & leaf_finite(leaf)

        def commit(new, old):
            if (jnp.issubdtype(new.dtype, jnp.floating)
                    and new.ndim >= 1 and new.shape[0] == C):
                mask = finite.reshape((C,) + (1,) * (new.ndim - 1))
                return jnp.where(mask, new, old)
            if jnp.issubdtype(new.dtype, jnp.floating):
                return jnp.where(jnp.all(finite), new, old)
            return new                                  # step counters etc.

        out_state = jax.tree.map(commit, new_state, state)
        info = dict(info)
        info["finite"] = finite
        return out_state, info

    return TransitionKernel(init, step)
