"""No-U-Turn sampler (NUTS): multinomial HMC with dynamic trajectories.

Beyond the reference suite — its exact kernels stop at MALA/MMALA and the
stochastic-gradient aSGHMC family (reference samplers/hamiltonian.py:11-164,
langevin.py:13-149); plain HMC was added in `hamiltonian.py`, and this
module adds the self-tuning trajectory-length capstone.  Algorithm:
multinomial NUTS with biased progressive sampling (Hoffman & Gelman 2014;
Betancourt 2017, arXiv:1701.02434 §A.4) — each transition doubles a
leapfrog trajectory in a random direction until a sub-trajectory U-turns
or diverges, and samples a point from the trajectory with weights
exp(-(H - H0)) (so it is exact: zero step-size bias beyond what the
weights correct, no explicit accept/reject needed).

TPU-first formulation: the textbook algorithm is recursive with
data-dependent trajectory lengths — neither survives XLA.  Here tree
building is ITERATIVE with fixed-shape state (the trick used by modern
JAX PPL implementations, e.g. Phan & Pradhan's iterative NUTS): the
doubling loop is a bounded `lax.while_loop` over tree depth, each subtree
is a second bounded while-loop of single leapfrog steps, and the
recursive sub-U-turn checks are replaced by a `max_depth`-slot checkpoint
buffer of (momentum, running-momentum-sum) pairs indexed by the bit
pattern of the leaf counter — every balanced subtree interval [s, n] is
tested via rho[s..n] = rho[0..n] - rho[0..s] + p_s when its last leaf n
is added.  Positions/momenta are flattened to (..., D) vectors so the
checkpoint buffers and U-turn contractions are plain 2-D array ops.

Both engines of the framework's sampler contract are provided:
`nuts`/`adaptive_nuts` over per-chain potentials (vmap across chains with
`sample_chains` — every masked update is branch-free, so vmap's
run-until-all-done while-loop batching is correct), and
`nuts_batched`/`adaptive_nuts_batched` over the fused batch-potential
contract (one fused forward+backward per leapfrog step for the WHOLE
batch; chains whose trees finished early are frozen by per-chain masks
while the rest keep building).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.pytree import PyTree
from . import schedules
from .base import TransitionKernel, batch_value_and_grad
from .hamiltonian import (
    AdaptiveHMCState,
    HMCState,
    _adaptive_init,
    _warmup_advance,
)

__all__ = ["nuts", "nuts_batched", "adaptive_nuts", "adaptive_nuts_batched"]


def _flatteners(position: PyTree, per_chain: bool):
    """(flatten, unflatten) closing over `position`'s structure.

    Flatten concatenates every leaf (minus the leading chain axis in
    batched mode) into one (..., D) vector of the promoted float dtype;
    unflatten restores shapes and dtypes.  Built at trace time from the
    current position, so it works under vmap and jit alike.
    """
    leaves, treedef = jax.tree.flatten(position)
    lead = 1 if per_chain else 0
    shapes = [l.shape[lead:] for l in leaves]
    sizes = [int(np.prod(s)) for s in shapes]
    dtype = jnp.result_type(*[l.dtype for l in leaves])

    def flat(tree):
        ls = jax.tree.flatten(tree)[0]
        if per_chain:
            return jnp.concatenate(
                [l.reshape(l.shape[0], -1).astype(dtype) for l in ls], -1)
        return jnp.concatenate(
            [l.reshape(-1).astype(dtype) for l in ls], -1)

    def unflat(x):
        out, off = [], 0
        for leaf, shp, sz in zip(leaves, shapes, sizes):
            seg = x[..., off:off + sz]
            out.append(seg.reshape(x.shape[:-1] + shp).astype(leaf.dtype))
            off += sz
        return jax.tree.unflatten(treedef, out)

    return flat, unflat


def _popcount(n: jax.Array, nbits: int) -> jax.Array:
    """Number of set bits of a non-negative int32 array (unrolled)."""
    c = jnp.zeros_like(n)
    for b in range(nbits):
        c = c + ((n >> b) & 1)
    return c


def _trailing_ones(n: jax.Array, nbits: int) -> jax.Array:
    """Number of contiguous low-order 1-bits (e.g. 0b0111 -> 3)."""
    t = jnp.zeros_like(n)
    still = jnp.ones(n.shape, bool)
    for b in range(nbits):
        still = still & (((n >> b) & 1) == 1)
        t = t + still.astype(n.dtype)
    return t


class _SubCarry(NamedTuple):
    key: jax.Array
    i: jax.Array        # leaves built so far (0-based counter), B int32
    q_e: jax.Array      # build endpoint position, B+(D,)
    p_e: jax.Array
    g_e: jax.Array
    sub_lw: jax.Array   # logsumexp of leaf weights, B
    pq: jax.Array       # subtree proposal (progressive multinomial)
    pu: jax.Array
    pg: jax.Array
    rho: jax.Array      # momentum sum over subtree leaves, B+(D,)
    ck_p: jax.Array     # momentum checkpoints, B+(ND, D)
    ck_rho: jax.Array   # running-rho checkpoints, B+(ND, D)
    turning: jax.Array  # B bool
    diverging: jax.Array
    sum_a: jax.Array    # accept-stat accumulator (Stan's alpha), B
    n_a: jax.Array      # B int32


class _TreeCarry(NamedTuple):
    key: jax.Array
    depth: jax.Array    # doublings completed, B int32
    done: jax.Array     # B bool
    diverging: jax.Array
    moved: jax.Array    # any top-level proposal swap happened
    q_l: jax.Array      # leftmost state (time-backward end), B+(D,)
    p_l: jax.Array
    g_l: jax.Array
    q_r: jax.Array      # rightmost state
    p_r: jax.Array
    g_r: jax.Array
    pq: jax.Array       # current proposal
    pu: jax.Array
    pg: jax.Array
    lw: jax.Array       # logsumexp of tree weights, B
    rho: jax.Array      # momentum sum over the whole tree, B+(D,)
    sum_a: jax.Array
    n_a: jax.Array
    n_leap: jax.Array   # total leapfrog steps, B int32


def _nuts_transition(vag_flat, key, q0, u0, g0, eps, G, max_depth,
                     max_delta):
    """One NUTS transition on flat states.

    q0/g0/G: B+(D,) arrays; u0: B; eps: scalar or B.  Returns
    (q, u, g, info) with the sampled point and per-chain diagnostics.
    Every state update is masked by per-chain activity, which makes the
    while-loops correct both under vmap batching (per-chain engine) and
    with explicit chain axes (fused batch engine).
    """
    B = u0.shape
    dt = q0.dtype
    D = q0.shape[-1]
    ND = max(max_depth, 1)          # checkpoint slots
    nbits = max_depth + 1

    key, k_mom = jax.random.split(key)
    p0 = jax.random.normal(k_mom, q0.shape, dt) / jnp.sqrt(G)
    h0 = u0 + 0.5 * jnp.sum(G * p0 * p0, -1)
    eps = jnp.broadcast_to(jnp.asarray(eps, dt), B)

    def is_turning(p_a, p_b, rho):
        # Betancourt's criterion with diagonal inverse-mass G:
        # v = G p; turn when either edge velocity opposes rho.
        return (jnp.sum(G * p_a * rho, -1) <= 0.0) | \
               (jnp.sum(G * p_b * rho, -1) <= 0.0)

    def leapfrog(q, p, g, e_signed):
        e = e_signed[..., None]
        p_half = p - 0.5 * e * g
        q_n = q + e * G * p_half
        u_n, g_n = vag_flat(q_n)
        p_n = p_half - 0.5 * e * g_n
        return q_n, p_n, g_n, u_n

    izeros = jnp.zeros(B, jnp.int32)
    bfalse = jnp.zeros(B, bool)
    fzeros = jnp.zeros(B, dt)
    jr = jnp.arange(ND, dtype=jnp.int32)

    def outer_cond(c):
        return jnp.any(~c.done)

    def outer_body(c):
        key, kd, kt, ksub = jax.random.split(c.key, 4)
        active = ~c.done
        going_right = jax.random.bernoulli(kd, 0.5, B)
        e_signed = jnp.where(going_right, eps, -eps)
        n_leaf = jnp.left_shift(jnp.int32(1), c.depth)
        gr = going_right[..., None]
        q_e = jnp.where(gr, c.q_r, c.q_l)
        p_e = jnp.where(gr, c.p_r, c.p_l)
        g_e = jnp.where(gr, c.g_r, c.g_l)

        def sub_cond(s):
            return jnp.any(active & (s.i < n_leaf)
                           & ~s.turning & ~s.diverging)

        def sub_body(s):
            ks, kp = jax.random.split(s.key)
            act = active & (s.i < n_leaf) & ~s.turning & ~s.diverging
            q_n, p_n, g_n, u_n = leapfrog(s.q_e, s.p_e, s.g_e, e_signed)
            h = u_n + 0.5 * jnp.sum(G * p_n * p_n, -1)
            dh = h - h0
            ok = jnp.isfinite(dh) & (dh <= max_delta)
            alpha = jnp.where(jnp.isfinite(dh),
                              jnp.exp(jnp.minimum(-dh, 0.0)),
                              0.0).astype(dt)
            sum_a = s.sum_a + jnp.where(act, alpha, 0.0)
            n_a = s.n_a + act.astype(jnp.int32)

            add = act & ok                       # leaf joins the subtree
            adde = add[..., None]
            rho = jnp.where(adde, s.rho + p_n, s.rho)

            # progressive multinomial proposal within the subtree:
            # replace with prob exp(w - logsumexp(weights so far)).
            w = jnp.where(ok, -dh, -jnp.inf).astype(dt)
            new_lw = jnp.logaddexp(s.sub_lw, w)
            ratio = jnp.where(add, w - new_lw, -jnp.inf)
            take = add & (jnp.log(jax.random.uniform(kp, B, dt)) < ratio)
            sub_lw = jnp.where(add, new_lw, s.sub_lw)
            pq = jnp.where(take[..., None], q_n, s.pq)
            pu = jnp.where(take, u_n, s.pu)
            pg = jnp.where(take[..., None], g_n, s.pg)

            # checkpoint scheme: even leaf i starts balanced intervals ->
            # store (p_i, rho[0..i]) at slot popcount(i >> 1); odd leaf i
            # closes the intervals whose slots are the contiguous range
            # ending at that same popcount, one per trailing 1-bit of i.
            slot = _popcount(s.i >> 1, nbits)
            onehot = jr == slot[..., None]                 # B+(ND,)
            store = (add & ((s.i & 1) == 0))[..., None] & onehot
            ck_p = jnp.where(store[..., None], p_n[..., None, :], s.ck_p)
            ck_rho = jnp.where(store[..., None], rho[..., None, :],
                               s.ck_rho)

            idx_max = slot
            idx_min = idx_max - _trailing_ones(s.i, nbits) + 1
            inr = (jr >= idx_min[..., None]) & (jr <= idx_max[..., None])
            rho_int = rho[..., None, :] - ck_rho + ck_p    # B+(ND, D)
            d1 = jnp.sum(G[..., None, :] * ck_p * rho_int, -1)
            d2 = jnp.sum(G[..., None, :] * p_n[..., None, :] * rho_int,
                         -1)
            turn_here = jnp.any(inr & ((d1 <= 0.0) | (d2 <= 0.0)), -1)
            turning = s.turning | (add & ((s.i & 1) == 1) & turn_here)
            diverging = s.diverging | (act & ~ok)

            return _SubCarry(
                key=ks, i=s.i + act.astype(jnp.int32),
                q_e=jnp.where(adde, q_n, s.q_e),
                p_e=jnp.where(adde, p_n, s.p_e),
                g_e=jnp.where(adde, g_n, s.g_e),
                sub_lw=sub_lw, pq=pq, pu=pu, pg=pg, rho=rho,
                ck_p=ck_p, ck_rho=ck_rho, turning=turning,
                diverging=diverging, sum_a=sum_a, n_a=n_a)

        s0 = _SubCarry(
            key=ksub, i=izeros, q_e=q_e, p_e=p_e, g_e=g_e,
            sub_lw=jnp.full(B, -jnp.inf, dt), pq=q_e, pu=fzeros, pg=g_e,
            rho=jnp.zeros_like(q0),
            ck_p=jnp.zeros(B + (ND, D), dt),
            ck_rho=jnp.zeros(B + (ND, D), dt),
            turning=bfalse, diverging=bfalse, sum_a=fzeros, n_a=izeros)
        s = jax.lax.while_loop(sub_cond, sub_body, s0)

        # a subtree that U-turned or diverged internally is DISCARDED
        # whole (Betancourt 2017 A.4.2): no proposal update, stop.
        completed = active & ~s.turning & ~s.diverging
        take_top = completed & (
            jnp.log(jax.random.uniform(kt, B, dt)) < (s.sub_lw - c.lw))
        pq = jnp.where(take_top[..., None], s.pq, c.pq)
        pu = jnp.where(take_top, s.pu, c.pu)
        pg = jnp.where(take_top[..., None], s.pg, c.pg)
        lw = jnp.where(completed, jnp.logaddexp(c.lw, s.sub_lw), c.lw)
        rho = jnp.where(completed[..., None], c.rho + s.rho, c.rho)
        upd_r = (completed & going_right)[..., None]
        upd_l = (completed & ~going_right)[..., None]
        q_r = jnp.where(upd_r, s.q_e, c.q_r)
        p_r = jnp.where(upd_r, s.p_e, c.p_r)
        g_r = jnp.where(upd_r, s.g_e, c.g_r)
        q_l = jnp.where(upd_l, s.q_e, c.q_l)
        p_l = jnp.where(upd_l, s.p_e, c.p_l)
        g_l = jnp.where(upd_l, s.g_e, c.g_l)
        turn_top = is_turning(p_l, p_r, rho)
        depth = c.depth + active.astype(jnp.int32)
        done = c.done | (active & (~completed | turn_top)) \
            | (depth >= max_depth)

        return _TreeCarry(
            key=key, depth=depth, done=done,
            diverging=c.diverging | (active & s.diverging),
            moved=c.moved | take_top,
            q_l=q_l, p_l=p_l, g_l=g_l, q_r=q_r, p_r=p_r, g_r=g_r,
            pq=pq, pu=pu, pg=pg, lw=lw, rho=rho,
            sum_a=c.sum_a + s.sum_a, n_a=c.n_a + s.n_a,
            n_leap=c.n_leap + s.i)

    c0 = _TreeCarry(
        key=key, depth=izeros, done=bfalse, diverging=bfalse,
        moved=bfalse, q_l=q0, p_l=p0, g_l=g0, q_r=q0, p_r=p0, g_r=g0,
        pq=q0, pu=u0, pg=g0, lw=fzeros, rho=p0,
        sum_a=fzeros, n_a=izeros, n_leap=izeros)
    c = jax.lax.while_loop(outer_cond, outer_body, c0)

    info = {
        "accept_prob": c.sum_a / jnp.maximum(c.n_a, 1).astype(dt),
        "accepted": c.moved,
        "depth": c.depth,
        "n_leapfrog": c.n_leap,
        "diverging": c.diverging,
    }
    return c.pq, c.pu, c.pg, info


def _broadcast_precond(precond, position):
    return jax.tree.map(lambda p, q: jnp.broadcast_to(p, q.shape),
                        precond, position)


def _make_nuts(vag, step_size, max_depth, precond, max_delta, per_chain):
    sched = schedules.resolve(step_size)

    def init(position):
        u, g = vag(position)
        return HMCState(position, u, g, jnp.asarray(0, jnp.int32))

    def step(key, state):
        flat, unflat = _flatteners(state.position, per_chain)
        q0 = flat(state.position)
        g0 = flat(state.grad)
        G = flat(_broadcast_precond(precond, state.position)) \
            if precond is not None else jnp.ones_like(q0)

        def vag_flat(q):
            u, g = vag(unflat(q))
            return u, flat(g)

        eps = sched(state.step)
        q, u, g, info = _nuts_transition(
            vag_flat, key, q0, state.potential, g0, eps, G, max_depth,
            max_delta)
        new_state = HMCState(unflat(q), u, unflat(g), state.step + 1)
        info.update(potential=u, step_size=jnp.asarray(eps))
        return new_state, info

    return TransitionKernel(init, step)


def nuts(potential_fn: Callable, step_size, max_depth: int = 10,
         precond: Optional[PyTree] = None,
         max_delta_energy: float = 1000.0) -> TransitionKernel:
    """Multinomial NUTS over a per-chain potential (vmap across chains
    with `sample_chains`).  `step_size` is a float or schedule;
    `precond` is an optional fixed diagonal inverse-mass pytree (same
    convention as `hmc`); trajectories stop at a U-turn, a divergence
    (energy error > `max_delta_energy`), or `max_depth` doublings
    (<= 2**max_depth - 1 gradient evaluations per transition).  Exact:
    no step-size bias at any eps.  See the module docstring for the
    XLA-shaped tree-building formulation."""
    return _make_nuts(jax.value_and_grad(potential_fn), step_size,
                      max_depth, precond, max_delta_energy,
                      per_chain=False)


def nuts_batched(potential_batch: Callable, step_size,
                 max_depth: int = 10, precond: Optional[PyTree] = None,
                 max_delta_energy: float = 1000.0) -> TransitionKernel:
    """Multinomial NUTS over the fused batch-potential contract
    (`sgld_batched`): every leapfrog step is ONE fused forward+backward
    for the whole chain batch; each chain grows/stops its own tree via
    per-chain masks (finished chains idle inside the lockstep loop until
    the slowest tree of the transition stops)."""
    return _make_nuts(batch_value_and_grad(potential_batch), step_size,
                      max_depth, precond, max_delta_energy,
                      per_chain=True)


def _make_adaptive_nuts(vag, eps0, num_adapt, target_accept, max_depth,
                        adapt_mass, max_delta, per_chain, init_mass=None):
    init = _adaptive_init(vag, eps0, per_chain, init_mass)

    def step(key, state):
        in_adapt = state.step < num_adapt
        eps = jnp.exp(jnp.where(in_adapt, state.log_eps,
                                state.log_eps_avg))

        flat, unflat = _flatteners(state.position, per_chain)
        q0 = flat(state.position)
        g0 = flat(state.grad)
        G = flat(state.mass_g)

        def vag_flat(q):
            u, g = vag(unflat(q))
            return u, flat(g)

        q, u, g, info = _nuts_transition(
            vag_flat, key, q0, state.potential, g0, eps, G, max_depth,
            max_delta)
        position = unflat(q)
        grad = unflat(g)

        (log_eps, log_eps_avg, h_avg, mu, mean, m2, mass_g) = \
            _warmup_advance(state, position, info["accept_prob"],
                            num_adapt, target_accept, adapt_mass)

        new_state = AdaptiveHMCState(
            position=position, potential=u, grad=grad,
            step=state.step + 1, log_eps=log_eps,
            log_eps_avg=log_eps_avg, h_avg=h_avg, mu=mu,
            mean=mean, m2=m2, mass_g=mass_g)
        info.update(potential=u, step_size=jnp.exp(log_eps_avg))
        return new_state, info

    return TransitionKernel(init, step)


def adaptive_nuts(potential_fn: Callable, num_adapt: int,
                  step_size: float = 0.1, target_accept: float = 0.8,
                  max_depth: int = 10, adapt_mass: bool = True,
                  max_delta_energy: float = 1000.0,
                  init_mass: Optional[PyTree] = None) -> TransitionKernel:
    """NUTS with Stan-style warmup (dual-averaging step size on the
    trajectory-mean accept statistic + Welford diagonal inverse-mass,
    both frozen at `num_adapt`; set burn_in >= num_adapt).  This is the
    full Stan/PyMC default sampler configuration.  Per-chain engine; see
    `adaptive_nuts_batched` for the fused batch contract."""
    return _make_adaptive_nuts(jax.value_and_grad(potential_fn),
                               step_size, num_adapt, target_accept,
                               max_depth, adapt_mass, max_delta_energy,
                               per_chain=False, init_mass=init_mass)


def adaptive_nuts_batched(potential_batch: Callable, num_adapt: int,
                          step_size: float = 0.1,
                          target_accept: float = 0.8,
                          max_depth: int = 10, adapt_mass: bool = True,
                          max_delta_energy: float = 1000.0,
                          init_mass: Optional[PyTree] = None
                          ) -> TransitionKernel:
    """Warmup-adaptive NUTS over the fused batch-potential contract:
    each chain adapts its own (eps, diagonal inverse-mass) and grows its
    own trees, all inside one lockstep fused-kernel loop.  `init_mass`
    seeds the warmup metric (see `_adaptive_init` — on the stiff GP
    posterior pass `psgld_preconditioner(warmup_state)`; identity-mass
    warmup there drives every early tree to max depth)."""
    return _make_adaptive_nuts(batch_value_and_grad(potential_batch),
                               step_size, num_adapt, target_accept,
                               max_depth, adapt_mass, max_delta_energy,
                               per_chain=True, init_mass=init_mass)
