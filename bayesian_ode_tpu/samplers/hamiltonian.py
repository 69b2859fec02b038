"""Adaptive SGHMC and its cyclical variant.

pybnn-style adaptive Stochastic Gradient HMC (Springenberg et al. 2016);
update equations follow reference samplers/hamiltonian.py exactly.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..utils.pytree import (
    PyTree,
    tree_random_normal,
    tree_sum_squares,
    tree_where,
)
from . import schedules
from .base import TransitionKernel, batch_value_and_grad
from .langevin import _tree_sum_squares_per_chain, _tree_where_per_chain


class SGHMCState(NamedTuple):
    position: PyTree
    potential: jax.Array
    grad: PyTree
    tau: PyTree        # moving-average window sizes
    g: PyTree          # averaged gradient
    v_hat: PyTree      # gradient variance estimate
    momentum: PyTree
    step: jax.Array


def _sghmc_core(key, state, lr, grad, mom_decay, lambda_, burn_in,
                resample_every: Optional[int], noise_on):
    """Shared aSGHMC update (reference hamiltonian.py:55-102).

    During burn-in, adapt (tau, g, v_hat); preconditioner
    Minv = 1/(sqrt(v_hat)+lambda); momentum update
        m <- m - lr^2*Minv*grad - c*m + N(0, max(2*lr^2*c*Minv - lr^4, 1e-16))
    then theta += m.  Optional periodic momentum resampling outside burn-in
    with std clamp(1/Minv, max=10) (hamiltonian.py:81-83).
    """
    key_noise, key_resample = jax.random.split(key)

    def adapt(tau, g_avg, v_hat):
        tau_inv = jax.tree.map(lambda t: 1.0 / (t + 1.0), tau)
        tau_new = jax.tree.map(
            lambda t, ga, vh: t - t * (ga * ga / (vh + lambda_)) + 1.0,
            tau, g_avg, v_hat,
        )
        g_new = jax.tree.map(
            lambda ga, ti, gr: ga - ga * ti + ti * gr, g_avg, tau_inv, grad
        )
        v_new = jax.tree.map(
            lambda vh, ti, gr: vh - vh * ti + ti * gr**2, v_hat, tau_inv, grad
        )
        return tau_new, g_new, v_new

    if burn_in:
        tau, g_avg, v_hat = adapt(state.tau, state.g, state.v_hat)
    else:
        tau, g_avg, v_hat = state.tau, state.g, state.v_hat

    minv = jax.tree.map(lambda vh: 1.0 / (jnp.sqrt(vh) + lambda_), v_hat)

    momentum = state.momentum
    if (not burn_in) and resample_every is not None:
        do_resample = (state.step % resample_every) == 0
        fresh = jax.tree.map(
            lambda m, mi, n: jnp.clip(1.0 / mi, max=1e1) * n,
            momentum, minv, tree_random_normal(key_resample, momentum),
        )
        momentum = jax.tree.map(
            lambda m, f: jnp.where(do_resample, f, m), momentum, fresh
        )

    sigma = jax.tree.map(
        lambda mi: jnp.sqrt(
            jnp.clip(2.0 * lr**2 * mom_decay * mi - lr**4, min=1e-16)
        ),
        minv,
    )
    momentum = jax.tree.map(
        lambda m, mi, gr: m - lr**2 * mi * gr - mom_decay * m,
        momentum, minv, grad,
    )
    noise = tree_random_normal(key_noise, momentum)
    momentum = jax.tree.map(
        lambda m, s, n: m + jnp.where(noise_on, s, 0.0) * n,
        momentum, sigma, noise,
    )
    position = jax.tree.map(lambda p, m: p + m, state.position, momentum)
    return position, tau, g_avg, v_hat, momentum


def _make_sghmc(value_and_grad, lr_fn, mom_decay, lambda_, resample_every,
                burn_in_steps, noise_fn):
    """value_and_grad(position) -> (potential(s), grad pytree); a scalar
    potential for per-chain kernels, a (C,) vector for batched ones (the
    whole aSGHMC update is elementwise, so both share this machinery)."""

    def init(position):
        u, g = value_and_grad(position)
        ones = jax.tree.map(jnp.ones_like, position)
        zeros = jax.tree.map(jnp.zeros_like, position)
        return SGHMCState(position, u, g, ones, ones, ones, zeros,
                          jnp.asarray(0, jnp.int32))

    def step(key, state):
        lr = lr_fn(state.step)
        in_burn_in = state.step < burn_in_steps
        noise_on = noise_fn(state.step)

        # Branchless burn-in adaptation: compute both and select (the adapt
        # update is cheap relative to the gradient).
        pos_b, tau_b, g_b, v_b, mom_b = _sghmc_core(
            key, state, lr, state.grad, mom_decay, lambda_, True,
            None, noise_on,
        )
        pos_s, tau_s, g_s, v_s, mom_s = _sghmc_core(
            key, state, lr, state.grad, mom_decay, lambda_, False,
            resample_every, noise_on,
        )
        sel = lambda a, b: jax.tree.map(
            lambda x, y: jnp.where(in_burn_in, x, y), a, b
        )
        position = sel(pos_b, pos_s)
        u, g = value_and_grad(position)
        new_state = SGHMCState(
            position, u, g, sel(tau_b, tau_s), sel(g_b, g_s), sel(v_b, v_s),
            sel(mom_b, mom_s), state.step + 1,
        )
        info = {"potential": state.potential, "accepted": jnp.asarray(True),
                "step_size": lr}
        return new_state, info

    return TransitionKernel(init, step)


def asghmc(potential_fn: Callable, step_size, burn_in_steps: int,
           mom_decay: float = 5e-2, lambda_: float = 1e-5,
           resample_momentum_every: Optional[int] = None,
           add_noise: bool = True) -> TransitionKernel:
    """Adaptive SGHMC (reference hamiltonian.py:11-164).

    `burn_in_steps` controls how long the (tau, g, v_hat) statistics adapt —
    the reference flips `burn_in=True/False` between its two loops; here the
    kernel's step counter does it.
    """
    lr_fn = schedules.resolve(step_size)
    noise_fn = (lambda t: jnp.asarray(add_noise)) if add_noise else (
        lambda t: jnp.asarray(False))
    return _make_sghmc(jax.value_and_grad(potential_fn), lr_fn, mom_decay,
                       lambda_, resample_momentum_every, burn_in_steps,
                       noise_fn)


def asghmc_batched(potential_batch: Callable, step_size, burn_in_steps: int,
                   mom_decay: float = 5e-2, lambda_: float = 1e-5,
                   resample_momentum_every: Optional[int] = None,
                   add_noise: bool = True) -> TransitionKernel:
    """aSGHMC over an entire chain batch in one kernel step.

    Every part of the update — (tau, g, v_hat) adaptation, preconditioner,
    momentum, noise — is elementwise, so with independent chains stacked on
    a leading axis the batched update is exactly the per-chain one (same
    argument as `langevin.psgld_batched`).  Takes the fused batch-potential
    contract of `sgld_batched` (e.g. ops.gp_rk4.make_fused_gp_potential);
    use with `sample_chain`, not `sample_chains`.
    """
    lr_fn = schedules.resolve(step_size)
    noise_fn = (lambda t: jnp.asarray(add_noise)) if add_noise else (
        lambda t: jnp.asarray(False))
    return _make_sghmc(batch_value_and_grad(potential_batch), lr_fn,
                       mom_decay, lambda_, resample_momentum_every,
                       burn_in_steps, noise_fn)


class BAOABState(NamedTuple):
    position: PyTree
    potential: jax.Array
    grad: PyTree
    v_hat: PyTree      # EMA of squared gradients (frozen after burn-in)
    momentum: PyTree
    step: jax.Array


def _make_baoab(vag, lr_fn, friction, lambda_, burn_in_steps, beta_ema):
    """Preconditioned BAOAB splitting for underdamped Langevin.

    Leimkuhler & Matthews' symmetric B-A-O-A-B scheme with exact OU
    momentum refresh has O(h^2) stationary (configurational) bias vs the
    O(h) of Euler-style SGHMC/SGLD updates (cf. arXiv:1610.06665 on
    high-order SGMCMC integrators).  One gradient evaluation per step
    (the trailing B reuses it FSAL-style as the next step's leading B).

    Measured caveat (VDP GP posterior, diagonal preconditioning): the
    textbook advantage did NOT materialize there — logsn-mean bias
    ~1.4 sigma at h=8e-3..1.6e-2 (vs aSGHMC's 0.9 sigma at 8e-3), small
    h shows long underdamped transients that overdisperse finite
    windows, and friction < ~1 diverges some chains.  Clean on Gaussian
    targets (tests); treat the step controller's bias validation
    protocol (CLAUDE.md) as mandatory before trusting it on a new
    posterior.

    Diagonal preconditioning: mass M = 1/G with G = 1/(sqrt(v_hat) +
    lambda) (pSGLD/aSGHMC's metric).  v_hat adapts by EMA during
    burn-in and is FROZEN afterwards so the sampled invariant measure
    exp(-U(theta) - p^T G p / 2) is exact up to the integrator's O(h^2):

        B: p <- p - h/2 * grad
        A: theta <- theta + h/2 * G * p
        O: p <- c1*p + sqrt(1-c1^2)/sqrt(G) * xi,  c1 = exp(-friction*h)
        A: theta <- theta + h/2 * G * p
        B: p <- p - h/2 * grad(theta_new)
    """

    def init(position):
        u, g = vag(position)
        return BAOABState(position, u, g,
                          jax.tree.map(jnp.zeros_like, g),
                          jax.tree.map(jnp.zeros_like, position),
                          jnp.asarray(0, jnp.int32))

    def step(key, state):
        h = lr_fn(state.step)
        in_burn = state.step < burn_in_steps
        v_new = jax.tree.map(
            lambda v, g: beta_ema * v + (1 - beta_ema) * g**2,
            state.v_hat, state.grad,
        )
        v_hat = jax.tree.map(
            lambda vn, vo: jnp.where(in_burn, vn, vo), v_new, state.v_hat
        )
        G = jax.tree.map(lambda v: 1.0 / (jnp.sqrt(v) + lambda_), v_hat)

        p1 = jax.tree.map(lambda p, g: p - 0.5 * h * g,
                          state.momentum, state.grad)
        th_half = jax.tree.map(lambda t, G_, p: t + 0.5 * h * G_ * p,
                               state.position, G, p1)
        c1 = jnp.exp(-friction * h)
        c2 = jnp.sqrt(jnp.maximum(1.0 - c1 * c1, 0.0))
        noise = tree_random_normal(key, state.momentum)
        p2 = jax.tree.map(
            lambda p, G_, n: c1 * p + c2 * n / jnp.sqrt(G_), p1, G, noise
        )
        th_new = jax.tree.map(lambda t, G_, p: t + 0.5 * h * G_ * p,
                              th_half, G, p2)
        u, g_new = vag(th_new)
        p_new = jax.tree.map(lambda p, g: p - 0.5 * h * g, p2, g_new)

        new_state = BAOABState(th_new, u, g_new, v_hat, p_new,
                               state.step + 1)
        info = {"potential": state.potential, "accepted": jnp.asarray(True),
                "step_size": h}
        return new_state, info

    return TransitionKernel(init, step)


def baoab(potential_fn: Callable, step_size, friction: float = 1.0,
          lambda_: float = 1e-5, burn_in_steps: int = 0,
          beta_ema: float = 0.99) -> TransitionKernel:
    """Per-chain preconditioned BAOAB (see `_make_baoab`).  Not in the
    reference suite — a TPU-native addition; see _make_baoab's measured
    caveat before preferring it over aSGHMC/pSGLD on a new posterior."""
    return _make_baoab(jax.value_and_grad(potential_fn),
                       schedules.resolve(step_size), friction, lambda_,
                       burn_in_steps, beta_ema)


def baoab_batched(potential_batch: Callable, step_size,
                  friction: float = 1.0, lambda_: float = 1e-5,
                  burn_in_steps: int = 0, beta_ema: float = 0.99
                  ) -> TransitionKernel:
    """Batched preconditioned BAOAB over the fused batch-potential
    contract (one fused forward+backward per step; every update is
    elementwise, so the batched update is exactly the per-chain one)."""
    return _make_baoab(batch_value_and_grad(potential_batch),
                       schedules.resolve(step_size), friction, lambda_,
                       burn_in_steps, beta_ema)


class SGRHMCState(NamedTuple):
    position: PyTree
    potential: jax.Array
    grad: PyTree
    v: PyTree          # EMA of squared gradients (metric)
    momentum: PyTree
    step: jax.Array


def sgrhmc(potential_fn: Callable, step_size, friction: float = 0.1,
           beta: float = 0.99, lambda_: float = 1e-5) -> TransitionKernel:
    """Stochastic Gradient Riemannian HMC, completed.

    The reference carries only a docstring stub (hamiltonian.py:337-340).
    This implements the Ma, Chen & Fox (2015) "complete recipe" SGRHMC
    with a diagonal RMSprop metric G = diag(1/(lambda + sqrt(V))):

        V <- beta*V + (1-beta)*g^2
        r <- r - eps*G^{1/2}*g - eps*C*r + N(0, 2*eps*C)
        theta <- theta + eps*G^{1/2}*r

    (the Gamma metric-derivative term is dropped, as pSGLD drops it).
    """
    return _sgrhmc_kernel(jax.value_and_grad(potential_fn), step_size,
                          friction, beta, lambda_)


def sgrhmc_batched(potential_batch: Callable, step_size,
                   friction: float = 0.1, beta: float = 0.99,
                   lambda_: float = 1e-5) -> TransitionKernel:
    """`sgrhmc` on the fused batch-potential contract (`sgld_batched`):
    the RMSprop metric, momentum update, and position update are all
    elementwise over chain-major leaves — one fused forward+backward per
    step for the whole batch."""
    return _sgrhmc_kernel(batch_value_and_grad(potential_batch),
                          step_size, friction, beta, lambda_)


def _sgrhmc_kernel(value_and_grad, step_size, friction, beta, lambda_
                   ) -> TransitionKernel:
    sched = schedules.resolve(step_size)

    def init(position):
        u, g = value_and_grad(position)
        return SGRHMCState(position, u, g,
                           jax.tree.map(jnp.zeros_like, g),
                           jax.tree.map(jnp.zeros_like, position),
                           jnp.asarray(0, jnp.int32))

    def step(key, state):
        eps = sched(state.step)
        v = jax.tree.map(lambda v_, g_: beta * v_ + (1 - beta) * g_**2,
                         state.v, state.grad)
        ghalf = jax.tree.map(
            lambda v_: 1.0 / jnp.sqrt(jnp.sqrt(v_) + lambda_), v
        )
        noise = tree_random_normal(key, state.momentum)
        sigma = jnp.sqrt(2.0 * eps * friction)
        r = jax.tree.map(
            lambda r_, gh, g_, n: r_ - eps * gh * g_ - eps * friction * r_
            + sigma * n,
            state.momentum, ghalf, state.grad, noise,
        )
        position = jax.tree.map(
            lambda p, gh, r_: p + eps * gh * r_, state.position, ghalf, r
        )
        u, g = value_and_grad(position)
        info = {"potential": state.potential, "accepted": jnp.asarray(True),
                "step_size": eps}
        return SGRHMCState(position, u, g, v, r, state.step + 1), info

    return TransitionKernel(init, step)


def acsghmc(potential_fn: Callable, lr0: float, num_cycles: int,
            total_iters: int, burn_in_steps: int, beta: float = 0.25,
            mom_decay: float = 5e-2, lambda_: float = 1e-5,
            resample_momentum_every: Optional[int] = None) -> TransitionKernel:
    """Cyclical adaptive SGHMC (reference hamiltonian.py:167-334): cosine
    step size; noise injected only in the sampling phase of each cycle
    (r > beta, hamiltonian.py:254-262)."""
    lr_fn = schedules.cyclical_cosine(lr0, num_cycles, total_iters)

    def noise_fn(t):
        return schedules.cycle_position(t, num_cycles, total_iters) > beta

    return _make_sghmc(jax.value_and_grad(potential_fn), lr_fn, mom_decay,
                       lambda_, resample_momentum_every, burn_in_steps,
                       noise_fn)


def acsghmc_batched(potential_batch: Callable, lr0: float, num_cycles: int,
                    total_iters: int, burn_in_steps: int, beta: float = 0.25,
                    mom_decay: float = 5e-2, lambda_: float = 1e-5,
                    resample_momentum_every: Optional[int] = None
                    ) -> TransitionKernel:
    """Cyclical aSGHMC over an entire chain batch (see `asghmc_batched`
    for the batching argument; the cosine schedule and noise phase depend
    only on the shared step counter)."""
    lr_fn = schedules.cyclical_cosine(lr0, num_cycles, total_iters)

    def noise_fn(t):
        return schedules.cycle_position(t, num_cycles, total_iters) > beta

    return _make_sghmc(batch_value_and_grad(potential_batch), lr_fn,
                       mom_decay, lambda_, resample_momentum_every,
                       burn_in_steps, noise_fn)


class HMCState(NamedTuple):
    position: PyTree
    potential: jax.Array
    grad: PyTree
    step: jax.Array


def _bcast_step(eps, leaf):
    """Broadcast a scalar or per-chain (C,) step over a leaf's axes,
    cast into the leaf's dtype (repo convention: controller scalars are
    cast into the state dtype at every combine — under x64 a strong-f64
    jittered eps would otherwise promote f32 fused-kernel positions and
    break the scan carry)."""
    eps = jnp.asarray(eps, leaf.dtype)
    if eps.ndim == 0:
        return eps
    return eps.reshape(eps.shape + (1,) * (leaf.ndim - eps.ndim))


def _make_hmc(vag, step_size, num_leapfrog, precond, jitter, per_chain):
    """Exact Hamiltonian Monte Carlo (Neal 2011) as a TransitionKernel.

    Not in the reference suite (its exact kernels are MALA/MMALA; aSGHMC
    is the stochastic-gradient stand-in, hamiltonian.py:11-164) — added
    because a Bayesian framework without plain HMC is a gap users hit
    immediately.  Full momentum refresh each step, `num_leapfrog`
    leapfrog steps (a static `lax.scan`, so `num_leapfrog` gradient
    evaluations per proposal with the initial gradient cached in the
    state), Metropolis correction on the Hamiltonian error — zero
    step-size bias at any (eps, L).

    `precond`: optional FIXED diagonal inverse-mass G (pytree matching
    the position; same convention as `mala_batched`): momentum
    p ~ N(0, G^{-1}), kinetic energy p^T G p / 2, position update
    q += eps*G*p.  Fixed G keeps the chain exactly reversible.

    `jitter`: fraction j => each proposal draws eps ~ U[(1-j)*eps0,
    (1+j)*eps0] (per chain in batched mode), the standard guard against
    periodic-orbit resonances on near-Gaussian targets.  The step size
    is symmetric within a proposal, so exactness is unaffected.
    """
    sched = schedules.resolve(step_size)

    def init(position):
        u, g = vag(position)
        return HMCState(position, u, g, jnp.asarray(0, jnp.int32))

    def step(key, state):
        eps0 = sched(state.step)
        key_prop, key_mh = jax.random.split(key)
        G = precond if precond is not None else jax.tree.map(
            jnp.ones_like, state.position)
        q, u, g, log_alpha = _hmc_proposal(
            vag, state.position, state.potential, state.grad, key_prop,
            eps0, jitter, G, num_leapfrog, per_chain)
        where = _tree_where_per_chain if per_chain else (
            lambda a, x, y: tree_where(a, x, y))
        ushape = state.potential.shape if per_chain else ()
        accept = jnp.isfinite(log_alpha) & (
            jnp.log(jax.random.uniform(key_mh, ushape)) < log_alpha)

        new_state = HMCState(
            position=where(accept, q, state.position),
            potential=jnp.where(accept, u, state.potential),
            grad=where(accept, g, state.grad),
            step=state.step + 1,
        )
        info = {"potential": new_state.potential, "accepted": accept,
                "step_size": eps0}
        return new_state, info

    return TransitionKernel(init, step)


def _hmc_proposal(vag, q0, u0, g0, key, eps0, jitter, G, num_leapfrog,
                  per_chain):
    """One jittered-leapfrog HMC proposal from (q0, u0, g0).

    Returns (q, u, g, log_alpha) with log_alpha = -(Hamiltonian error):
    H0 - H1 where H = U + p^T G p / 2 and p ~ N(0, G^{-1}).  `eps0` may
    be a scalar or per-chain (C,); jitter draws eps ~ U[(1-j), (1+j)]*eps0
    per chain in batched mode."""
    key_mom, key_jit = jax.random.split(key)
    sum_sq = _tree_sum_squares_per_chain if per_chain else tree_sum_squares
    jshape = u0.shape if per_chain else ()
    eps = eps0 * (1.0 + jitter * (
        2.0 * jax.random.uniform(key_jit, jshape) - 1.0)) \
        if jitter else eps0

    def e(leaf):
        return _bcast_step(eps, leaf)

    # p ~ N(0, M) with M = G^{-1} (diagonal)
    noise = tree_random_normal(key_mom, q0)
    p0 = jax.tree.map(lambda n, G_: n / jnp.sqrt(G_), noise, G)
    kin0 = 0.5 * sum_sq(jax.tree.map(
        lambda p, G_: jnp.sqrt(G_) * p, p0, G))

    # leapfrog: half kick, (L-1) x (drift + kick), drift, half kick
    p = jax.tree.map(lambda p_, g_: p_ - 0.5 * e(p_) * g_, p0, g0)
    q = jax.tree.map(lambda q_, G_, p_: q_ + e(q_) * G_ * p_, q0, G, p)
    u, g = vag(q)

    def body(carry, _):
        q, u, g, p = carry
        p = jax.tree.map(lambda p_, g_: p_ - e(p_) * g_, p, g)
        q = jax.tree.map(lambda q_, G_, p_: q_ + e(q_) * G_ * p_, q, G, p)
        u, g = vag(q)
        return (q, u, g, p), None

    (q, u, g, p), _ = jax.lax.scan(
        body, (q, u, g, p), None, length=num_leapfrog - 1)
    p = jax.tree.map(lambda p_, g_: p_ - 0.5 * e(p_) * g_, p, g)

    kin1 = 0.5 * sum_sq(jax.tree.map(
        lambda p_, G_: jnp.sqrt(G_) * p_, p, G))
    log_alpha = (u0 + kin0) - (u + kin1)
    return q, u, g, log_alpha


def hmc(potential_fn: Callable, step_size, num_leapfrog: int = 10,
        precond: Optional[PyTree] = None, jitter: float = 0.0
        ) -> TransitionKernel:
    """Exact HMC over a per-chain potential (vmap across chains with
    `sample_chains`).  See `_make_hmc`."""
    return _make_hmc(jax.value_and_grad(potential_fn), step_size,
                     num_leapfrog, precond, jitter, per_chain=False)


def hmc_batched(potential_batch: Callable, step_size,
                num_leapfrog: int = 10, precond: Optional[PyTree] = None,
                jitter: float = 0.0) -> TransitionKernel:
    """Exact HMC over the fused batch-potential contract (`sgld_batched`):
    `num_leapfrog` fused forward+backward passes per proposal for the
    whole batch; per-chain momenta, Hamiltonian errors, jittered step
    sizes, and accept masks.  Like `mala_batched`, exactness means the
    step size is tuned for mixing alone (target ~0.6-0.9 acceptance at
    moderate L), not a bias budget."""
    return _make_hmc(batch_value_and_grad(potential_batch), step_size,
                     num_leapfrog, precond, jitter, per_chain=True)


class AdaptiveHMCState(NamedTuple):
    position: PyTree
    potential: jax.Array
    grad: PyTree
    step: jax.Array
    log_eps: jax.Array      # current dual-averaging iterate
    log_eps_avg: jax.Array  # averaged iterate (the frozen value)
    h_avg: jax.Array        # running (target - accept_prob) average
    mu: jax.Array           # dual-averaging shrinkage anchor
    mean: PyTree            # Welford position mean (phase-1 window)
    m2: PyTree              # Welford sum of squared deviations
    mass_g: PyTree          # current diagonal inverse-mass G


def _adaptive_init(vag, eps0, per_chain, init_mass=None):
    """Initial AdaptiveHMCState shared by adaptive HMC and NUTS.

    `init_mass`: optional diagonal inverse-mass pytree used for warmup
    phase 1 instead of the identity.  On stiff posteriors (the GP-ODE
    flagship) identity-mass warmup leapfrogs diverge or drive NUTS to
    max-depth trees for thousands of steps; seeding with the frozen
    warmup-pSGLD metric (`psgld_preconditioner`, the repo's validated
    protocol) makes phase 1 immediately productive.  The Welford A/2
    switch still replaces it with the measured posterior variance when
    `adapt_mass` is on (Stan's init-metric semantics)."""

    def init(position):
        u, g = vag(position)
        log_eps = jnp.full(u.shape, jnp.log(eps0), jnp.float32) \
            if per_chain else jnp.asarray(jnp.log(eps0), jnp.float32)
        zeros = jnp.zeros_like(log_eps)
        if init_mass is None:
            mass_g = jax.tree.map(jnp.ones_like, position)
        else:
            mass_g = jax.tree.map(
                lambda m, x: jnp.broadcast_to(
                    jnp.asarray(m, x.dtype), x.shape),
                init_mass, position)
        return AdaptiveHMCState(
            position=position, potential=u, grad=g,
            step=jnp.asarray(0, jnp.int32),
            log_eps=log_eps, log_eps_avg=log_eps, h_avg=zeros,
            mu=log_eps + jnp.log(10.0),
            mean=jax.tree.map(jnp.zeros_like, position),
            m2=jax.tree.map(jnp.zeros_like, position),
            mass_g=mass_g,
        )

    return init


def _warmup_advance(state, position, a_prob, num_adapt, target_accept,
                    adapt_mass):
    """One step of the Stan-style two-phase warmup bookkeeping, shared by
    `adaptive_hmc` and `nuts.adaptive_nuts`: dual-averaging step-size
    update driven by this transition's accept statistic `a_prob` (the MH
    accept probability for HMC, the trajectory-mean alpha for NUTS),
    Welford position variance over phase 1, and the A/2 switch (freeze
    the diagonal inverse-mass, restart dual averaging around the current
    averaged step).  `a_prob` is a probability in [0, 1] shaped like
    `state.log_eps`; non-finite proposals must be mapped to 0 by the
    caller.  Returns the updated (log_eps, log_eps_avg, h_avg, mu, mean,
    m2, mass_g) fields; the caller freezes usage after `num_adapt` via
    `state.log_eps_avg`.
    """
    GAMMA, T0, KAPPA = 0.05, 10.0, 0.75
    half = num_adapt // 2
    in_adapt = state.step < num_adapt

    # --- dual averaging on E[accept_prob] - target ------------------
    da_dtype = state.log_eps.dtype
    a_prob = a_prob.astype(da_dtype)
    # step index within the current DA run (restarts at A/2)
    t = jnp.where(state.step < half, state.step, state.step - half
                  ).astype(da_dtype) + 1.0
    h_avg = ((1.0 - 1.0 / (t + T0)) * state.h_avg
             + (target_accept - a_prob) / (t + T0)).astype(da_dtype)
    log_eps = (state.mu - jnp.sqrt(t) / GAMMA * h_avg).astype(da_dtype)
    eta = t ** (-KAPPA)
    log_eps_avg = (eta * log_eps
                   + (1.0 - eta) * state.log_eps_avg).astype(da_dtype)
    h_avg = jnp.where(in_adapt, h_avg, state.h_avg)
    log_eps = jnp.where(in_adapt, log_eps, state.log_eps)
    log_eps_avg = jnp.where(in_adapt, log_eps_avg, state.log_eps_avg)

    # --- Welford variance over phase-1 positions --------------------
    n = jnp.minimum(state.step, half - 1).astype(jnp.float32) + 1.0
    in_ph1 = state.step < half

    def upd_mean(m, x):
        d = x - m
        return jnp.where(in_ph1, m + d / _bcast_step(n, x), m)

    mean = jax.tree.map(upd_mean, state.mean, position)

    def upd_m2(m2, m_old, m_new, x):
        return jnp.where(in_ph1, m2 + (x - m_old) * (x - m_new), m2)

    m2 = jax.tree.map(upd_m2, state.m2, state.mean, mean, position)

    # --- the A/2 switch: freeze mass, restart dual averaging --------
    at_switch = state.step + 1 == half
    if adapt_mass and half > 1:
        cnt = jnp.asarray(float(half), jnp.float32)

        def reg_var(m2_):
            var = m2_ / (cnt - 1.0)
            return (cnt / (cnt + 5.0)) * var \
                + 1e-3 * (5.0 / (cnt + 5.0))

        mass_g = jax.tree.map(
            lambda G_, m2_: jnp.where(at_switch, reg_var(m2_), G_),
            state.mass_g, m2,
        )
    else:
        mass_g = state.mass_g
    mu = jnp.where(at_switch, log_eps_avg + jnp.log(10.0),
                   state.mu).astype(da_dtype)
    h_avg = jnp.where(at_switch, jnp.zeros_like(h_avg), h_avg)
    log_eps = jnp.where(at_switch, log_eps_avg, log_eps)
    return log_eps, log_eps_avg, h_avg, mu, mean, m2, mass_g


def _make_adaptive_hmc(vag, eps0, num_adapt, target_accept, num_leapfrog,
                       jitter, adapt_mass, per_chain, init_mass=None):
    """HMC with Stan-style warmup: dual-averaging step size (Hoffman &
    Gelman 2014 §3.2) and Welford diagonal inverse-mass estimation, both
    FROZEN after `num_adapt` steps so the post-warmup chain is exactly
    reversible (zero bias) — draws taken at step < num_adapt are warmup
    and must be discarded (set burn_in >= num_adapt in `sample_chain(s)`).

    Two-phase schedule over the warmup window A = num_adapt:
      phase 1, steps [0, A/2): adapt eps under the initial (identity)
        mass while accumulating per-chain position variance (Welford);
      at A/2: freeze G = regularized variance (Stan's n/(n+5) shrinkage
        toward 1e-3) and RESTART dual averaging around the current eps
        (the optimal eps changes with the metric);
      phase 2, steps [A/2, A): adapt eps under the final mass;
      at A: freeze eps = exp(log_eps_avg).

    Each chain adapts its own (eps, G) — in batched mode all the
    adaptation state carries a leading chain axis; in per-chain mode
    `sample_chains`'s vmap provides it.  DA constants are Stan's
    (gamma=0.05, t0=10, kappa=0.75).
    """
    init = _adaptive_init(vag, eps0, per_chain, init_mass)

    def step(key, state):
        key_prop, key_mh = jax.random.split(key)
        in_adapt = state.step < num_adapt
        eps = jnp.exp(jnp.where(in_adapt, state.log_eps,
                                state.log_eps_avg))

        q, u, g, log_alpha = _hmc_proposal(
            vag, state.position, state.potential, state.grad, key_prop,
            eps, jitter, state.mass_g, num_leapfrog, per_chain)
        where = _tree_where_per_chain if per_chain else (
            lambda a, x, y: tree_where(a, x, y))
        ushape = state.potential.shape if per_chain else ()
        accept = jnp.isfinite(log_alpha) & (
            jnp.log(jax.random.uniform(key_mh, ushape)) < log_alpha)
        position = where(accept, q, state.position)
        potential = jnp.where(accept, u, state.potential)
        grad = where(accept, g, state.grad)

        a_prob = jnp.where(jnp.isfinite(log_alpha),
                           jnp.exp(jnp.minimum(log_alpha, 0.0)), 0.0)
        (log_eps, log_eps_avg, h_avg, mu, mean, m2, mass_g) = \
            _warmup_advance(state, position, a_prob, num_adapt,
                            target_accept, adapt_mass)

        new_state = AdaptiveHMCState(
            position=position, potential=potential, grad=grad,
            step=state.step + 1, log_eps=log_eps,
            log_eps_avg=log_eps_avg, h_avg=h_avg, mu=mu,
            mean=mean, m2=m2, mass_g=mass_g,
        )
        info = {"potential": potential, "accepted": accept,
                "step_size": jnp.exp(log_eps_avg)}
        return new_state, info

    return TransitionKernel(init, step)


def adaptive_hmc(potential_fn: Callable, num_adapt: int,
                 step_size: float = 0.1, target_accept: float = 0.8,
                 num_leapfrog: int = 10, jitter: float = 0.2,
                 adapt_mass: bool = True,
                 init_mass: Optional[PyTree] = None) -> TransitionKernel:
    """Warmup-adaptive exact HMC over a per-chain potential (vmap across
    chains with `sample_chains`; set burn_in >= num_adapt).  See
    `_make_adaptive_hmc`; `init_mass` seeds the warmup metric
    (`_adaptive_init`)."""
    return _make_adaptive_hmc(jax.value_and_grad(potential_fn), step_size,
                              num_adapt, target_accept, num_leapfrog,
                              jitter, adapt_mass, per_chain=False,
                              init_mass=init_mass)


def adaptive_hmc_batched(potential_batch: Callable, num_adapt: int,
                         step_size: float = 0.1,
                         target_accept: float = 0.8,
                         num_leapfrog: int = 10, jitter: float = 0.2,
                         adapt_mass: bool = True,
                         init_mass: Optional[PyTree] = None
                         ) -> TransitionKernel:
    """Warmup-adaptive exact HMC over the fused batch-potential contract:
    every chain adapts its own step size and diagonal inverse-mass from
    its own warmup history, all inside the one fused-kernel step loop.
    `init_mass` seeds the warmup metric (see `_adaptive_init` — on the
    stiff GP posterior pass `psgld_preconditioner(warmup_state)`)."""
    return _make_adaptive_hmc(batch_value_and_grad(potential_batch),
                              step_size, num_adapt, target_accept,
                              num_leapfrog, jitter, adapt_mass,
                              per_chain=True, init_mass=init_mass)
