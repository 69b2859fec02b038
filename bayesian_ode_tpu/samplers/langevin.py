"""Langevin-family samplers: SGLD, pSGLD, aSGLD, cSGLD, MALA, MMALA.

Pure transition kernels over pytree positions (see base.py for the design
stance vs the reference's Optimizer mutation).  Update equations follow
samplers/langevin.py of the reference exactly (file:line cites inline);
the Langevin noise convention is std sqrt(2*lr) (langevin.py:193-199).

All kernels are built from `potential_fn(theta) -> U` with U = -log
posterior, evaluated with `jax.value_and_grad` — the reference's
`closure(); loss.backward()` pattern.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..utils.pytree import (
    PyTree,
    ravel_pytree,
    tree_random_normal,
    tree_sum_squares,
    tree_where,
)
from . import schedules
from .base import (
    TransitionKernel,
    batch_value_and_grad,
    langevin_noise_scale,
)


class LangevinState(NamedTuple):
    position: PyTree
    potential: jax.Array
    grad: PyTree
    step: jax.Array


class PreconditionedState(NamedTuple):
    position: PyTree
    potential: jax.Array
    grad: PyTree
    v: PyTree          # EMA of squared gradients
    step: jax.Array


def sgld(potential_fn: Callable, step_size, add_noise: bool = True
         ) -> TransitionKernel:
    """Stochastic Gradient Langevin Dynamics (Welling & Teh 2011).

    theta' = theta - lr*grad - sqrt(2*lr)*xi   (langevin.py:173-199; always
    "accepted", langevin.py:247).  `step_size` may be a float or a schedule
    such as schedules.polynomial_decay (the reference's lr0/(t0+alpha*t)^gamma).
    """
    sched = schedules.resolve(step_size)
    value_and_grad = jax.value_and_grad(potential_fn)

    def init(position):
        u, g = value_and_grad(position)
        return LangevinState(position, u, g, jnp.asarray(0, jnp.int32))

    def step(key, state):
        lr = sched(state.step)
        if add_noise:
            noise = tree_random_normal(key, state.position)
            new_pos = jax.tree.map(
                lambda p, g, n: p - lr * g - langevin_noise_scale(lr) * n,
                state.position, state.grad, noise,
            )
        else:
            new_pos = jax.tree.map(
                lambda p, g: p - lr * g, state.position, state.grad
            )
        u, g = value_and_grad(new_pos)
        info = {"potential": state.potential, "accepted": jnp.asarray(True),
                "step_size": lr}
        return LangevinState(new_pos, u, g, state.step + 1), info

    return TransitionKernel(init, step)


def mala(potential_fn: Callable, step_size, add_noise: bool = True
         ) -> TransitionKernel:
    """Metropolis-Adjusted Langevin (Xifara et al., arXiv:1309.2983).

    SGLD proposal + MH correction with the asymmetric-proposal ratio
    log_alpha = U_old - U_new
                - 1/(4*lr) ||theta_old - theta' + lr*grad'||^2
                + 1/(4*lr) ||theta' - theta_old + lr*grad_old||^2
    (langevin.py:69-91); rejection restores the previous position.
    """
    sched = schedules.resolve(step_size)
    value_and_grad = jax.value_and_grad(potential_fn)

    def init(position):
        u, g = value_and_grad(position)
        return LangevinState(position, u, g, jnp.asarray(0, jnp.int32))

    def step(key, state):
        lr = sched(state.step)
        key_prop, key_mh = jax.random.split(key)

        if not add_noise:
            new_pos = jax.tree.map(
                lambda p, g: p - lr * g, state.position, state.grad
            )
            u, g = value_and_grad(new_pos)
            info = {"potential": state.potential,
                    "accepted": jnp.asarray(True), "step_size": lr}
            return LangevinState(new_pos, u, g, state.step + 1), info

        noise = tree_random_normal(key_prop, state.position)
        proposal = jax.tree.map(
            lambda p, g, n: p - lr * g - langevin_noise_scale(lr) * n,
            state.position, state.grad, noise,
        )
        u_new, g_new = value_and_grad(proposal)

        log_alpha = state.potential - u_new
        # reverse proposal probability (langevin.py:78-80)
        rev = jax.tree.map(
            lambda po, pn, gn: po - pn + lr * gn,
            state.position, proposal, g_new,
        )
        log_alpha += -1.0 / (4 * lr) * tree_sum_squares(rev)
        # forward proposal probability (langevin.py:81-83)
        fwd = jax.tree.map(
            lambda pn, po, go: pn - po + lr * go,
            proposal, state.position, state.grad,
        )
        log_alpha -= -1.0 / (4 * lr) * tree_sum_squares(fwd)

        accept = jnp.isfinite(log_alpha) & (
            jnp.log(jax.random.uniform(key_mh)) < log_alpha
        )
        new_state = LangevinState(
            position=tree_where(accept, proposal, state.position),
            potential=jnp.where(accept, u_new, state.potential),
            grad=tree_where(accept, g_new, state.grad),
            step=state.step + 1,
        )
        info = {"potential": new_state.potential, "accepted": accept,
                "step_size": lr}
        return new_state, info

    return TransitionKernel(init, step)


def _tree_sum_squares_per_chain(tree):
    """Per-chain sum of squares: reduce every leaf over all axes except
    the leading chain axis, then add across leaves.  Returns (C,)."""
    leaves = jax.tree.leaves(jax.tree.map(
        lambda x: jnp.sum(x * x, axis=tuple(range(1, x.ndim))), tree
    ))
    return sum(leaves)


def _tree_where_per_chain(accept, a, b):
    """Leafwise where with a (C,) predicate broadcast over trailing axes."""
    return jax.tree.map(
        lambda x, y: jnp.where(
            accept.reshape(accept.shape + (1,) * (x.ndim - 1)), x, y
        ),
        a, b,
    )


def mala_batched(potential_batch: Callable, step_size,
                 precond: PyTree | None = None) -> TransitionKernel:
    """MALA over an entire chain batch in one kernel step — EXACT sampling
    (Metropolis-corrected, zero step-size bias) at the same cost per step
    as `sgld_batched`: one fused forward+backward pass for the whole
    batch, plus per-chain proposal-ratio reductions (cheap elementwise).

    Takes the fused batch-potential contract of `sgld_batched`; use with
    `sample_chain`.  Same proposal/acceptance formulas as the per-chain
    `mala` above, vectorized per chain: each chain draws its own noise and
    uniform and accepts independently via masks (SURVEY.md §7.4 PRNG
    discipline).  Because the MH correction removes discretization bias,
    the step size can be tuned for mixing alone (target ~0.5-0.7
    acceptance) instead of being capped by a bias budget like
    SGLD/pSGLD/aSGHMC.

    `precond`: optional FIXED diagonal metric G (pytree matching the
    position, leaves broadcastable) — proposal
    `p' = p - lr*G*g - sqrt(2*lr*G)*xi` with the G-weighted MH ratio
    `||.||^2 / (4*lr*G)`.  On badly conditioned posteriors (e.g. the GP
    model's whitened-U directions) plain MALA's acceptance collapses at
    any useful step; a warmup-estimated G (e.g. pSGLD's 1/(lambda+sqrt(V))
    at the end of adaptation) restores it.  G fixed => the chain is still
    reversible, so exactness is preserved."""
    sched = schedules.resolve(step_size)
    vag = _batch_value_and_grad(potential_batch)

    def init(position):
        u, g = vag(position)
        return BatchLangevinState(position, u, g, jnp.asarray(0, jnp.int32))

    def step(key, state):
        lr = sched(state.step)
        key_prop, key_mh = jax.random.split(key)
        G = precond if precond is not None else jax.tree.map(
            jnp.ones_like, state.position)

        noise = tree_random_normal(key_prop, state.position)
        proposal = jax.tree.map(
            lambda p, g, G_, n: p - lr * G_ * g
            - langevin_noise_scale(lr) * jnp.sqrt(G_) * n,
            state.position, state.grad, G, noise,
        )
        u_new, g_new = vag(proposal)

        log_alpha = state.potential - u_new                       # (C,)

        def weighted_sq(tree):
            return _tree_sum_squares_per_chain(jax.tree.map(
                lambda x, G_: x / jnp.sqrt(jnp.broadcast_to(G_, x.shape)),
                tree, G,
            ))

        rev = jax.tree.map(
            lambda po, pn, G_, gn: po - pn + lr * G_ * gn,
            state.position, proposal, G, g_new,
        )
        log_alpha += -1.0 / (4 * lr) * weighted_sq(rev)
        fwd = jax.tree.map(
            lambda pn, po, G_, go: pn - po + lr * G_ * go,
            proposal, state.position, G, state.grad,
        )
        log_alpha -= -1.0 / (4 * lr) * weighted_sq(fwd)

        C = log_alpha.shape[0]
        accept = jnp.isfinite(log_alpha) & (
            jnp.log(jax.random.uniform(key_mh, (C,))) < log_alpha
        )
        new_state = BatchLangevinState(
            position=_tree_where_per_chain(accept, proposal, state.position),
            potential=jnp.where(accept, u_new, state.potential),
            grad=_tree_where_per_chain(accept, g_new, state.grad),
            step=state.step + 1,
        )
        info = {"potential": new_state.potential, "accepted": accept,
                "step_size": lr}
        return new_state, info

    return TransitionKernel(init, step)


def psgld(potential_fn: Callable, step_size, alpha: float = 0.99,
          lambda_: float = 1e-5, add_noise: bool = True) -> TransitionKernel:
    """Preconditioned SGLD (Li et al. 2015).

    V <- alpha*V + (1-alpha)*g^2;  G = 1/(lambda + sqrt(V));
    theta' = theta - lr*G*g - sqrt(2*lr*G)*xi   (langevin.py:478-497).
    The Gamma curvature term is omitted, as in the reference (langevin.py
    deprecated Theano path).  The reference divides the loss by the data
    count N before backprop (langevin.py:528) — fold that into
    `potential_fn` if desired.
    """
    sched = schedules.resolve(step_size)
    value_and_grad = jax.value_and_grad(potential_fn)

    def init(position):
        u, g = value_and_grad(position)
        v = jax.tree.map(jnp.zeros_like, g)
        return PreconditionedState(position, u, g, v, jnp.asarray(0, jnp.int32))

    def step(key, state):
        lr = sched(state.step)
        v = jax.tree.map(
            lambda v_, g_: alpha * v_ + (1 - alpha) * g_**2, state.v, state.grad
        )
        G = jax.tree.map(lambda v_: 1.0 / (lambda_ + jnp.sqrt(v_)), v)
        if add_noise:
            noise = tree_random_normal(key, state.position)
            new_pos = jax.tree.map(
                lambda p, g_, G_, n: p - lr * G_ * g_
                - langevin_noise_scale(lr) * jnp.sqrt(G_) * n,
                state.position, state.grad, G, noise,
            )
        else:
            new_pos = jax.tree.map(
                lambda p, g_, G_: p - lr * G_ * g_, state.position, state.grad, G
            )
        u, g = value_and_grad(new_pos)
        info = {"potential": state.potential, "accepted": jnp.asarray(True),
                "step_size": lr}
        return PreconditionedState(new_pos, u, g, v, state.step + 1), info

    return TransitionKernel(init, step)


def asgld(potential_fn: Callable, step_size, alpha: float = 0.99,
          lambda_: float = 1e-5, add_noise: bool = True) -> TransitionKernel:
    """"Adaptively preconditioned" SGLD.

    The reference's aSGLD update (langevin.py:1514-1540) is byte-identical
    to pSGLD's (the intended Adam-like variant was never implemented, per
    README.md:18), so this is the same kernel; kept as a separate name for
    API parity.
    """
    return psgld(potential_fn, step_size, alpha, lambda_, add_noise)


class BatchLangevinState(NamedTuple):
    position: PyTree      # leaves carry a leading chain axis C
    potential: jax.Array  # (C,)
    grad: PyTree
    step: jax.Array


_batch_value_and_grad = batch_value_and_grad


def sgld_batched(potential_batch: Callable, step_size) -> TransitionKernel:
    """SGLD over an entire chain batch in one kernel step.

    `potential_batch(params)` maps leaves with a leading chain axis to a
    (C,) vector of potentials — the contract of fused batch potentials
    like ops.gp_rk4.make_fused_gp_potential, whose Pallas kernels need the
    whole batch in one call (per-chain vmap would defeat the fusion).
    Use with `sample_chain` (not `sample_chains`): the batch axis lives
    inside the state.  Same update rule as `sgld`; like `sgld`, the state
    carries (potential, grad) at the current position so each step costs
    exactly one fused forward+backward pass, and `info["potential"]` is
    the pre-step value.
    """
    sched = schedules.resolve(step_size)
    vag = _batch_value_and_grad(potential_batch)

    def init(position):
        u, g = vag(position)
        return BatchLangevinState(position, u, g, jnp.asarray(0, jnp.int32))

    def step(key, state):
        lr = sched(state.step)
        noise = tree_random_normal(key, state.position)
        new_pos = jax.tree.map(
            lambda p, g, n: p - lr * g - langevin_noise_scale(lr) * n,
            state.position, state.grad, noise,
        )
        u, g = vag(new_pos)
        info = {"potential": state.potential, "accepted": jnp.asarray(True),
                "step_size": lr}
        return BatchLangevinState(new_pos, u, g, state.step + 1), info

    return TransitionKernel(init, step)


def csgld_batched(potential_batch: Callable, lr0: float, num_cycles: int,
                  total_iters: int, beta: float = 0.25,
                  add_noise: bool = True) -> TransitionKernel:
    """Cyclical SGLD over an entire chain batch in one kernel step (the
    fused-potential contract of `sgld_batched`; update rule and phase
    gating of `csgld` / reference langevin.py:1600-1724): cosine step
    size over `num_cycles` cycles, pure gradient steps in the
    exploration phase (r <= beta), Langevin noise in the sampling phase.
    info["sampling_phase"] marks posterior-sample steps.  `add_noise`
    exists for deterministic equivalence tests only."""
    value_and_grad = _batch_value_and_grad(potential_batch)
    lr_fn = schedules.cyclical_cosine(lr0, num_cycles, total_iters)

    def init(position):
        u, g = value_and_grad(position)
        return BatchLangevinState(position, u, g, jnp.asarray(0, jnp.int32))

    def step(key, state):
        lr = lr_fn(state.step)
        r = schedules.cycle_position(state.step, num_cycles, total_iters)
        in_sampling = r > beta

        noise = tree_random_normal(key, state.position)
        scale = jnp.where(in_sampling & add_noise,
                          langevin_noise_scale(lr), 0.0)
        new_pos = jax.tree.map(
            lambda p, g, n: p - lr * g - scale * n,
            state.position, state.grad, noise,
        )
        u, g = value_and_grad(new_pos)
        info = {"potential": state.potential, "accepted": jnp.asarray(True),
                "step_size": lr, "sampling_phase": in_sampling}
        return BatchLangevinState(new_pos, u, g, state.step + 1), info

    return TransitionKernel(init, step)


class BatchPreconditionedState(NamedTuple):
    position: PyTree      # leaves carry a leading chain axis C
    potential: jax.Array  # (C,)
    grad: PyTree
    v: PyTree
    step: jax.Array


def psgld_preconditioner(state, lambda_: float = 1e-5,
                         chain_average: bool = True) -> PyTree:
    """Fixed diagonal metric G = 1/(lambda + sqrt(V)) from a pSGLD warmup
    state — the framework's validated protocol for running EXACT kernels
    on stiff posteriors: warm up with `psgld(_batched)`, freeze the
    preconditioner from the final state's V, and pass it as `precond` to
    `mala_batched` / `hmc(_batched)` / `nuts(_batched)` (a FIXED,
    position-independent metric keeps those chains exactly reversible).
    This is how the bias-validation cross-check ran preconditioned MALA
    on the fused GP posterior (see CLAUDE.md's sampler-bias protocol) —
    plain MALA/HMC acceptance collapses there at any useful step size.

    `chain_average` (batched states only): average G over the leading
    chain axis so every chain shares one metric; set False for per-chain
    states from `psgld` (no chain axis) or to keep per-chain metrics
    (each chain is then its own reversible kernel).
    """
    G = jax.tree.map(lambda v: 1.0 / (lambda_ + jnp.sqrt(v)), state.v)
    if chain_average:
        G = jax.tree.map(
            lambda g: jnp.broadcast_to(
                jnp.mean(g, axis=0, keepdims=True), g.shape), G)
    return G


def psgld_batched(potential_batch: Callable, step_size, alpha: float = 0.99,
                  lambda_: float = 1e-5, add_noise: bool = True
                  ) -> TransitionKernel:
    """pSGLD over an entire chain batch in one kernel step.

    Same update rule as `psgld` (langevin.py:478-497); the V/G
    preconditioner is elementwise, so with independent chains stacked on a
    leading axis the batched update is exactly the per-chain one.  Takes
    the fused batch-potential contract of `sgld_batched`; use with
    `sample_chain`.
    """
    sched = schedules.resolve(step_size)
    vag = _batch_value_and_grad(potential_batch)

    def init(position):
        u, g = vag(position)
        v = jax.tree.map(jnp.zeros_like, g)
        return BatchPreconditionedState(position, u, g, v,
                                        jnp.asarray(0, jnp.int32))

    def step(key, state):
        lr = sched(state.step)
        v = jax.tree.map(
            lambda v_, g_: alpha * v_ + (1 - alpha) * g_**2, state.v,
            state.grad,
        )
        G = jax.tree.map(lambda v_: 1.0 / (lambda_ + jnp.sqrt(v_)), v)
        if add_noise:
            noise = tree_random_normal(key, state.position)
            new_pos = jax.tree.map(
                lambda p, g_, G_, n: p - lr * G_ * g_
                - langevin_noise_scale(lr) * jnp.sqrt(G_) * n,
                state.position, state.grad, G, noise,
            )
        else:
            new_pos = jax.tree.map(
                lambda p, g_, G_: p - lr * G_ * g_, state.position,
                state.grad, G,
            )
        u, g = vag(new_pos)
        info = {"potential": state.potential, "accepted": jnp.asarray(True),
                "step_size": lr}
        return (
            BatchPreconditionedState(new_pos, u, g, v, state.step + 1),
            info,
        )

    return TransitionKernel(init, step)


class AdamSGLDState(NamedTuple):
    position: PyTree
    potential: jax.Array
    grad: PyTree
    m: PyTree
    v: PyTree
    step: jax.Array


def adam_sgld(potential_fn: Callable, step_size, beta1: float = 0.9,
              beta2: float = 0.999, a: float = 1.0, lambda_: float = 1e-8
              ) -> TransitionKernel:
    """Adam-preconditioned SGLD — the reference's intended aSGLD
    (README.md:18 lists "Adaptive SGLD (based on Adam)" as a TODO; its
    implementation duplicates pSGLD, langevin.py:1514-1540).

    Bias-corrected Adam moments precondition the Langevin drift
    (cf. arXiv:2504.18911):

        m <- beta1*m + (1-beta1)*g;  V <- beta2*V + (1-beta2)*g^2
        G = 1/(lambda + sqrt(V_hat))
        theta <- theta - lr*G*(g + a*m_hat) - sqrt(2*lr*G)*xi
    """
    return _adam_sgld_kernel(jax.value_and_grad(potential_fn), step_size,
                             beta1, beta2, a, lambda_)


def adam_sgld_batched(potential_batch: Callable, step_size,
                      beta1: float = 0.9, beta2: float = 0.999,
                      a: float = 1.0, lambda_: float = 1e-8
                      ) -> TransitionKernel:
    """`adam_sgld` on the fused batch-potential contract (`sgld_batched`):
    the Adam moments, bias corrections, drift, and noise scale are all
    elementwise, so the batched update is the per-chain rule verbatim over
    chain-major leaves with one fused forward+backward per step."""
    return _adam_sgld_kernel(_batch_value_and_grad(potential_batch),
                             step_size, beta1, beta2, a, lambda_)


def _adam_sgld_kernel(value_and_grad, step_size, beta1, beta2, a, lambda_
                      ) -> TransitionKernel:
    sched = schedules.resolve(step_size)

    def init(position):
        u, g = value_and_grad(position)
        z = jax.tree.map(jnp.zeros_like, g)
        return AdamSGLDState(position, u, g, z, z, jnp.asarray(0, jnp.int32))

    def step(key, state):
        lr = sched(state.step)
        t = state.step + 1
        m = jax.tree.map(lambda m_, g_: beta1 * m_ + (1 - beta1) * g_,
                         state.m, state.grad)
        v = jax.tree.map(lambda v_, g_: beta2 * v_ + (1 - beta2) * g_**2,
                         state.v, state.grad)
        bc1 = 1.0 - beta1**t.astype(jnp.float32)
        bc2 = 1.0 - beta2**t.astype(jnp.float32)
        noise = tree_random_normal(key, state.position)
        new_pos = jax.tree.map(
            lambda p, g_, m_, v_, n: p
            - lr * (g_ + a * m_ / bc1) / (lambda_ + jnp.sqrt(v_ / bc2))
            - langevin_noise_scale(lr)
            * jnp.sqrt(1.0 / (lambda_ + jnp.sqrt(v_ / bc2))) * n,
            state.position, state.grad, m, v, noise,
        )
        u, g = value_and_grad(new_pos)
        info = {"potential": state.potential, "accepted": jnp.asarray(True),
                "step_size": lr}
        return AdamSGLDState(new_pos, u, g, m, v, t), info

    return TransitionKernel(init, step)


class CyclicalState(NamedTuple):
    position: PyTree
    potential: jax.Array
    grad: PyTree
    step: jax.Array


def csgld(potential_fn: Callable, lr0: float, num_cycles: int,
          total_iters: int, beta: float = 0.25,
          add_noise: bool = True) -> TransitionKernel:
    """Cyclical SGLD (Zhang et al. 2020; reference langevin.py:1600-1724).

    Cosine step size over `num_cycles` cycles; exploration phase
    (r <= beta) takes pure gradient steps, sampling phase (r > beta) adds
    Langevin noise.  info["sampling_phase"] marks steps whose positions are
    posterior samples (the reference records None during exploration,
    langevin.py:1702-1710 — with fixed shapes, mask instead).  `add_noise`
    exists for deterministic equivalence tests only.
    """
    value_and_grad = jax.value_and_grad(potential_fn)
    lr_fn = schedules.cyclical_cosine(lr0, num_cycles, total_iters)

    def init(position):
        u, g = value_and_grad(position)
        return CyclicalState(position, u, g, jnp.asarray(0, jnp.int32))

    def step(key, state):
        lr = lr_fn(state.step)
        r = schedules.cycle_position(state.step, num_cycles, total_iters)
        in_sampling = r > beta

        noise = tree_random_normal(key, state.position)
        new_pos = jax.tree.map(
            lambda p, g, n: p - lr * g
            - jnp.where(in_sampling & add_noise,
                        langevin_noise_scale(lr), 0.0) * n,
            state.position, state.grad, noise,
        )
        u, g = value_and_grad(new_pos)
        info = {"potential": state.potential, "accepted": jnp.asarray(True),
                "step_size": lr, "sampling_phase": in_sampling}
        return CyclicalState(new_pos, u, g, state.step + 1), info

    return TransitionKernel(init, step)


class MMALAState(NamedTuple):
    position: PyTree
    potential: jax.Array
    grad: PyTree
    metric: jax.Array          # (P, P) on the flattened parameter vector
    inv_metric: jax.Array      # (P, P)
    sqrtinv_metric: jax.Array  # (P, P)
    logdet_metric: jax.Array
    step: jax.Array


def mmala(potential_fn: Callable, step_size, metric_fn: Callable,
          add_noise: bool = True) -> TransitionKernel:
    """Manifold MALA (Girolami & Calderhead; reference langevin.py:260-420).

    `metric_fn(position) -> dict` must provide 'Metric', 'invMetric' and
    'sqrtinvMetric' (P, P) matrices on the flattened parameter vector (see
    metrics.softabs_metric / hessian_metric / identity_metric).

    Proposal (langevin.py:318-321):
        theta' = theta - lr*Minv*grad - sqrt(2*lr)*Msqinv*xi
    so q(theta'|theta) = N(theta - lr*Minv*grad, 2*lr*Minv).

    Deliberate fix vs the reference: its MH correction weights the
    quadratic forms with invMetric and drops the log-det ratio
    (langevin.py:348-358) — the proposal covariance is 2*lr*Minv, so the
    Gaussian exponent must be weighted by the *metric* and, with a
    position-dependent metric, the 1/2 log det M terms do not cancel.  The
    reference's error is masked by its SoftAbsMetric returning the metric
    under the 'invMetric' key (metrics.py:66-68); the corrected pair here
    leaves the target distribution exactly invariant (verified by moment
    tests on exact Gaussians).
    """
    sched = schedules.resolve(step_size)
    value_and_grad = jax.value_and_grad(potential_fn)

    def eval_metric(position):
        m = metric_fn(position)
        if "log_det_sqrt" in m:
            logdet = 2.0 * m["log_det_sqrt"]
        else:
            logdet = jnp.linalg.slogdet(m["Metric"])[1]
        return m["Metric"], m["invMetric"], m["sqrtinvMetric"], logdet

    def init(position):
        u, g = value_and_grad(position)
        M, Minv, Msqinv, logdet = eval_metric(position)
        return MMALAState(position, u, g, M, Minv, Msqinv, logdet,
                          jnp.asarray(0, jnp.int32))

    def step(key, state):
        lr = sched(state.step)
        key_prop, key_mh = jax.random.split(key)

        theta, unravel = ravel_pytree(state.position)
        grad_vec, _ = ravel_pytree(state.grad)

        xi = jax.random.normal(key_prop, theta.shape, theta.dtype)
        theta_new = (
            theta
            - lr * state.inv_metric @ grad_vec
            - langevin_noise_scale(lr) * state.sqrtinv_metric @ xi
        )
        proposal = unravel(theta_new)
        u_new, g_new = value_and_grad(proposal)
        grad_new_vec, _ = ravel_pytree(g_new)
        M_new, Minv_new, Msqinv_new, logdet_new = eval_metric(proposal)

        if add_noise:
            log_alpha = state.potential - u_new
            # log q(theta | theta'): metric and drift at the proposal
            rev = theta - theta_new + lr * Minv_new @ grad_new_vec
            log_alpha += 0.5 * logdet_new - 1.0 / (4 * lr) * rev @ (M_new @ rev)
            # log q(theta' | theta): metric and drift at the current point
            fwd = theta_new - theta + lr * state.inv_metric @ grad_vec
            log_alpha -= (
                0.5 * state.logdet_metric
                - 1.0 / (4 * lr) * fwd @ (state.metric @ fwd)
            )
            accept = jnp.isfinite(log_alpha) & (
                jnp.log(jax.random.uniform(key_mh)) < log_alpha
            )
        else:
            accept = jnp.asarray(True)

        new_state = MMALAState(
            position=tree_where(accept, proposal, state.position),
            potential=jnp.where(accept, u_new, state.potential),
            grad=tree_where(accept, g_new, state.grad),
            metric=jnp.where(accept, M_new, state.metric),
            inv_metric=jnp.where(accept, Minv_new, state.inv_metric),
            sqrtinv_metric=jnp.where(accept, Msqinv_new, state.sqrtinv_metric),
            logdet_metric=jnp.where(accept, logdet_new, state.logdet_metric),
            step=state.step + 1,
        )
        info = {"potential": new_state.potential, "accepted": accept,
                "step_size": lr}
        return new_state, info

    return TransitionKernel(init, step)
