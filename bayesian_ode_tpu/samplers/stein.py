"""Stein Variational Gradient Descent (SVGD), completed.

The reference's SVGD is a stub — `eval_stein_grad`/`step` reference
undefined attributes and README.md:31 lists it as TODO (stein.py:72-107).
This is a full implementation of Liu & Wang (2016) over particle ensembles:

    phi(x_i) = (1/n) sum_j [ k(x_j, x_i) * score(x_j) + grad_{x_j} k(x_j, x_i) ]
    x_i <- x_i + lr * phi(x_i)

with the RBF kernel and median-heuristic bandwidth of the reference's
`RBFKernel` (stein.py:22-34): gamma = 1/(1e-8 + 2 sigma^2),
sigma^2 = median(d^2) / (2 log(n+1)), median computed by sort under jit —
exactly for ensembles up to `median_subsample` (default 256), on a
first-k-rows submatrix above that (the exact n^2 sort is ~43 ms at 4096
particles on a v5e, 20x the fused score pass; see rbf_bandwidth).

The n x n kernel matrix runs through an optionally Pallas-tiled pairwise
kernel (ops/pallas_rbf.py) on TPU; the multi-chip path all-gathers
particles over the mesh 'particle' axis (parallel/chains.py), the one
genuinely communicating algorithm in the suite (SURVEY.md §2.9).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..utils.pytree import ravel_pytree
from . import schedules
from .base import TransitionKernel


def rbf_bandwidth(X: jax.Array, sigma: Optional[float] = None,
                  median_subsample: Optional[int] = None):
    """gamma for the RBF kernel: 1/(1e-8 + 2 sigma^2) when sigma is given,
    else the median heuristic sigma^2 = median(d^2) / (2 log(n+1))
    (stein.py:22-34).

    The exact median sorts all n^2 pairwise distances on device — at 4096
    particles that sort is ~43 ms on a v5e, 20x the fused score pass
    (measured 2026-08-20).  `median_subsample=k` computes the median on the
    first-k-rows d^2 submatrix instead (k^2 pairs): particles are
    exchangeable, so this is a plain k^2-pair sample of the distance
    distribution — measured within ~2% of the exact bandwidth at k=256 —
    while log(n+1) keeps the TRUE ensemble size.  None = exact.
    """
    if sigma is not None:
        return 1.0 / (1e-8 + 2.0 * jnp.asarray(sigma) ** 2)
    n = X.shape[0]
    if median_subsample is None or n <= median_subsample:
        sub = X
    else:
        # STRIDED rows, not the first k: structured inits (meshgrid /
        # per-mode-contiguous / shard-major layouts) are not exchangeable
        # in their leading rows, and a first-k slice would median one
        # corner of the cloud (ADVICE r3).  A fixed stride samples the
        # whole layout deterministically (jit-safe, no RNG plumbing).
        stride = -(-n // median_subsample)          # ceil(n / k)
        sub = X[::stride][:median_subsample]
    d2 = pairwise_sq_dists(sub, sub)
    h = jnp.median(d2) / (2.0 * jnp.log(n + 1.0))
    return 1.0 / (1e-8 + 2.0 * h)


def rbf_kernel(X: jax.Array, Y: jax.Array, sigma: Optional[float] = None):
    """K[i, j] = exp(-gamma * ||X_i - Y_j||^2); returns (K, gamma).

    Median-heuristic bandwidth when sigma is None: the median is taken
    over the SAME d2(X, Y) matrix the kernel is applied to (the reference
    RBFKernel's behavior, stein.py:22-34) with n = X.shape[0] in the
    log term — exact, no subsampling (this utility is not on the SVGD
    hot path; svgd/svgd_batched use rbf_bandwidth's bounded median).
    """
    d2 = pairwise_sq_dists(X, Y)
    if sigma is not None:
        gamma = 1.0 / (1e-8 + 2.0 * jnp.asarray(sigma) ** 2)
    else:
        h = jnp.median(d2) / (2.0 * jnp.log(X.shape[0] + 1.0))
        gamma = 1.0 / (1e-8 + 2.0 * h)
    return jnp.exp(-gamma * d2), gamma


def pairwise_sq_dists(X, Y):
    """||x_i - y_j||^2 via the MXU-friendly norm expansion (one matmul
    instead of an (n, n, d) broadcast)."""
    xx = jnp.sum(X * X, axis=1)
    yy = jnp.sum(Y * Y, axis=1)
    cross = X @ Y.T
    return jnp.maximum(xx[:, None] + yy[None, :] - 2.0 * cross, 0.0)


def svgd_direction(particles: jax.Array, scores: jax.Array,
                   sigma: Optional[float] = None,
                   median_subsample: Optional[int] = None):
    """phi(X) for particles (n, d) and score(X) = -grad U (n, d).

    grad_{x_j} k(x_j, x_i) = 2 gamma (x_i - x_j) k(x_j, x_i), summed over j:
    sum_j grad K = 2 gamma (x_i * sum_j K_ij - sum_j K_ij x_j) — computed
    with matmuls (no autograd pass needed, unlike stein.py:75-86).
    `median_subsample` bounds the bandwidth median's sort (rbf_bandwidth);
    None = exact over all n^2 pairs.
    """
    n = particles.shape[0]
    gamma = rbf_bandwidth(particles, sigma, median_subsample)
    K = jnp.exp(-gamma * pairwise_sq_dists(particles, particles))
    ksum = jnp.sum(K, axis=1)
    grad_K = 2.0 * gamma * (particles * ksum[:, None] - K @ particles)
    return (K @ scores + grad_K) / n


class SVGDState(NamedTuple):
    particles: jax.Array   # (n, P) flattened particle positions
    step: jax.Array
    accum: Optional[jax.Array] = None   # AdaGrad accumulator (adagrad=True)

    @property
    def position(self):
        return self.particles


def _svgd_init(position, adagrad, unravel_ref):
    if isinstance(position, jax.Array) and position.ndim == 2:
        unravel_ref[0] = lambda v: v
        flat = position
    else:
        flat = jax.vmap(lambda p: ravel_pytree(p)[0])(position)
        unravel_ref[0] = ravel_pytree(
            jax.tree.map(lambda x: x[0], position))[1]
    accum = jnp.zeros_like(flat) if adagrad else None
    return SVGDState(flat, jnp.asarray(0, jnp.int32), accum)


def _svgd_apply(state, phi, lr, adagrad, alpha=0.9, fudge=1e-6):
    """x <- x + lr * phi, optionally AdaGrad-normalized per coordinate
    (historical_grad = alpha*hist + (1-alpha)*phi^2, first step seeds
    hist = phi^2) — the step control of Liu & Wang's published SVGD
    implementation, needed because raw ODE-posterior scores span ~5
    orders of magnitude across coordinates (the reference's stein.py stub
    never reached the update step, so the completed kernel follows the
    paper's own recipe)."""
    if not adagrad:
        return SVGDState(state.particles + lr * phi, state.step + 1, None)
    hist = jnp.where(state.step == 0, phi * phi,
                     alpha * state.accum + (1.0 - alpha) * phi * phi)
    adj = phi / (fudge + jnp.sqrt(hist))
    return SVGDState(state.particles + lr * adj, state.step + 1, hist)


def svgd(potential_fn: Callable, step_size, sigma: Optional[float] = None,
         use_pallas: str = "auto", median_subsample: Optional[int] = 256,
         adagrad: bool = False) -> TransitionKernel:
    """SVGD kernel over a particle ensemble.

    `init` takes a pytree template whose leaves have a leading particle
    axis (n, ...); internally particles are flattened to (n, P).  The
    per-particle score is -grad potential_fn (vmapped); the potential
    values ride the same fused forward+backward pass (value_and_grad), so
    `info["potential"]` reports the PRE-update ensemble mean (the
    post-update value would cost a second full potential evaluation per
    step — measured at ~0.2-3 ms/step on the GP posterior, 2026-08-20).

    use_pallas: "auto" switches to the tiled Pallas TPU kernel
    (ops/pallas_rbf.py) for >= 4096 particles on TPU — it streams the
    n x n kernel matrix through VMEM tiles instead of materializing it in
    HBM.  "never"/"always" force the choice.

    median_subsample bounds the median-heuristic bandwidth sort
    (rbf_bandwidth): exact for ensembles up to that size, a
    first-k-rows-submatrix estimate above it (the exact n^2-pair sort
    dominates the whole step beyond ~1k particles).  None = always exact.

    adagrad=True applies Liu & Wang's AdaGrad-with-momentum step control
    (see _svgd_apply) — required on raw ODE posteriors, whose score
    scales vary too much across coordinates for a global step size.
    """
    sched = schedules.resolve(step_size)

    # Set by init (host-side); identity when particles are already flat
    # (n, P) arrays and potential_fn takes flat vectors.
    unravel_ref = [lambda v: v]

    def init(position):
        return _svgd_init(position, adagrad, unravel_ref)

    def step(key, state):
        lr = sched(state.step)
        unravel = unravel_ref[0]
        vg = jax.value_and_grad(lambda v: potential_fn(unravel(v)))
        pots, grads = jax.vmap(vg)(state.particles)
        phi = _phi_dispatch(state.particles, -grads, sigma, use_pallas,
                            median_subsample)
        new_state = _svgd_apply(state, phi, lr, adagrad)
        info = {"potential": jnp.mean(pots), "accepted": jnp.asarray(True),
                "step_size": lr}
        return new_state, info

    return TransitionKernel(init, step)


def _phi_dispatch(particles, scores, sigma, use_pallas, median_subsample):
    """phi(X) routed to the tiled Pallas kernel for large TPU ensembles
    (>= 4096 particles on 'auto'; ops/pallas_rbf.py streams the n x n
    kernel matrix through VMEM tiles), else the matmul formulation."""
    n = particles.shape[0]
    if use_pallas == "always":
        pallas = True
    elif use_pallas == "never":
        pallas = False
    else:
        pallas = n >= 4096 and jax.default_backend() not in ("cpu",)
    if not pallas:
        return svgd_direction(particles, scores, sigma, median_subsample)
    from ..ops.pallas_rbf import svgd_phi_pallas

    gamma = rbf_bandwidth(particles, sigma, median_subsample)
    return svgd_phi_pallas(particles, scores, gamma)


def svgd_batched(potential_batch: Callable, step_size,
                 sigma: Optional[float] = None, use_pallas: str = "auto",
                 median_subsample: Optional[int] = 256,
                 adagrad: bool = False) -> TransitionKernel:
    """SVGD whose scores come from a BATCHED potential — leaves carry a
    leading particle axis (n, ...) and the potential returns (n,) — so the
    whole ensemble's score pass is ONE fused forward+backward when paired
    with the Pallas batch potentials (ops/gp_rk4.make_fused_gp_potential,
    ops/gp_dopri5_grad.make_fused_gp_potential_dopri5, ops/mlp_rk4).

    Same update as `svgd` (Liu & Wang phi with the reference's RBF
    median-heuristic kernel, stein.py:22-34, the same bounded-median
    bandwidth via `median_subsample`, the same pre-update
    `info["potential"]` riding the score pass, and the same optional
    AdaGrad step control); only the score plumbing differs.
    BASELINE.json configs[4] is this kernel at 64-1024 particles (plus
    the >= 4096 Pallas-tile regime)."""
    sched = schedules.resolve(step_size)
    unravel_ref = [lambda v: v]

    def init(position):
        return _svgd_init(position, adagrad, unravel_ref)

    def step(key, state):
        lr = sched(state.step)
        unravel = unravel_ref[0]

        def pot_sum(flat):
            return jnp.sum(potential_batch(jax.vmap(unravel)(flat)))

        total, grads = jax.value_and_grad(pot_sum)(state.particles)
        phi = _phi_dispatch(state.particles, -grads, sigma, use_pallas,
                            median_subsample)
        new_state = _svgd_apply(state, phi, lr, adagrad)
        info = {"potential": total / state.particles.shape[0],
                "accepted": jnp.asarray(True), "step_size": lr}
        return new_state, info

    return TransitionKernel(init, step)
