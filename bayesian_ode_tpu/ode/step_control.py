"""Error norms and step-size control for the adaptive solvers.

Pure functions of pytree states; all data-dependent branching is expressed
with `jnp.where` so the controller runs inside `lax.while_loop`/`lax.scan`
and under `vmap` (one independent controller per batched chain).

Behavioral parity targets (reference file:line):
  - error ratio:        torchdiffeq/_impl/misc.py:146-157
  - optimal step size:  torchdiffeq/_impl/misc.py:160-170
  - initial step:       torchdiffeq/_impl/misc.py:84-143 (Hairer II.4)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.pytree import PyTree, tree_rms_norm


def error_ratio(y1_error: PyTree, rtol, atol, y0: PyTree, y1: PyTree,
                ulp_floor: float = 32.0, norm_weights: PyTree = None):
    """Scalar squared error ratio for accept/reject and step control.

    norm_weights: optional pytree of per-leaf Python-float weights (same
    structure as the state); each leaf's mean-square ratio is scaled by
    its weight before the max-reduction, so weight 0.0 excludes a leaf
    from error control entirely.  This is the mechanism behind the
    adjoint seminorm (odeint_adjoint adjoint_options={"norm":
    "seminorm"}, after upstream torchdiffeq / Kidger et al., "Hey,
    that's not an ODE": accumulated parameter-gradient leaves need not
    be error-controlled — they are integrals of the already-controlled
    (y, a_y) and only consume steps).

    Per leaf: mean((err / (atol + rtol * max(|y0|, |y1|)))^2); the scalar
    used for control is the max over leaves.  For single-array state this is
    exactly the reference's mean-square ratio (misc.py:146-157 with the
    accept test at dopri5.py:110-111 and max-reduction at misc.py:161).

    TPU f32 addition: the tolerance is floored at `ulp_floor` ulps of the
    state magnitude.  Below that floor the error *estimate* is pure
    rounding noise of the stage combination, and the controller would
    otherwise collapse dt trying to resolve it (measured: ~170x NFE
    inflation for rtol=1e-7 in f32 on the Van der Pol GP field).  With the
    compensated carry (AdaptiveConfig.compensated) the accumulated-state
    rounding is removed and a lower floor (4 ulps) is safe.  In f64 the
    floor (~1e-14 * |y|) sits far beneath every tested tolerance, so the
    strict CPU accuracy gates are unaffected.
    """

    def leaf_ratio(e, a, b):
        mag = jnp.maximum(jnp.abs(a), jnp.abs(b))
        tol = atol + rtol * mag
        ulps = ulp_floor * jnp.finfo(e.dtype).eps
        tol = jnp.maximum(tol, ulps * mag)
        return jnp.mean(jnp.square(e / tol))

    if norm_weights is None:
        ratios = jax.tree.map(leaf_ratio, y1_error, y0, y1)
    else:
        ratios = jax.tree.map(
            lambda e, a, b, w: leaf_ratio(e, a, b) * w,
            y1_error, y0, y1, norm_weights,
        )
    leaves = jax.tree.leaves(ratios)
    out = leaves[0]
    for r in leaves[1:]:
        out = jnp.maximum(out, r)
    return out


def optimal_step_size(last_step, mean_sq_error_ratio, safety=0.9, ifactor=10.0,
                      dfactor=0.2, order=5):
    """Next step size from the squared error ratio.

    dt' = dt / clip(sqrt(r)^(1/order) / safety, 1/ifactor, 1/dfactor), with
    dfactor disabled (set to 1) when the step was accepted (r < 1), and
    dt' = dt * ifactor when r == 0.  Mirrors misc.py:160-170.
    """
    r = mean_sq_error_ratio
    dfactor = jnp.where(r < 1.0, 1.0, dfactor)
    # Guard the exponent against r == 0; that branch is overridden below.
    err = jnp.sqrt(jnp.maximum(r, jnp.finfo(last_step.dtype).tiny))
    exponent = jnp.asarray(1.0 / order, last_step.dtype)
    factor = jnp.maximum(1.0 / ifactor, jnp.minimum(err**exponent / safety, 1.0 / dfactor))
    dt = last_step / factor
    return jnp.where(r == 0.0, last_step * ifactor, dt)


def pi_step_size(last_step, mean_sq_error_ratio, err_prev, accept,
                 safety=0.9, ifactor=10.0, dfactor=0.2, order=5,
                 beta1=0.6, beta2=-0.2):
    """Gustafsson/Soderlind PI step controller (PI.4.2 coefficients).

    Accepted steps use two-error memory,
        dt' = dt * clip(safety * err^(-beta1/q) * err_prev^(-beta2/q)),
    which damps the I-controller's oscillation between over- and
    under-shooting near the accuracy boundary (Hairer & Wanner IV.2;
    Soderlind 2002).  Rejected steps fall back to the plain I-controller
    formula (standard practice: the PI history is unreliable mid-reject).
    `err_prev` is the sqrt error ratio of the LAST ACCEPTED step (1.0
    initially); the clip bounds and r == 0 growth branch match
    `optimal_step_size` so the controllers differ only in memory.

    Not reference behavior (torchdiffeq has no PI memory) — opt-in via
    AdaptiveConfig.controller == "pi".  Measured: on the f64 Van der Pol
    ODE at rtol=1e-7, 2.9x fewer rejected steps and ~4% lower NFE at
    equal trajectory error; on the f32 VDP GP posterior (fused kernel,
    rtol=1e-7) rejections drop 7.5x (9.7 -> 1.3 per solve) but convert
    into smaller accepted steps — NFE and throughput unchanged.  Use it
    for smoother step sequences / fewer wasted evaluations on
    rejection-heavy problems, not as a throughput lever on this one.
    """
    r = mean_sq_error_ratio
    q = order
    err = jnp.sqrt(jnp.maximum(r, jnp.finfo(last_step.dtype).tiny))
    err = err.astype(last_step.dtype)
    ep = jnp.maximum(err_prev, jnp.finfo(last_step.dtype).tiny)

    factor_acc = safety * err ** (-beta1 / q) * ep ** (-beta2 / q)
    dt_acc = last_step * jnp.clip(factor_acc, dfactor, ifactor)

    dfac_rej = jnp.asarray(dfactor, last_step.dtype)
    factor_rej = jnp.maximum(
        1.0 / ifactor,
        jnp.minimum(err ** (1.0 / q) / safety, 1.0 / dfac_rej),
    )
    dt_rej = last_step / factor_rej

    dt = jnp.where(accept, dt_acc, dt_rej)
    return jnp.where(r == 0.0, last_step * ifactor, dt)


def select_initial_step(func, t0, y0: PyTree, order, rtol, atol, f0: PyTree):
    """Empirical initial step selection (Hairer, Norsett & Wanner II.4).

    Branch-free translation of misc.py:84-143: the `.item()` comparisons
    become `jnp.where` selects so the heuristic is jittable and vmappable.
    Costs one extra RHS evaluation (as in the reference).
    """
    scale = jax.tree.map(lambda y: atol + jnp.abs(y) * rtol, y0)
    # Global RMS norms over the whole state (Hairer's d0/d1/d2).  Deliberate
    # deviation from the reference, which takes per-tuple-element norms and
    # the max of per-element d0/d1 ratios (misc.py:122-127): that ratio is
    # inf for any component with zero initial derivative — e.g. the
    # augmented adjoint state's constant a_t — and collapses the backward
    # solve.  For single-array states (all reference tests) the two forms
    # coincide.
    d0 = tree_rms_norm(jax.tree.map(lambda y, s: y / s, y0, scale))
    d1 = tree_rms_norm(jax.tree.map(lambda f, s: f / s, f0, scale))

    small = (d0 < 1e-5) | (d1 < 1e-5)
    h0 = jnp.where(
        small, jnp.asarray(1e-6, t0.dtype), 0.01 * d0 / jnp.maximum(d1, _tiny(d1))
    )

    y1 = jax.tree.map(lambda y, f: y + h0 * f, y0, f0)
    f1 = func(t0 + h0, y1)
    d2 = tree_rms_norm(jax.tree.map(lambda a, b, s: (a - b) / s, f1, f0, scale)) / h0

    flat = (d1 <= 1e-15) & (d2 <= 1e-15)
    h1_flat = jnp.maximum(jnp.asarray(1e-6, h0.dtype), h0 * 1e-3)
    d12 = jnp.maximum(d1, d2)
    h1_steep = (0.01 / jnp.maximum(d12, _tiny(d12))) ** (1.0 / (order + 1.0))
    h1 = jnp.where(flat, h1_flat, h1_steep)

    return jnp.minimum(100 * h0, h1).astype(t0.dtype)


def _tiny(x):
    return jnp.finfo(x.dtype).tiny
