"""Continuous normalizing flows (FFJORD) on the odeint stack.

Beyond the vendored reference: upstream torchdiffeq ships a CNF example
(Chen et al. 2018 "Neural ODEs" §4; Grathwohl et al. 2019 FFJORD), but the
vendored copy carries only ode_demo / odenet_mnist / latent_ode
(/root/reference/neuralode_examples).  This implements the family
TPU-natively:

- the whole batch integrates as ONE augmented ODE (batch is a leading
  axis; the adaptive controller sees the joint error norm, exactly like
  FFJORD's batched solves) — no per-sample Python loops;
- the instantaneous-change-of-variables trace term
  d log p(z(t))/dt = -tr(∂f/∂z) is computed either EXACTLY
  (`trace="exact"`: jacfwd, D forward passes — right for the low-D toy
  densities this family is demonstrated on) or with the Hutchinson
  estimator (`trace="hutchinson"`: one vjp against a Rademacher probe
  held fixed for the whole solve, FFJORD §2.2) — both batched, both
  MXU-shaped matmuls;
- everything is jit/vmap/grad/pjit-transparent; training gradients flow
  through `odeint_adjoint` (continuous adjoint) or discrete backprop
  (`options={"mode": "bounded"}` / fixed-grid `rk4`), the caller's
  choice via `odeint_fn`.

Conventions: the BASE distribution (standard normal by default) lives at
`t0`, the DATA at `t1`.  `log_prob` integrates data -> base (t1 down to
t0, a decreasing concrete time grid); `sample_cnf` integrates base -> data.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ode import odeint
from ..utils.pytree import tree_sum_squares
from .mlp import init_mlp


def init_cnf_mlp(key, dim: int, hidden: Sequence[int] = (64, 64)):
    """Params for the time-concat MLP field `cnf_field`.

    Layers (dim+1, *hidden, dim) with the package MLP init
    (uniform(-0.5, 0.5) weights), except the LAST layer is zeroed so the
    initial flow is exactly the identity: log_prob(x) starts at the base
    log-density and training deforms it smoothly (standard CNF practice;
    a large random initial field makes the first solves needlessly
    stiff)."""
    params = init_mlp(key, (dim + 1, *hidden, dim))
    params[-1] = jax.tree.map(jnp.zeros_like, params[-1])
    return params


def cnf_field(params, t, x, precision=None):
    """f(t, x) for x (..., D): tanh MLP on [x, t] (time concatenated as a
    trailing feature, the `concat` conditioning of the FFJORD toy nets).

    tanh (not ELU) keeps the field C-infinity — adaptive solvers see no
    spurious curvature kinks from activation creases."""
    tt = jnp.broadcast_to(jnp.asarray(t, x.dtype), x.shape[:-1] + (1,))
    h = jnp.concatenate([x, tt], axis=-1)
    for layer in params[:-1]:
        h = jnp.tanh(jnp.matmul(h, layer["w"], precision=precision)
                     + layer["b"])
    last = params[-1]
    return jnp.matmul(h, last["w"], precision=precision) + last["b"]


def _trace_exact(f_row: Callable, z: jax.Array) -> jax.Array:
    """tr(∂f/∂z) for one sample z (D,) — D forward-mode passes."""
    return jnp.trace(jax.jacfwd(f_row)(z))


def _trace_hutchinson(f_row: Callable, z: jax.Array,
                      v: jax.Array) -> jax.Array:
    """Hutchinson estimate v^T (∂f/∂z) v, one reverse-mode pass.  Unbiased
    over Rademacher v; FFJORD holds v fixed for the whole solve so the
    log-density estimate stays a single consistent functional."""
    _, vjp = jax.vjp(f_row, z)
    return jnp.sum(vjp(v)[0] * v)


def augmented_field(field: Callable, trace: str = "exact",
                    probes: Optional[jax.Array] = None) -> Callable:
    """The FFJORD augmented dynamics over state (z (B, D), l (B,)):

        dz/dt = f(t, z),   dl/dt = tr(∂f/∂z)   (per sample)

    so l accumulates the signed log-density change along the trajectory
    whichever direction time runs.  `probes` (B, D) is required for
    trace="hutchinson"."""
    if trace == "hutchinson" and probes is None:
        raise ValueError("trace='hutchinson' needs fixed probes (B, D); "
                         "draw them once per solve (rademacher)")
    if trace not in ("exact", "hutchinson"):
        raise ValueError(f"unknown trace estimator: {trace!r}")

    def aug(t, state):
        z, _ = state
        f_row = lambda zi: field(t, zi)
        dz = field(t, z)
        if trace == "exact":
            tr = jax.vmap(lambda zi: _trace_exact(f_row, zi))(z)
        else:
            tr = jax.vmap(lambda zi, vi: _trace_hutchinson(f_row, zi, vi))(
                z, probes)
        return dz, tr

    return aug


def standard_normal_logpdf(z: jax.Array) -> jax.Array:
    """log N(z; 0, I) summed over the trailing axis."""
    d = z.shape[-1]
    return -0.5 * jnp.sum(z * z, axis=-1) - 0.5 * d * jnp.log(2.0 * jnp.pi)


def rademacher(key, shape, dtype=jnp.float32):
    return jax.random.rademacher(key, shape, dtype)


def cnf_log_prob(field: Callable, x: jax.Array, t0: float = 0.0,
                 t1: float = 1.0, odeint_fn: Optional[Callable] = None,
                 trace: str = "exact", key=None,
                 base_logpdf: Callable = standard_normal_logpdf,
                 return_z0: bool = False):
    """log p(x) under the CNF: integrate (z, l) from t1 (data) back to t0
    (base) and apply instantaneous change of variables,

        log p(x) = base_logpdf(z(t0)) + l(t0),   l(t1) = 0, dl/dt = tr.

    x: (B, D).  `odeint_fn(func, y0, ts)` defaults to dopri5 at
    rtol=1e-5/atol=1e-7 (FFJORD's toy setting); pass
    partial(odeint, method="rk4", options={"step_size": h}) for fixed-grid
    discrete backprop or odeint_adjoint for the continuous adjoint.
    trace="hutchinson" draws one Rademacher probe per sample from `key`.
    """
    if odeint_fn is None:
        odeint_fn = partial(odeint, rtol=1e-5, atol=1e-7)
    probes = None
    if trace == "hutchinson":
        if key is None:
            raise ValueError("trace='hutchinson' needs a PRNG key")
        probes = rademacher(key, x.shape, x.dtype)
    aug = augmented_field(field, trace, probes)
    # numpy (host) time grid: stays concrete inside jit traces so the
    # decreasing data->base direction resolves statically and fixed-grid
    # `step_size` keeps static endpoints (odeint._check_and_canonicalize)
    ts = np.asarray([t1, t0], jax.dtypes.canonicalize_dtype(x.dtype))
    zs, ls = odeint_fn(aug, (x, jnp.zeros(x.shape[:-1], x.dtype)), ts)
    z0, l0 = zs[-1], ls[-1]
    logp = base_logpdf(z0) + l0
    return (logp, z0) if return_z0 else logp


def sample_cnf(field: Callable, key, num: int, dim: int, t0: float = 0.0,
               t1: float = 1.0, odeint_fn: Optional[Callable] = None,
               trace: Optional[str] = None,
               base_logpdf: Callable = standard_normal_logpdf):
    """Draw `num` samples: z0 ~ N(0, I) at t0, integrate forward to t1.

    trace=None (default) skips the trace accumulation (pure sampling);
    trace="exact"/"hutchinson" also returns log p(x) of the draws,
    log p(x) = base_logpdf(z0) - l(t1)."""
    if odeint_fn is None:
        odeint_fn = partial(odeint, rtol=1e-5, atol=1e-7)
    kz, kp = jax.random.split(key)
    z0 = jax.random.normal(kz, (num, dim))
    ts = np.asarray([t0, t1], jax.dtypes.canonicalize_dtype(z0.dtype))
    if trace is None:
        zs = odeint_fn(lambda t, z: field(t, z), z0, ts)
        return zs[-1]
    probes = rademacher(kp, z0.shape, z0.dtype) \
        if trace == "hutchinson" else None
    aug = augmented_field(field, trace, probes)
    zs, ls = odeint_fn(aug, (z0, jnp.zeros(num, z0.dtype)), ts)
    return zs[-1], base_logpdf(z0) - ls[-1]


def make_nll(x: jax.Array, field_of_params: Callable = cnf_field,
             t0: float = 0.0, t1: float = 1.0,
             odeint_fn: Optional[Callable] = None, trace: str = "exact",
             key=None) -> Callable:
    """nll(params) = -mean_i log p(x_i): the CNF maximum-likelihood
    objective.  Differentiable w.r.t. params through whatever `odeint_fn`
    supports (see cnf_log_prob)."""
    x = jnp.asarray(x)

    def nll(params):
        field = lambda t, z: field_of_params(params, t, z)
        return -jnp.mean(cnf_log_prob(field, x, t0, t1, odeint_fn, trace,
                                      key))

    return nll


def make_potential(x: jax.Array, field_of_params: Callable = cnf_field,
                   reg: float = 1e-2, t0: float = 0.0, t1: float = 1.0,
                   odeint_fn: Optional[Callable] = None,
                   trace: str = "exact", key=None) -> Callable:
    """Bayesian CNF potential: -sum_i log p(x_i | params) + reg * ||params||^2
    (Gaussian weight prior), the same closure contract every sampler in
    `samplers/` consumes — posterior uncertainty over the FLOW itself."""
    x = jnp.asarray(x)

    def potential(params):
        field = lambda t, z: field_of_params(params, t, z)
        ll = jnp.sum(cnf_log_prob(field, x, t0, t1, odeint_fn, trace, key))
        return -ll + reg * tree_sum_squares(params)

    return potential
