"""Dense-output integration: `odeint_dense`.

Integrate dy/dt = func(t, y) over [t0, t1] once and return a
`DenseSolution` — a jit/vmap-transparent pytree that evaluates y(t) at
ANY time in the span from the solver's own per-step dense-output
polynomials, without re-solving.  Neither the vendored reference nor
upstream torchdiffeq has an analogue (torchdiffeq re-interpolates only
at the caller's fixed grid, /root/reference/torchdiffeq/_impl/
solvers.py:25-33); the API mirrors diffrax's `SaveAt(dense=True)` /
`sol.evaluate`.

TPU-first design: the whole solve is ONE `lax.while_loop` of the shared
adaptive state machine (ode/adaptive.py), recording each ACCEPTED
step's end time and interpolation coefficients into preallocated
buffers of static capacity `options={"dense_steps": N}` (default 512).
Evaluation is a `searchsorted` over the recorded step mesh plus one
dense-output polynomial evaluation — O(log N), fully vectorized over
query arrays, and valid inside jit (the buffers are plain arrays, so a
`DenseSolution` crosses jit/vmap/scan boundaries like any pytree).

Differentiation: forward-mode (JVP) flows through both the solve
(while_loop JVPs) and evaluation.  For reverse mode, evaluation alone
is reverse-differentiable with respect to the query time and the
recorded buffers; gradients THROUGH the solve need `odeint` /
`odeint_adjoint` (the recording while_loop has no VJP), matching the
usual dense-output contract.

Capacity semantics are honest: if the solver needs more accepted steps
than `dense_steps`, integration stops at the buffer boundary and
`stats["reached_final_time"]` is False (check it — evaluation beyond
the reached time clamps to the last recorded step's polynomial).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ..utils.pytree import PyTree
from .adaptive import _INTERP, AdaptiveConfig, can_step, init_adaptive_state
from .events import _method_triple
from .odeint import _ADAPTIVE_OPTION_KEYS, _check_and_canonicalize, _complex_to_real


@jax.tree_util.register_pytree_node_class
class DenseSolution:
    """Continuous solution y(t) over [t0, t1]; call it like a function.

    Children (traced): the step-mesh times, stacked interpolation
    coefficients, accepted-step count, time-direction sign, and solver
    stats.  Aux (static): the interpolant kind and the complex-state
    view-as-real metadata.  `sol(t)` accepts a scalar or any-shape array
    of times and returns the state pytree with the query shape as
    leading axes.
    """

    def __init__(self, ts, coeffs, n_steps, sign, stats, interp_kind,
                 treedef, is_cplx):
        self.ts = ts                  # (S+1,) canonical (increasing) times
        self.coeffs = coeffs          # pytree; leaves (S, ...) stacked coeffs
        self.n_steps = n_steps        # int32, accepted steps recorded
        self.sign = sign              # +1/-1: user time -> canonical time
        self.stats = stats            # dict of solver statistics
        self.interp_kind = interp_kind
        self.treedef = treedef        # state treedef (for complex unpack)
        self.is_cplx = is_cplx        # tuple[bool] per state leaf

    # -- pytree plumbing ---------------------------------------------------
    def tree_flatten(self):
        children = (self.ts, self.coeffs, self.n_steps, self.sign, self.stats)
        aux = (self.interp_kind, self.treedef, self.is_cplx)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    # -- interval bounds in USER time ---------------------------------------
    @property
    def t0(self):
        return self.sign * self.ts[0]

    @property
    def t1(self):
        """Last time actually reached (== the requested end time when
        stats['reached_final_time'] is True)."""
        n = jnp.minimum(self.n_steps, self.ts.shape[0] - 1)
        return self.sign * self.ts[n]

    def _eval_scalar(self, t):
        _, _, evaluate = _INTERP[self.interp_kind]
        s = jnp.asarray(self.sign * t, self.ts.dtype)
        S = self.ts.shape[0] - 1
        n = jnp.minimum(self.n_steps, S)
        # mask unwritten tail so searchsorted never selects it
        pos = jnp.arange(S + 1)
        ts = jnp.where(pos <= n, self.ts, jnp.inf)
        idx = jnp.clip(jnp.searchsorted(ts, s, side="right") - 1, 0,
                       jnp.maximum(n - 1, 0))
        coeff = jax.tree.map(lambda c: c[idx], self.coeffs)
        y = evaluate(coeff, ts[idx], ts[idx + 1], s)
        if any(self.is_cplx):
            leaves = self.treedef.flatten_up_to(y)
            y = self.treedef.unflatten([
                jax.lax.complex(l[..., 0], l[..., 1]) if c else l
                for l, c in zip(leaves, self.is_cplx)
            ])
        return y

    def __call__(self, t) -> PyTree:
        t = jnp.asarray(t)
        if t.ndim == 0:
            return self._eval_scalar(t)
        flat = t.reshape(-1)
        ys = jax.vmap(self._eval_scalar)(flat)
        return jax.tree.map(
            lambda l: l.reshape(t.shape + l.shape[1:]), ys)

    evaluate = __call__  # diffrax-style alias


def odeint_dense(func: Callable, y0: PyTree, t0, t1, rtol: float = 1e-7,
                 atol: float = 1e-9, method: str = "dopri5",
                 options: Optional[Dict[str, Any]] = None):
    """Solve over [t0, t1] and return (DenseSolution, stats).

    `method` must be adaptive with dense output (same set as
    `odeint_event`).  `options` accepts the adaptive-solver options plus
    `dense_steps` (static buffer capacity, default 512).  Decreasing
    spans (t1 < t0) integrate backwards; the returned solution is
    queried in user time either way.
    """
    options = dict(options or {})
    capacity = int(options.pop("dense_steps", 512))
    tableau, interp_kind, step_impl = _method_triple(method)
    interp_kind = options.pop("interp", interp_kind)

    # Complex states ride the same view-as-real transform as odeint
    # (odeint._complex_to_real): the solve and the recorded coefficient
    # buffers live in the packed real layout, and evaluation unpacks
    # back to complex leaves using the (structure-preserving) treedef +
    # per-leaf flags captured here, BEFORE packing.
    orig_leaves, treedef = jax.tree.flatten(y0)
    is_cplx = tuple(bool(jnp.iscomplexobj(l)) for l in orig_leaves)
    func, y0, _ = _complex_to_real(func, y0)

    span = jnp.stack([jnp.asarray(t0), jnp.asarray(t1)])
    reverse = options.pop("reverse", None)
    # Direction sign BEFORE canonicalization (canonical time = sign *
    # user time); _check_and_canonicalize folds the same sign into
    # (func, span).  Computed here from the explicit option when given,
    # else from the span values (works concrete or traced).
    if reverse is not None:
        sign = jnp.asarray(-1.0 if reverse else 1.0)
    else:
        sign = jnp.where(span[1] >= span[0], 1.0, -1.0)
    func, span = _check_and_canonicalize(func, y0, span, reverse=reverse)
    sign = sign.astype(span.dtype)
    s0, s1 = span[0], span[1]

    unknown = set(options) - set(_ADAPTIVE_OPTION_KEYS)
    if unknown:
        raise ValueError(f"unknown odeint_dense options: {sorted(unknown)}")
    cfg = AdaptiveConfig(rtol=rtol, atol=atol,
                         **{k: options[k] for k in options})

    state0 = init_adaptive_state(func, y0, s0, tableau, interp_kind, cfg)
    coeff0 = state0.interp_coeff

    ts_buf0 = jnp.full((capacity + 1,), s0, span.dtype)
    # slot 0 holds the init interpolant (which evaluates to y0 for any
    # theta), so a zero-step solution still evaluates correctly
    coeff_buf0 = jax.tree.map(
        lambda c: jnp.zeros((capacity,) + c.shape, c.dtype).at[0].set(c),
        coeff0)

    def cond(carry):
        s, k, _, _ = carry
        budget = (s.n_accepted + s.n_rejected) < cfg.max_num_steps
        return (s.t1 < s1) & (k < capacity) & budget & can_step(s)

    def body(carry):
        s_prev, k, ts_buf, coeff_buf = carry
        s = step_impl(func, s_prev, tableau, interp_kind, cfg)
        accepted = s.n_accepted > s_prev.n_accepted

        def write(args):
            ts_buf, coeff_buf = args
            ts_buf = jax.lax.dynamic_update_index_in_dim(
                ts_buf, s.t1.astype(ts_buf.dtype), k + 1, 0)
            coeff_buf = jax.tree.map(
                lambda buf, c: jax.lax.dynamic_update_index_in_dim(
                    buf, c.astype(buf.dtype), k, 0),
                coeff_buf, s.interp_coeff)
            return ts_buf, coeff_buf

        ts_buf, coeff_buf = jax.lax.cond(
            accepted, write, lambda a: a, (ts_buf, coeff_buf))
        return s, k + accepted.astype(k.dtype), ts_buf, coeff_buf

    final, n, ts_buf, coeff_buf = jax.lax.while_loop(
        cond, body, (state0, jnp.asarray(0, jnp.int32), ts_buf0, coeff_buf0))

    stats = {
        "nfe": final.nfe,
        "n_accepted": final.n_accepted,
        "n_rejected": final.n_rejected,
        "reached_final_time": final.t1 >= s1,
    }
    sol = DenseSolution(
        ts=ts_buf, coeffs=coeff_buf, n_steps=n, sign=sign, stats=stats,
        interp_kind=interp_kind, treedef=treedef, is_cplx=is_cplx,
    )
    return sol, stats
