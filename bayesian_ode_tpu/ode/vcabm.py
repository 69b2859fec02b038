"""Variable-coefficient Adams-Bashforth-Moulton (VCABM), orders 1..12.

Hairer, Norsett & Wanner, "Solving ODEs I", III.5 — the same algorithm as
torchdiffeq/_impl/adams.py, re-expressed with fixed shapes for XLA:

  - The reference's deques of past times / divided differences
    (adams.py:84-95) become fixed-length arrays carried through the step
    loop, newest entry first; the dynamic order (1..12) indexes zero-padded
    weight vectors with gathers instead of ragged slicing.
  - `g_and_explicit_phi` (adams.py:26-49) is an unrolled 12-iteration
    recursion over fixed-width `c` vectors; entries beyond the active order
    are never read.  The reference's j==1 special case is algebraically the
    uniform recursion (dt == next_t - prev_t[0]), so one rule serves all j.
  - `compute_implicit_phi` (adams.py:52-58) becomes a cumulative sum.
  - Accept/reject and order adaptation (adams.py:143-168) are `where`
    selects, so the solver runs under jit/vmap with per-chain adaptivity.

Preserved reference quirks (for numerical parity):
  - On acceptance the *predictor* value is stored as the solution
    (`_VCABMState(p_next, ...)`, adams.py:169) even though the corrector
    value drives the error estimate and derivative history.
  - Order is capped at 3 until more than 4 steps have been taken
    (adams.py:146-147).
  - The derivative history `prev_f` of the reference is write-only
    (only `phi` is ever read), so it is not carried here.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..utils.pytree import PyTree, tree_where
from .step_control import optimal_step_size, select_initial_step

_MAX_ORDER = 12

# gamma* coefficients (Hairer III.5; reference adams.py:12-15).
_GAMMA_STAR = [
    1, -1 / 2, -1 / 12, -1 / 24, -19 / 720, -3 / 160, -863 / 60480,
    -275 / 24192, -33953 / 3628800, -0.00789255, -0.00678585, -0.00592406,
    -0.00523669, -0.0046775, -0.00421495, -0.0038269,
]


class _VCABMState(NamedTuple):
    y_n: PyTree
    prev_t: jax.Array      # (max_order + 1,), newest first
    next_t: jax.Array
    phi: PyTree            # leaves (max_order, ...), divided differences
    order: jax.Array
    count: jax.Array       # number of valid prev_t entries
    nfe: jax.Array
    n_accepted: jax.Array
    n_rejected: jax.Array


def _safe_div(a, b):
    return a / jnp.where(b == 0, jnp.ones_like(b), b)


def _g_coeffs_and_betas(prev_t, next_t, dt, max_order):
    """g[0..max_order] quadrature weights and per-lag beta factors.

    Returns (g, betas) where entries with index above the active order carry
    unread garbage.  betas[0] == 1 and betas[j] scales phi[j] into the
    explicit divided differences.
    """
    t_dtype = prev_t.dtype
    L = max_order + 2
    c = 1.0 / jnp.arange(1, L + 1, dtype=t_dtype)
    curr_t = prev_t[0]

    g = [jnp.asarray(1.0, t_dtype)]
    betas = [jnp.asarray(1.0, t_dtype)]
    beta = jnp.asarray(1.0, t_dtype)
    for j in range(1, max_order + 1):
        if j < max_order:
            beta = beta * _safe_div(next_t - prev_t[j - 1], curr_t - prev_t[j])
            betas.append(beta)
        c = c.at[:-1].set(c[:-1] - c[1:] * _safe_div(dt, next_t - prev_t[j - 1]))
        g.append(c[0])
    return jnp.stack(g), jnp.stack(betas)


def _explicit_phi(phi: PyTree, betas) -> PyTree:
    """explicit_phi[j] = beta_j * phi[j] (adams.py:38-42), vectorized."""
    return jax.tree.map(
        lambda p: p * betas.astype(p.dtype).reshape((-1,) + (1,) * (p.ndim - 1)), phi
    )


def _implicit_phi(ephi: PyTree, f_new: PyTree) -> PyTree:
    """iphi[j] = f_new - sum_{i<j} ephi[i] (adams.py:52-58), via cumsum."""
    def per_leaf(e, f):
        prefix = jnp.cumsum(e, axis=0)
        shifted = jnp.concatenate([jnp.zeros_like(f)[None], prefix[:-1]], axis=0)
        return f[None] - shifted

    return jax.tree.map(per_leaf, ephi, f_new)


def _take0(tree: PyTree, idx) -> PyTree:
    """Dynamic gather of tree[idx] along the leading (history) axis."""
    return jax.tree.map(lambda x: jnp.take(x, idx, axis=0), tree)


def _leaf_sq_ratios(err: PyTree, tol: PyTree):
    """Per-leaf mean squared error/tolerance ratios, stacked to a vector
    (the reference's tuple from misc.py:146-157)."""
    vals = jax.tree.leaves(
        jax.tree.map(lambda e, s: jnp.mean(jnp.square(e / s)), err, tol)
    )
    return jnp.stack(vals)


def integrate_vcabm(func: Callable, y0: PyTree, ts: jax.Array, rtol: float,
                    atol: float, max_order: int = _MAX_ORDER, safety: float = 0.9,
                    ifactor: float = 10.0, dfactor: float = 0.2,
                    max_num_steps: int = 2**20, mode: str = "while",
                    max_steps_per_interval: int = 256):
    max_order = int(max(1, min(max_order, _MAX_ORDER)))
    gamma_star = jnp.asarray(_GAMMA_STAR, ts.dtype)

    t0 = ts[0]
    f0 = func(t0, y0)
    first_step = select_initial_step(func, t0, y0, 2, rtol, atol, f0)

    prev_t0 = jnp.full((max_order + 1,), t0, ts.dtype)
    phi0 = jax.tree.map(
        lambda f: jnp.concatenate(
            [f[None], jnp.zeros((max_order - 1,) + f.shape, f.dtype)], axis=0
        ),
        f0,
    )
    state0 = _VCABMState(
        y_n=y0,
        prev_t=prev_t0,
        next_t=t0 + first_step,
        phi=phi0,
        order=jnp.asarray(1, jnp.int32),
        count=jnp.asarray(1, jnp.int32),
        nfe=jnp.asarray(2, jnp.int32),
        n_accepted=jnp.asarray(0, jnp.int32),
        n_rejected=jnp.asarray(0, jnp.int32),
    )

    def step(state: _VCABMState, final_t) -> _VCABMState:
        y0_, prev_t, order = state.y_n, state.prev_t, state.order
        next_t = jnp.minimum(state.next_t, final_t)
        dt = next_t - prev_t[0]

        g, betas = _g_coeffs_and_betas(prev_t, next_t, dt, max_order)
        ephi = _explicit_phi(state.phi, betas)

        # Explicit predictor: y0 + dt * sum_{j < max(1, order-1)} g[j] phi*[j].
        pred_len = jnp.maximum(1, order - 1)
        idxs = jnp.arange(max_order)
        w_pred = jnp.where(idxs < pred_len, g[:max_order], 0.0)
        p_next = jax.tree.map(
            lambda y, e: y
            + dt.astype(e.dtype)
            * jnp.tensordot(w_pred.astype(e.dtype), e, axes=(0, 0)),
            y0_,
            ephi,
        )

        f_pred = func(next_t, p_next)
        iphi_p = _implicit_phi(ephi, f_pred)

        # Implicit corrector: p + dt * g[order-1] * iphi_p[order-1].
        g_om1 = jnp.take(g, order - 1)
        y_next = jax.tree.map(
            lambda p, ip: p + (dt * g_om1).astype(p.dtype) * ip,
            p_next,
            _take0(iphi_p, order - 1),
        )

        tol = jax.tree.map(
            lambda a, b: atol + rtol * jnp.maximum(jnp.abs(a), jnp.abs(b)),
            y0_,
            y_next,
        )
        g_o = jnp.take(g, order)
        err_k_leaves = _leaf_sq_ratios(
            jax.tree.map(
                lambda ip: (dt * (g_o - g_om1)).astype(ip.dtype) * ip,
                _take0(iphi_p, order),
            ),
            tol,
        )
        error_k = jnp.max(err_k_leaves)
        accept = error_k <= 1.0

        # ---- rejected-step update (adams.py:139-141) ----
        dt_rej = optimal_step_size(dt, error_k, safety, ifactor, dfactor, order)
        next_t_rej = prev_t[0] + dt_rej

        # ---- accepted-step update (adams.py:143-169) ----
        f_corr = func(next_t, y_next)
        iphi = _implicit_phi(ephi, f_corr)

        # Order adaptation.
        g_om2 = jnp.take(g, jnp.maximum(order - 2, 0))
        g_om3 = jnp.take(g, jnp.maximum(order - 3, 0))
        err_km1 = _leaf_sq_ratios(
            jax.tree.map(
                lambda ip: (dt * (g_om1 - g_om2)).astype(ip.dtype) * ip,
                _take0(iphi_p, jnp.maximum(order - 1, 0)),
            ),
            tol,
        )
        err_km2 = _leaf_sq_ratios(
            jax.tree.map(
                lambda ip: (dt * (g_om2 - g_om3)).astype(ip.dtype) * ip,
                _take0(iphi_p, jnp.maximum(order - 2, 0)),
            ),
            tol,
        )
        err_kp1 = _leaf_sq_ratios(
            jax.tree.map(
                lambda ip: (dt * jnp.take(gamma_star, order)).astype(ip.dtype)
                * ip,
                _take0(iphi_p, order),
            ),
            tol,
        )
        lower = jnp.minimum(jnp.min(err_km1), jnp.min(err_km2)) < error_k
        raise_ok = (order < max_order) & (jnp.max(err_kp1) < error_k)
        adapted = jnp.where(lower, order - 1, jnp.where(raise_ok, order + 1, order))
        startup = (state.count <= 4) | (order < 3)
        next_order = jnp.where(
            startup, jnp.minimum(jnp.minimum(order + 1, 3), max_order), adapted
        )

        dt_acc = jnp.where(
            next_order > order,
            dt,
            optimal_step_size(dt, error_k, safety, ifactor, dfactor, order + 1),
        )
        prev_t_acc = jnp.concatenate([next_t[None], prev_t[:-1]])

        new = _VCABMState(
            y_n=tree_where(accept, p_next, y0_),
            prev_t=jnp.where(accept, prev_t_acc, prev_t),
            next_t=jnp.where(accept, next_t + dt_acc, next_t_rej),
            phi=tree_where(accept, iphi, state.phi),
            order=jnp.where(accept, next_order, order),
            count=jnp.where(
                accept, jnp.minimum(state.count + 1, max_order + 1), state.count
            ),
            nfe=state.nfe + 1 + accept.astype(jnp.int32),
            n_accepted=state.n_accepted + accept.astype(jnp.int32),
            n_rejected=state.n_rejected + (~accept).astype(jnp.int32),
        )
        return new

    def advance(state, final_t):
        def cond(s):
            in_flight = s.prev_t[0] < final_t
            budget = (s.n_accepted + s.n_rejected) < max_num_steps
            return in_flight & budget

        if mode == "while":
            state = jax.lax.while_loop(cond, lambda s: step(s, final_t), state)
        elif mode == "bounded":
            def body(s, _):
                s = jax.lax.cond(
                    s.prev_t[0] < final_t, lambda s_: step(s_, final_t),
                    lambda s_: s_, s
                )
                return s, None

            state, _ = jax.lax.scan(body, state, None, length=max_steps_per_interval)
        else:
            raise ValueError(f"unknown vcabm mode: {mode!r}")
        return state, state.y_n

    final_state, ys_tail = jax.lax.scan(advance, state0, ts[1:])
    ys = jax.tree.map(
        lambda first, rest: jnp.concatenate([first[None], rest], axis=0), y0, ys_tail
    )
    stats = {
        "nfe": final_state.nfe,
        "n_accepted": final_state.n_accepted,
        "n_rejected": final_state.n_rejected,
        "reached_final_time": final_state.prev_t[0] >= ts[-1],
    }
    return ys, stats
