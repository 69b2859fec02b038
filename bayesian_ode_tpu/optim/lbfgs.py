"""L-BFGS with curvature-pair rejection / Powell damping and Armijo /
weak-Wolfe line searches, as pure jittable state transitions.

Reference: optims/LBFGS.py (multi-batch L-BFGS of Berahas et al., a minFunc
port).  The reference keeps Python lists of (s, y) pairs and steps eagerly
with data-dependent loops; here the history is a fixed-shape ring buffer
with a validity mask, the two-loop recursion unrolls over the history
slots, and the line searches are bounded `lax.while_loop`s re-evaluating
the jitted objective — so a full MAP optimization (gp.py:124-139) runs as
one compiled scan.

Semantics preserved (file:line in optims/LBFGS.py):
  - two-loop recursion with H_diag = ys/y'y initial scaling (293-337)
  - curvature rejection ys > eps*s'Bs, Powell damping
    y <- theta*y + (1-theta)*Bs with theta = (1-eps)*sBs/(sBs-ys) (339-420)
  - Bs approximated by -t*g (695-699)
  - Armijo backtracking with the minFunc polyinterp ladder (eta-division,
    then quadratic, then 3-point cubic — optim/polyinterp.py); weak-Wolfe
    bracketing with eta-expansion and safeguarded cubic interpolation
    inside the bracket (422-976)
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..utils.pytree import PyTree, ravel_pytree
from . import polyinterp


class LBFGSState(NamedTuple):
    position: jax.Array      # flat (P,)
    value: jax.Array
    grad: jax.Array          # flat (P,)
    s_buf: jax.Array         # (m, P) parameter differences, oldest first
    y_buf: jax.Array         # (m, P) gradient differences
    valid: jax.Array         # (m,) bool
    h_diag: jax.Array        # initial Hessian scaling
    prev_grad: jax.Array
    t: jax.Array             # last step length
    d: jax.Array             # last search direction
    fail: jax.Array          # last line search failed
    n_iter: jax.Array
    curv_skips: jax.Array
    fail_skips: jax.Array


def two_loop_recursion(state: LBFGSState, vec: jax.Array) -> jax.Array:
    """H @ vec from the (s, y) history (LBFGS.py:293-337); masked slots are
    skipped."""
    m = state.s_buf.shape[0]
    q = vec
    alphas = []
    for i in range(m - 1, -1, -1):
        s, y, ok = state.s_buf[i], state.y_buf[i], state.valid[i]
        rho = 1.0 / jnp.where(ok, jnp.dot(s, y), 1.0)
        a = jnp.where(ok, rho * jnp.dot(s, q), 0.0)
        q = q - a * y
        alphas.append((i, a))
    r = q * state.h_diag
    for i in range(m):
        s, y, ok = state.s_buf[i], state.y_buf[i], state.valid[i]
        rho = 1.0 / jnp.where(ok, jnp.dot(s, y), 1.0)
        a = dict(alphas)[i]
        beta = jnp.where(ok, rho * jnp.dot(y, r), 0.0)
        r = r + (a - beta) * s
    return r


def curvature_update(state: LBFGSState, flat_grad: jax.Array,
                     eps: float = 1e-2, damping: bool = False) -> LBFGSState:
    """Insert (s, y) = (t*d, grad - prev_grad) with rejection/damping
    (LBFGS.py:339-420).  No-ops on the first iteration or after a line
    search failure."""
    s = state.d * state.t
    y = flat_grad - state.prev_grad
    Bs = -state.t * state.prev_grad          # B s approximation (LBFGS.py:695-699)
    sBs = jnp.dot(s, Bs)
    ys = jnp.dot(y, s)

    can_update = (state.n_iter > 0) & ~state.fail
    accept = ys > eps * sBs

    if damping:
        theta = ((1 - eps) * sBs) / jnp.where(sBs == ys, 1.0, sBs - ys)
        y_damped = jnp.where(accept, y, theta * y + (1 - theta) * Bs)
        y = y_damped
        accept = jnp.asarray(True)

    do_insert = can_update & accept
    ys_new = jnp.dot(y, s)
    s_buf = jnp.where(do_insert, jnp.concatenate([state.s_buf[1:], s[None]]),
                      state.s_buf)
    y_buf = jnp.where(do_insert, jnp.concatenate([state.y_buf[1:], y[None]]),
                      state.y_buf)
    valid = jnp.where(
        do_insert, jnp.concatenate([state.valid[1:], jnp.asarray([True])]),
        state.valid,
    )
    h_diag = jnp.where(
        do_insert, ys_new / jnp.maximum(jnp.dot(y, y), 1e-300), state.h_diag
    )
    return state._replace(
        s_buf=s_buf, y_buf=y_buf, valid=valid, h_diag=h_diag,
        curv_skips=state.curv_skips + (can_update & ~accept),
        # parens are load-bearing: `+` binds tighter than `&`, so the
        # unparenthesized form collapses the counter to 0/1
        fail_skips=state.fail_skips + ((state.n_iter > 0) & state.fail),
    )


def _armijo_search(fn, x, d, F0, gtd, t0, c1, eta, max_ls, interpolate):
    """Backtracking: shrink t until F(x + t*d) <= F0 + c1*t*gtd, with the
    reference's minFunc interpolation ladder (LBFGS.py:537-710):

      - first backtrack (or non-finite F): divide by eta (LBFGS.py:653),
      - second: quadratic through (0, F0, gtd), (t, F_new)
        (LBFGS.py:658-660),
      - third on: cubic through those plus (t_prev, F_prev)
        (LBFGS.py:664-665),

    each safeguarded into [1e-3 t, 0.6 t] (LBFGS.py:667-672)."""

    def cond(carry):
        t, t_prev, F_new, F_prev, ls, done = carry
        return (~done) & (ls < max_ls)

    def body(carry):
        t, t_prev, F_new, F_prev, ls, _ = carry
        if interpolate:
            t_q = polyinterp.quad_min(
                jnp.zeros_like(t), F0, gtd, t, F_new,
                jnp.zeros_like(t), t)
            t_c = polyinterp.cubic_min_3pt(
                jnp.zeros_like(t), F0, gtd, t, F_new, t_prev, F_prev,
                jnp.zeros_like(t), jnp.maximum(t, t_prev))
            use_quad = (ls == 1) | ~jnp.isfinite(F_prev)
            t_i = jnp.clip(jnp.where(use_quad, t_q, t_c),
                           1e-3 * t, 0.6 * t)
            t_new = jnp.where((ls == 0) | ~jnp.isfinite(F_new),
                              t / eta, t_i)
        else:
            t_new = t / eta
        F_try = fn(x + t_new * d)
        ok = F_try <= F0 + c1 * t_new * gtd
        return (t_new, t, F_try, F_new, ls + 1, ok)

    F_first = fn(x + t0 * d)
    ok0 = F_first <= F0 + c1 * t0 * gtd
    nan = jnp.full_like(F0, jnp.nan)
    t, _, F_new, _, ls, done = jax.lax.while_loop(
        cond, body,
        (t0, jnp.zeros_like(t0), F_first, nan, jnp.asarray(1, jnp.int32),
         ok0),
    )
    fail = ~done
    return t, F_new, ls, fail


def _wolfe_search(value_and_grad, x, d, F0, gtd, t0, c1, c2, eta, max_ls,
                  interpolate=True):
    """Weak Wolfe bracketing: sufficient decrease + curvature
    gtd_new >= c2*gtd, expanding by eta while unbracketed, interpolating
    inside the bracket (LBFGS.py:712-976):

      - Armijo fails -> upper bound beta = t; passes but curvature fails
        -> lower bound alpha = t (LBFGS.py:854-893),
      - next t: eta*t while no upper bound exists (LBFGS.py:897-901);
        once bracketed, the polynomial minimizer over
        [(alpha, F_a, g_a), (beta, F_b, g_b)], safeguarded away from the
        bracket's edges (LBFGS.py:905-920).

    Two documented deviations from the reference inside the bracket:
      - it interpolates with the QUADRATIC (g_b marked unknown,
        LBFGS.py:864-866) because evaluating g at an Armijo-failed point
        would cost it an extra backward; this search's value_and_grad
        already computed it, so the cubic (both gradients) is free
        information and strictly tighter.
      - its upper safeguard `t > (beta-alpha)/2 -> t = (beta-alpha)/2`
        (LBFGS.py:916-917) is the bracket's WIDTH, not a point: for
        alpha > beta/3 it e j e c t s t below alpha, outside the
        bracket.  The evident minFunc intent (cf. its own t<=0 fallback
        at LBFGS.py:920) is the midpoint, used here:
        clamp into [alpha + 0.2 (beta-alpha), (alpha+beta)/2]."""

    def eval_t(t):
        F, g = value_and_grad(x + t * d)
        return F, jnp.dot(g, d)

    def cond(carry):
        (t, t_prev, alpha, beta, F_a, g_a, F_b, g_b, F_new, gtd_new, ls,
         done) = carry
        return (~done) & (ls < max_ls)

    def body(carry):
        (t, t_prev, alpha, beta, F_a, g_a, F_b, g_b, F_new, gtd_new, ls,
         _) = carry
        armijo = F_new <= F0 + c1 * t * gtd
        curv = gtd_new >= c2 * gtd
        done = armijo & curv

        beta_n = jnp.where(~armijo, t, beta)
        F_b_n = jnp.where(~armijo, F_new, F_b)
        g_b_n = jnp.where(~armijo, gtd_new, g_b)
        grow = armijo & ~curv
        alpha_n = jnp.where(grow, t, alpha)
        F_a_n = jnp.where(grow, F_new, F_a)
        g_a_n = jnp.where(grow, gtd_new, g_a)

        bracketed = jnp.isfinite(F_b_n) & jnp.isfinite(beta_n)
        if interpolate:
            t_i = polyinterp.cubic_min(alpha_n, F_a_n, g_a_n, beta_n,
                                       F_b_n, g_b_n, alpha_n, beta_n)
            width = beta_n - alpha_n
            t_in = jnp.clip(t_i, alpha_n + 0.2 * width,
                            alpha_n + 0.5 * width)
        else:
            t_in = 0.5 * (alpha_n + beta_n)
        t_next = jnp.where(
            bracketed, t_in,
            jnp.where(jnp.isfinite(beta_n), 0.5 * (alpha_n + beta_n),
                      t * eta),
        )
        F_next, gtd_next = eval_t(t_next)
        t_out = jnp.where(done, t, t_next)
        return (t_out, t, alpha_n, beta_n, F_a_n, g_a_n, F_b_n, g_b_n,
                jnp.where(done, F_new, F_next),
                jnp.where(done, gtd_new, gtd_next), ls + 1, done)

    F_first, gtd_first = eval_t(t0)
    nan = jnp.full_like(F0, jnp.nan)
    carry = (t0, jnp.zeros_like(t0), jnp.asarray(0.0, t0.dtype),
             jnp.asarray(jnp.inf, t0.dtype), F0, gtd, nan, nan,
             F_first, gtd_first, jnp.asarray(0, jnp.int32),
             jnp.asarray(False))
    out = jax.lax.while_loop(cond, body, carry)
    t, F_new, ls, done = out[0], out[8], out[10], out[11]
    return t, F_new, ls, ~done


def lbfgs_init(fn_value_and_grad: Callable, position: PyTree,
               history_size: int = 10) -> tuple:
    """Returns (state, unravel).  `fn_value_and_grad(flat_x) -> (F, g)`."""
    vec, unravel = ravel_pytree(position)
    F, g = fn_value_and_grad(vec)
    P = vec.shape[0]
    z = jnp.zeros((history_size, P), vec.dtype)
    state = LBFGSState(
        position=vec, value=F, grad=g, s_buf=z, y_buf=z,
        valid=jnp.zeros((history_size,), bool),
        h_diag=jnp.asarray(1.0, vec.dtype), prev_grad=g,
        t=jnp.asarray(1.0, vec.dtype), d=jnp.zeros_like(vec),
        fail=jnp.asarray(False), n_iter=jnp.asarray(0, jnp.int32),
        curv_skips=jnp.asarray(0, jnp.int32),
        fail_skips=jnp.asarray(0, jnp.int32),
    )
    return state, unravel


def lbfgs_step(fn_value_and_grad: Callable, state: LBFGSState, lr: float = 1.0,
               line_search: str = "wolfe", c1: float = 1e-4, c2: float = 0.9,
               eta: float = 2.0, max_ls: int = 10, eps: float = 1e-2,
               damping: bool = False, interpolate: bool = True) -> LBFGSState:
    """One full L-BFGS iteration (the FullBatchLBFGS.step flow,
    LBFGS.py:1095-1107): curvature update, two-loop direction, line search,
    move."""
    state = curvature_update(state, state.grad, eps=eps, damping=damping)
    d = two_loop_recursion(state, -state.grad)
    gtd = jnp.dot(state.grad, d)
    # fall back to steepest descent if not a descent direction
    desc = gtd < 0
    d = jnp.where(desc, d, -state.grad)
    gtd = jnp.where(desc, gtd, -jnp.dot(state.grad, state.grad))

    # after a failed/rejected step, restart the search from a quarter of
    # the LAST TRIAL step instead of lr — consecutive failures then
    # shrink geometrically (t/4, t/16, ...), so a non-finite cliff
    # (exploding ODE trajectories) arbitrarily close to the iterate
    # cannot stall the optimization the way a fixed restart can
    dt_ = state.position.dtype
    t_restart = jnp.clip(0.25 * state.t, jnp.asarray(1e-10, dt_),
                         jnp.asarray(lr, dt_))
    t0 = jnp.where(state.fail, t_restart, jnp.asarray(lr, dt_))
    fn = lambda x: fn_value_and_grad(x)[0]
    if line_search == "none":
        t, fail = t0, jnp.asarray(False)
        F_new = fn(state.position + t * d)
    elif line_search == "armijo":
        t, F_new, _, fail = _armijo_search(
            fn, state.position, d, state.value, gtd, t0, c1, eta, max_ls,
            interpolate,
        )
    elif line_search == "wolfe":
        t, F_new, _, fail = _wolfe_search(
            fn_value_and_grad, state.position, d, state.value, gtd, t0, c1,
            c2, eta, max_ls, interpolate,
        )
    else:
        raise ValueError(f"unknown line_search {line_search!r}")

    new_pos = state.position + t * d
    F, g = fn_value_and_grad(new_pos)
    # Reject the move unless it is finite AND (the search succeeded or
    # the value strictly improved).  On ODE posteriors a trial step into
    # an exploding-trajectory region returns inf/nan; the reference's
    # eager loop would raise there, but a jitted scan must not let one
    # non-finite trial poison the (s, y) history and every later iterate
    # (observed: L-BFGS on the GP-VDP MAP at M>=4 accepted an inf at
    # iter 3 and returned nan forever, 2026-08-21).  A rejected step
    # holds the position; `fail` feeds the existing fail-skip counter.
    accept = jnp.isfinite(F) & (~fail | (F < state.value))
    new_pos = jnp.where(accept, new_pos, state.position)
    F = jnp.where(accept, F, state.value)
    g = jnp.where(accept, g, state.grad)
    return state._replace(
        position=new_pos, value=F, grad=g, prev_grad=state.grad, t=t, d=d,
        fail=fail | ~accept, n_iter=state.n_iter + 1,
    )


def lbfgs_minimize(fn: Callable, position: PyTree, max_iters: int = 100,
                   history_size: int = 10, lr: float = 1.0,
                   line_search: str = "wolfe", **kwargs):
    """MAP optimization driver: scan `lbfgs_step` for `max_iters`.

    `fn(pytree) -> scalar`.  Returns (final position pytree, final value,
    per-iter value trace, final state).
    """
    vec0, unravel = ravel_pytree(position)
    vg = jax.value_and_grad(lambda v: fn(unravel(v)))
    state, _ = lbfgs_init(vg, position, history_size)

    def body(state, _):
        state = lbfgs_step(vg, state, lr=lr, line_search=line_search, **kwargs)
        return state, state.value

    state, values = jax.lax.scan(body, state, None, length=max_iters)
    return unravel(state.position), state.value, values, state
