"""HAMCMC: L-BFGS-preconditioned Langevin dynamics (Simsekli et al. 2016,
arXiv:1602.03442), four window variants.

Reference: samplers/langevin.py:619-1470.  The reference keeps Python lists
of past parameter/gradient vectors and rebuilds rank-one factor lists per
step; here the memory is fixed-shape ring buffers (oldest first) carried in
the kernel state, and the factor recursions unroll over the M-1 pair slots
with validity masks, so the whole sampler jits and vmaps.

Matrix-free square-root recursions: with B = C C^T (Hessian approx) and
H = B^{-1} = S S^T, each curvature pair (s, y) updates

    C_+ = (I - u v^T) C,  u = Bs + sqrt(s^T B s / s^T y) * y,  v = s / s^T B s
    S_+ = (I - p q^T) S,  p = s / s^T y,  q = y - sqrt(s^T y / s^T B s) * Bs

(derived by congruence expansion; the dense BFGS update is kept as a test
oracle, mirroring `_compute_vector_prod_old`, langevin.py:669-715).
Deliberate fixes vs the reference's port of hmcbfgs.m (langevin.py:736-860):
its `u` drops the factor `* y` (scalar+vector broadcast typo) and its
S-product applies (I - q p^T) instead of (I - p q^T); both corrected here
and validated against the dense oracle in tests.

Window variants (proposal base / curvature pairs), matching the reference:
  1: propose from theta_{t-M}; non-contiguous pairs s_i = theta_{i+M} -
     theta_i over a 2M-1 window (langevin.py:926-931, 970)
  2: propose from theta_{t-M}; contiguous pairs from the newest two entries
     (langevin.py:1125-1178)
  3: propose from theta_{t-1}; pairs lagged one step (langevin.py:1309-1361)
  4: propose from theta_{t-1}; pairs from the newest two (langevin.py:1402-1470)

Curvature-pair filtering: accept a pair iff s^T y > eps * s^T s
(eps = 1e-8, langevin.py:875-882); trust-region damping y += trust_reg * s
(langevin.py:874).  Warm-up runs plain SGLD while the memory fills
(langevin.py:1068-1069).  By default every proposal is accepted (the
reference's accept/reject step is incomplete and never called,
langevin.py:1003-1047); pass accept_reject=True for the paper-faithful
Metropolis correction (see hamcmc docstring).
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..utils.pytree import PyTree, ravel_pytree
from . import schedules
from .base import TransitionKernel, langevin_noise_scale


class HAMCMCState(NamedTuple):
    position: PyTree
    potential: jax.Array
    grad: PyTree
    params_buf: jax.Array   # (K, P) past positions, oldest first
    grads_buf: jax.Array    # (K, P)
    pots_buf: jax.Array     # (K,) potentials at the stored positions
    s_buf: jax.Array        # (M-1, P) curvature pairs, oldest first
    y_buf: jax.Array        # (M-1, P)
    pair_valid: jax.Array   # (M-1,) bool
    filled: jax.Array       # number of valid buffer rows
    step: jax.Array


def _shift_in(buf, row):
    return jnp.concatenate([buf[1:], row[None]], axis=0)


def _build_factors(s_buf, y_buf, valid, b0):
    """Per-step construction of the (u, v, p, q) rank-one factors from the
    stored pairs (langevin.py:829-852, with the fixes noted above).

    Invalid slots yield zero factors (identity operations).
    """
    n_pairs = s_buf.shape[0]
    c0 = jnp.sqrt(b0)

    us, vs, ps, qs = [], [], [], []

    # Factor applications over the pairs built so far:
    # C = (I - u_k v_k^T)...(I - u_1 v_1^T) C0, so C^T applies the
    # transposed factors in reverse order.
    def C_T(z):
        w = z
        for u, v in zip(reversed(us), reversed(vs)):
            w = w - v * jnp.dot(u, w)
        return c0 * w

    def C_(z):
        w = c0 * z
        for u, v in zip(us, vs):
            w = w - u * jnp.dot(v, w)
        return w

    def B_(z):
        return C_(C_T(z))

    for i in range(n_pairs):
        s = s_buf[i]
        y = y_buf[i]
        sTy = jnp.dot(s, y)
        ok = valid[i] & (sTy > 0)
        Bs = B_(s)
        sTBs = jnp.dot(s, Bs)
        safe_sTy = jnp.where(ok, sTy, 1.0)
        safe_sTBs = jnp.where(ok, sTBs, 1.0)
        ratio = jnp.sqrt(jnp.maximum(safe_sTBs / safe_sTy, 0.0))
        u = jnp.where(ok, Bs + ratio * y, jnp.zeros_like(s))
        v = jnp.where(ok, s / safe_sTBs, jnp.zeros_like(s))
        p = jnp.where(ok, s / safe_sTy, jnp.zeros_like(s))
        q = jnp.where(ok, y - (1.0 / ratio) * Bs, jnp.zeros_like(s))
        us.append(u)
        vs.append(v)
        ps.append(p)
        qs.append(q)

    return us, vs, ps, qs


def _S_apply(z, ps, qs, s0):
    """S z = (I - p_k q_k^T)...(I - p_1 q_1^T) S0 z."""
    w = s0 * z
    for p, q in zip(ps, qs):
        w = w - p * jnp.dot(q, w)
    return w


def _ST_apply(z, ps, qs, s0):
    w = z
    for p, q in zip(reversed(ps), reversed(qs)):
        w = w - q * jnp.dot(p, w)
    return s0 * w


def hamcmc_products(s_buf, y_buf, valid, H_gamma, grad_vec, noise_vec):
    """(H @ grad, S @ noise) with H = S S^T the L-BFGS inverse-Hessian
    approximation from the stored pairs; B0 = (1/H_gamma) I
    (langevin.py:911)."""
    b0 = 1.0 / H_gamma
    s0 = 1.0 / jnp.sqrt(jnp.asarray(b0))
    _, _, ps, qs = _build_factors(s_buf, y_buf, valid, jnp.asarray(b0))
    Hg = _S_apply(_ST_apply(grad_vec, ps, qs, s0), ps, qs, s0)
    Sn = _S_apply(noise_vec, ps, qs, s0)
    return Hg, Sn


def _C_apply(z, us, vs, c0):
    w = c0 * z
    for u, v in zip(us, vs):
        w = w - u * jnp.dot(v, w)
    return w


def _CT_apply(z, us, vs, c0):
    w = z
    for u, v in zip(reversed(us), reversed(vs)):
        w = w - v * jnp.dot(u, w)
    return c0 * w


def hamcmc_B_product(s_buf, y_buf, valid, H_gamma, z):
    """B @ z = H^{-1} @ z via the C-factor product (for MH quadratic
    forms)."""
    b0 = 1.0 / H_gamma
    c0 = jnp.sqrt(jnp.asarray(b0))
    us, vs, _, _ = _build_factors(s_buf, y_buf, valid, jnp.asarray(b0))
    return _C_apply(_CT_apply(z, us, vs, c0), us, vs, c0)


def hamcmc_dense_oracle(s_buf, y_buf, valid, H_gamma):
    """Dense BFGS inverse-Hessian build, the test oracle mirroring
    `_compute_vector_prod_old` (langevin.py:669-715)."""
    P = s_buf.shape[1]
    H = H_gamma * jnp.eye(P)
    for i in range(s_buf.shape[0]):
        s, y = s_buf[i], y_buf[i]
        sTy = jnp.dot(s, y)
        ok = valid[i] & (sTy > 0)
        rho = 1.0 / jnp.where(ok, sTy, 1.0)
        E = jnp.eye(P) - rho * jnp.outer(s, y)
        H_new = E @ H @ E.T + rho * jnp.outer(s, s)
        H = jnp.where(ok, H_new, H)
    return H


def hamcmc(potential_fn: Callable, step_size, memory: int = 5,
           variant: int = 1, trust_reg: float = 1.0, H_gamma: float = 1.0,
           pair_eps: float = 1e-8, warmup_extra: int = 100,
           add_noise: bool = True,
           accept_reject: bool = False) -> TransitionKernel:
    """HAMCMC transition kernel.  `memory` is the reference constructor's
    `memory` argument (internally M = memory + 1, langevin.py:645);
    `variant` in {1,2,3,4} selects the window scheme.

    accept_reject=True adds the Metropolis correction of the HAMCMC paper
    (arXiv:1602.03442 Alg. 1) that the reference left stubbed
    (langevin.py:1003-1047): with proposal
    theta* ~ N(base - lr*H*grad(base), 2*lr*H),
    log alpha = U(base) - U(theta*)
              - 1/(4 lr) (base - theta* + lr H g*)^T B (.)
              + 1/(4 lr) (theta* - base + lr H g_base)^T B (.)
    where B = H^{-1} is applied matrix-free.  Forward and reverse use the
    same H (its log-dets cancel) — exact for variant 1, whose curvature
    window excludes both endpoints of the move; for variants 2-4 the
    correction is approximate.  Rejection restores the base entry, as in
    the paper (theta_t = theta_{t-M}).  Costs one extra gradient
    evaluation per step."""
    if variant not in (1, 2, 3, 4):
        raise ValueError("variant must be 1..4")
    sched = schedules.resolve(step_size)
    value_and_grad = jax.value_and_grad(potential_fn)
    M = memory + 1
    K = 2 * M - 1 if variant == 1 else M
    n_pairs = M - 1
    # SGLD warm-up length: the reference runs 2M-1+100 plain steps for
    # variant 1, recording positions from step 100 on (langevin.py:1068-1069).
    warmup_steps = warmup_extra + K

    def init(position):
        u, g = value_and_grad(position)
        vec, _ = ravel_pytree(position)
        P = vec.shape[0]
        return HAMCMCState(
            position=position,
            potential=u,
            grad=g,
            params_buf=jnp.zeros((K, P), vec.dtype),
            grads_buf=jnp.zeros((K, P), vec.dtype),
            pots_buf=jnp.zeros((K,), vec.dtype),
            s_buf=jnp.zeros((n_pairs, P), vec.dtype),
            y_buf=jnp.zeros((n_pairs, P), vec.dtype),
            pair_valid=jnp.zeros((n_pairs,), bool),
            filled=jnp.asarray(0, jnp.int32),
            step=jnp.asarray(0, jnp.int32),
        )

    def pair_from(params_buf, grads_buf):
        """Variant-specific newest curvature pair, computed on the
        post-append buffers (oldest first)."""
        if variant == 1:
            s = params_buf[-1] - params_buf[M - 1]
            gdiff = grads_buf[-1] - grads_buf[M - 1]
        elif variant in (2, 4):
            s = params_buf[-1] - params_buf[-2]
            gdiff = grads_buf[-1] - grads_buf[-2]
        else:  # variant 3
            s = params_buf[-2] - params_buf[-3]
            gdiff = grads_buf[-2] - grads_buf[-3]
        y = gdiff + trust_reg * s
        return s, y

    def base_index():
        if variant == 1:
            return M - 1
        if variant == 2:
            return 0
        return K - 1

    def step(key, state):
        lr = sched(state.step)
        key, key_mh = jax.random.split(key)
        vec, unravel = ravel_pytree(state.position)
        grad_vec, _ = ravel_pytree(state.grad)
        xi = jax.random.normal(key, vec.shape, vec.dtype)
        in_warmup = state.step < warmup_steps

        # Record the current aligned (position, gradient) pair.  Deliberate
        # fix vs the reference, whose grads buffer lags the params buffer by
        # one step (langevin.py:869-871 appends the *proposal* with the
        # gradient of the previous position) and whose metric proposal
        # drifts from theta_{t-M} using grad(theta_{t-1}) — that mismatch
        # makes the update expansive and the chain diverges.  Per the HAMCMC
        # paper (arXiv:1602.03442, Alg. 1) the proposal is
        #   theta' ~ N(theta_base - lr*H*grad(theta_base), 2*lr*H),
        # so the drift gradient is taken at the base entry.
        params_buf = _shift_in(state.params_buf, vec)
        grads_buf = _shift_in(state.grads_buf, grad_vec)
        pots_buf = jnp.concatenate([state.pots_buf[1:],
                                    state.potential[None].astype(vec.dtype)])
        filled = jnp.minimum(state.filled + 1, K)

        # --- warm-up: plain SGLD on the flat vector (step_without_metric,
        # langevin.py:952-976), recording into the ring buffers.
        sgld_new = vec - lr * grad_vec
        if add_noise:
            sgld_new = sgld_new - langevin_noise_scale(lr) * xi

        # --- metric step from the variant's base entry.
        base = params_buf[base_index()]
        base_grad = grads_buf[base_index()]
        Hg, Sn = hamcmc_products(
            state.s_buf, state.y_buf, state.pair_valid, H_gamma, base_grad, xi
        )
        metric_new = base - lr * Hg
        if add_noise:
            metric_new = metric_new - langevin_noise_scale(lr) * Sn

        new_vec = jnp.where(in_warmup, sgld_new, metric_new)
        accepted = jnp.asarray(True)

        if accept_reject:
            # Metropolis correction (see docstring); active outside warm-up.
            u_prop, g_prop_tree = value_and_grad(unravel(metric_new))
            g_prop, _ = ravel_pytree(g_prop_tree)
            u_base = pots_buf[base_index()]
            Hg_prop, _ = hamcmc_products(
                state.s_buf, state.y_buf, state.pair_valid, H_gamma, g_prop,
                xi,
            )
            fwd = metric_new - base + lr * Hg
            rev = base - metric_new + lr * Hg_prop
            Bfwd = hamcmc_B_product(state.s_buf, state.y_buf,
                                    state.pair_valid, H_gamma, fwd)
            Brev = hamcmc_B_product(state.s_buf, state.y_buf,
                                    state.pair_valid, H_gamma, rev)
            log_alpha = (
                u_base - u_prop
                - 1.0 / (4 * lr) * jnp.dot(rev, Brev)
                + 1.0 / (4 * lr) * jnp.dot(fwd, Bfwd)
            )
            mh_accept = jnp.isfinite(log_alpha) & (
                jnp.log(jax.random.uniform(key_mh)) < log_alpha
            )
            accepted = in_warmup | mh_accept
            new_vec = jnp.where(
                in_warmup, new_vec, jnp.where(mh_accept, metric_new, base)
            )

        s, y = pair_from(params_buf, grads_buf)
        buffers_full = filled >= K
        pair_ok = buffers_full & (
            jnp.dot(s, y) > pair_eps * jnp.dot(s, s)
        )
        s_buf = jnp.where(pair_ok, _shift_in(state.s_buf, s), state.s_buf)
        y_buf = jnp.where(pair_ok, _shift_in(state.y_buf, y), state.y_buf)
        pair_valid = jnp.where(
            pair_ok,
            jnp.concatenate([state.pair_valid[1:], jnp.asarray([True])]),
            state.pair_valid,
        )

        position = unravel(new_vec)
        u, g = value_and_grad(position)
        new_state = HAMCMCState(
            position=position,
            potential=u,
            grad=g,
            params_buf=params_buf,
            grads_buf=grads_buf,
            pots_buf=pots_buf,
            s_buf=s_buf,
            y_buf=y_buf,
            pair_valid=pair_valid,
            filled=filled,
            step=state.step + 1,
        )
        info = {
            "potential": u,
            "accepted": accepted,
            "step_size": lr,
            "using_metric": ~in_warmup,
            "n_pairs": jnp.sum(pair_valid.astype(jnp.int32)),
        }
        return new_state, info

    return TransitionKernel(init, step)
