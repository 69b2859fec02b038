"""Fused dopri5 stepper for the GP (kernel-regression) vector field.

The generic solver runs each adaptive step as ~dozens of small XLA kernels
inside a `lax.while_loop`; at 10k chains that costs ~1.6 ms/step against a
~30 us bandwidth bound.  This module fuses ONE ENTIRE dopri5 accept/reject
step — all 6 RK stages of the GP RHS, the embedded error norm, the PI
step-size controller, the dense-output quartic fit, and the
active/accept masking — into a single Pallas TPU kernel (the "fused
RHS+error-norm kernel" named in BASELINE.json).

Layout: chains ride the 128-lane axis; per-chain features ride sublanes —
state is (8, C) row-blocks (5 trajectory points per dimension), inducing
quantities are (40, C) (36 grid points padded to 40; padded grid points
are mapped far away so their kernel weights underflow to exactly 0).  All
arithmetic is VPU elementwise work over (40, C) tiles; there is no matmul
because the feature dimension is 2.

The outer time loop stays in XLA: `lax.while_loop(any active) { one
pallas step }` per output interval, with dense-output evaluation between
intervals.  Numerical semantics match the generic integrator (same
tableau, controller constants, ulps tolerance floor, quartic fit).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ode.tableaus import DOPRI5

_ULPS = 32.0    # tolerance floor, matches ode/step_control.error_ratio
_FAR = 1e9      # padded-grid-point offset: exp(-0.5*FAR^2) == 0


def _pad8(n: int) -> int:
    return ((n + 7) // 8) * 8


class GPDopri5State(NamedTuple):
    px: jax.Array   # (RP, C) x-coords of the N points
    py: jax.Array   # (RP, C)
    fx: jax.Array   # (RP, C) FSAL derivative
    fy: jax.Array   # (RP, C)
    t0: jax.Array   # (1, C) start of last accepted step
    t1: jax.Array   # (1, C) end of last accepted step
    dt: jax.Array   # (1, C) proposed next step
    cx: jax.Array   # (5*RP, C) quartic coeffs x: rows RP*j.. = coeff j
    cy: jax.Array   # (5*RP, C)
    nfe: jax.Array  # (1, C) float32 counters
    nacc: jax.Array
    nrej: jax.Array


def _make_rhs(sf: float, ell: float, N: int, RP: int, ax, ay, zx, zy):
    """GP field at the N points: f = K(x, Z) A, all VPU elementwise.

    Shared by the per-step and whole-solve kernels so the RHS arithmetic
    (and hence every step decision) is single-source."""
    sf2 = sf * sf
    inv2ell2 = 0.5 / (ell * ell)

    def rhs(sx, sy):
        outx, outy = [], []
        for n in range(N):
            dxn = sx[n : n + 1, :] - zx                # (MP, C)
            dyn = sy[n : n + 1, :] - zy
            K = sf2 * jnp.exp(-(dxn * dxn + dyn * dyn) * inv2ell2)
            outx.append(jnp.sum(K * ax, axis=0, keepdims=True))
            outy.append(jnp.sum(K * ay, axis=0, keepdims=True))
        pad = jnp.zeros_like(outx[0])
        return (jnp.concatenate(outx + [pad] * (RP - N), 0),
                jnp.concatenate(outy + [pad] * (RP - N), 0))

    return rhs


def _rk_stages(rhs, px, py, fx, fy, dt, tableau=DOPRI5):
    """RK stages of a 7-stage FSAL tableau (dopri5/tsit5: 6 evaluations).
    Returns the stage derivative lists and (y1, f1); the last stage IS
    (t1, y1)."""
    kx = [fx]
    ky = [fy]
    for beta_i in tableau.beta:
        incx = sum(b * k for b, k in zip(beta_i, kx) if b != 0)
        incy = sum(b * k for b, k in zip(beta_i, ky) if b != 0)
        sx = px + dt * incx
        sy = py + dt * incy
        fxi, fyi = rhs(sx, sy)
        kx.append(fxi)
        ky.append(fyi)
    return kx, ky, sx, sy, kx[-1], ky[-1]


def _step_decision(kx, ky, px, py, y1x, y1y, dt, rtol, atol, safety,
                   ifactor, dfactor, N, RP, err_prev=None,
                   tableau=DOPRI5):
    """Embedded error ratio (mean square over the 2N valid components,
    with the 32-ulps tolerance floor) + the step controller.  Returns
    (accept, ratio, dt_next, err_next) — identical in both fused kernels
    by construction.

    err_prev None -> the reference's memoryless I controller
    (ode/step_control.optimal_step_size; err_next returns None).
    err_prev (1, C) -> the Gustafsson PI controller
    (ode/step_control.pi_step_size, same PI.4.2 coefficients): accepted
    steps use two-error memory, rejected steps the I formula, and
    err_next carries sqrt(ratio) for accepted lanes.
    """
    c_err = tableau.c_error
    order = tableau.order
    errx = dt * sum(c * k for c, k in zip(c_err, kx) if c != 0)
    erry = dt * sum(c * k for c, k in zip(c_err, ky) if c != 0)

    eps = jnp.float32(1.1920929e-07)
    row_mask = jax.lax.broadcasted_iota(jnp.int32, (RP, 1), 0) < N

    def comp_ratio(err, y0, y1):
        mag = jnp.maximum(jnp.abs(y0), jnp.abs(y1))
        tol = jnp.maximum(atol + rtol * mag, _ULPS * eps * mag)
        r = err / tol
        return jnp.sum(jnp.where(row_mask, r * r, 0.0), axis=0,
                       keepdims=True)

    ratio = (comp_ratio(errx, px, y1x) + comp_ratio(erry, py, y1y)) / (
        2 * N
    )                                                    # (1, C)
    accept = ratio <= 1.0

    err_nrm = jnp.sqrt(jnp.maximum(ratio, jnp.float32(1e-38)))
    dfac = jnp.where(ratio < 1.0, 1.0, dfactor)
    factor = jnp.maximum(
        1.0 / ifactor,
        jnp.minimum(err_nrm ** (1.0 / order) / safety, 1.0 / dfac),
    )
    factor = jnp.where(jnp.isfinite(factor), factor, 1.0 / dfac)
    dt_i = dt / factor

    if err_prev is None:
        dt_next = jnp.where(ratio == 0.0, dt * ifactor, dt_i)
        return accept, ratio, dt_next, None

    beta1, beta2 = 0.6, -0.2                     # Soderlind PI.4.2
    ep = jnp.maximum(err_prev, jnp.float32(1e-38))
    factor_acc = (safety * err_nrm ** (-beta1 / order)
                  * ep ** (-beta2 / order))
    factor_acc = jnp.where(jnp.isfinite(factor_acc), factor_acc, dfactor)
    dt_acc = dt * jnp.clip(factor_acc, dfactor, ifactor)
    dt_next = jnp.where(accept, dt_acc, dt_i)
    dt_next = jnp.where(ratio == 0.0, dt * ifactor, dt_next)
    err_next = jnp.where(accept, err_nrm, err_prev)
    return accept, ratio, dt_next, err_next


def _quartic_coeffs(y0, y1, ymid, f0, f1, dt):
    """Dense-output quartic fit (ode/interp.interp_fit), highest-order
    coefficient first."""
    a = -2 * dt * f0 + 2 * dt * f1 - 8 * y0 - 8 * y1 + 16 * ymid
    b = 5 * dt * f0 - 3 * dt * f1 + 18 * y0 + 14 * y1 - 32 * ymid
    c = -4 * dt * f0 + dt * f1 - 11 * y0 - 5 * y1 + 16 * ymid
    d = dt * f0
    return a, b, c, d, y0


def _midpoint(p, kx, dt, tableau=DOPRI5):
    return p + dt * sum(c * k for c, k in zip(tableau.c_mid, kx)
                        if c != 0)


def _make_kernel(sf: float, ell: float, rtol: float, atol: float,
                 safety: float, ifactor: float, dfactor: float,
                 N: int, RP: int, steps_per_call: int = 1):
    def kernel(next_t_ref, px_ref, py_ref, fx_ref, fy_ref, t0_ref, t1_ref,
               dt_ref, cx_ref, cy_ref, nfe_ref, nacc_ref, nrej_ref,
               ax_ref, ay_ref, zx_ref, zy_ref,
               opx, opy, ofx, ofy, ot0, ot1, odt, ocx, ocy, onfe, onacc,
               onrej):
        next_t = next_t_ref[0]
        rhs = _make_rhs(sf, ell, N, RP, ax_ref[:], ay_ref[:], zx_ref[:],
                        zy_ref[:])

        def one_step(carry):
            (px, py, fx, fy, t0c, t1, dt, cxc, cyc, nfe, nacc, nrej) = carry
            active = t1 < next_t                       # (1, C)

            kx, ky, y1x, y1y, f1x, f1y = _rk_stages(rhs, px, py, fx, fy, dt)
            accept, ratio, dt_next, _ = _step_decision(
                kx, ky, px, py, y1x, y1y, dt, rtol, atol, safety, ifactor,
                dfactor, N, RP)

            midx = _midpoint(px, kx, dt)
            midy = _midpoint(py, ky, dt)

            def fit(y0, y1, ymid, f0, f1):
                return jnp.concatenate(
                    _quartic_coeffs(y0, y1, ymid, f0, f1, dt), axis=0
                )                                      # (5*RP, C)

            new_cx = fit(px, y1x, midx, fx, f1x)
            new_cy = fit(py, y1y, midy, fy, f1y)

            # --- masked state update: inactive lanes pass through; active
            # lanes take the accept/reject branch ---
            take = active & accept            # (1, C)
            step_taken = active

            def sel(new, acc_old):
                return jnp.where(take, new, acc_old)

            fstep = step_taken.astype(jnp.float32)
            facc = take.astype(jnp.float32)
            return (
                sel(y1x, px), sel(y1y, py), sel(f1x, fx), sel(f1y, fy),
                jnp.where(take, t1, t0c), sel(t1 + dt, t1),
                jnp.where(step_taken, dt_next, dt),
                sel(new_cx, cxc), sel(new_cy, cyc),
                nfe + 6.0 * fstep, nacc + facc, nrej + fstep - facc,
            )

        carry = (px_ref[:], py_ref[:], fx_ref[:], fy_ref[:], t0_ref[:],
                 t1_ref[:], dt_ref[:], cx_ref[:], cy_ref[:], nfe_ref[:],
                 nacc_ref[:], nrej_ref[:])
        if steps_per_call == 1:
            carry = one_step(carry)
        else:
            carry = jax.lax.fori_loop(
                0, steps_per_call, lambda _, c: one_step(c), carry
            )
        (opx[:], opy[:], ofx[:], ofy[:], ot0[:], ot1[:], odt[:], ocx[:],
         ocy[:], onfe[:], onacc[:], onrej[:]) = carry

    return kernel


def _pack_initial(A, x0, static, rtol, atol, C, N, RP, MP):
    """Lane-major packing + Hairer-style initial step, shared by the
    per-step and whole-solve fused solvers.  Returns
    (px, py, fx, fy (RP, C); dt0 (1, C); consts (ax, ay, zx, zy);
    x0b (C, N, 2))."""
    f32 = jnp.float32
    M = static.Z.shape[0]

    def pack_points(p):      # (C, N) -> (RP, C)
        return jnp.concatenate(
            [p.T, jnp.zeros((RP - N, C), f32)], axis=0
        )

    x0b = jnp.broadcast_to(x0.astype(f32), (C, N, 2))
    px = pack_points(x0b[:, :, 0])
    py = pack_points(x0b[:, :, 1])
    ax = jnp.concatenate(
        [A[:, :, 0].astype(f32).T, jnp.zeros((MP - M, C), f32)], 0
    )
    ay = jnp.concatenate(
        [A[:, :, 1].astype(f32).T, jnp.zeros((MP - M, C), f32)], 0
    )
    # the kernel computes (x - z)^2 / (2 ell^2) on raw coordinates
    Zc = static.Z.astype(f32)
    zx = jnp.concatenate([Zc[:, 0], jnp.full((MP - M,), _FAR, f32)])[:, None]
    zy = jnp.concatenate([Zc[:, 1], jnp.full((MP - M,), _FAR, f32)])[:, None]
    consts = (ax, ay, zx, zy)

    # ---- initial derivative + Hairer-style initial dt (XLA, once) ----
    from ..models.kernel_regression import rbf

    def rhs_ref(p):
        K = rbf(p, Zc, static.sf, static.ell,
                precision=jax.lax.Precision.HIGHEST)
        return jnp.einsum("cnm,cmd->cnd", K, A.astype(f32),
                          precision=jax.lax.Precision.HIGHEST)

    pts0 = x0b                                   # (C, N, 2)
    f0, dt0 = _hairer_initial_step(rhs_ref, pts0, rtol, atol)

    return (px, py, pack_points(f0[:, :, 0]), pack_points(f0[:, :, 1]),
            dt0, consts, x0b)


def _hairer_initial_step(rhs_ref, pts0, rtol, atol):
    """Hairer-style first-step heuristic over batched (C, N, 2) states
    (ode/step_control.initial_step semantics; shared with the MLP fused
    solver).  Returns (f0 (C, N, 2), dt0 (1, C))."""
    f0 = rhs_ref(pts0)
    scale = atol + jnp.abs(pts0) * rtol
    d0 = jnp.sqrt(jnp.mean((pts0 / scale) ** 2, axis=(1, 2)))
    d1 = jnp.sqrt(jnp.mean((f0 / scale) ** 2, axis=(1, 2)))
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6,
                   0.01 * d0 / jnp.maximum(d1, 1e-30))
    p1 = pts0 + h0[:, None, None] * f0
    f1 = rhs_ref(p1)
    d2 = jnp.sqrt(jnp.mean(((f1 - f0) / scale) ** 2, axis=(1, 2))) / h0
    h1 = jnp.where((d1 <= 1e-15) & (d2 <= 1e-15),
                   jnp.maximum(1e-6, h0 * 1e-3),
                   (0.01 / jnp.maximum(jnp.maximum(d1, d2), 1e-30))
                   ** (1.0 / 5.0))
    dt0 = jnp.minimum(100 * h0, h1).astype(jnp.float32)[None, :]
    return f0, dt0


def _make_whole_kernel(sf: float, ell: float, rtol: float, atol: float,
                       safety: float, ifactor: float, dfactor: float,
                       N: int, RP: int, T: int, TP: int, max_steps: int,
                       controller: str = "i"):
    """Whole-solve kernel: ONE Pallas program integrates a tile of chains
    from ts[0] to ts[-1], emitting dense output in-loop.

    The per-step kernel above pays a lockstep barrier at every output
    interval: the XLA `while` around it runs max-steps-over-all-chains
    iterations per interval (measured ~225 executed lockstep iterations
    for a mean 52 useful steps/chain on the VDP posterior, a 4.3x
    inflation).  Here the `lax.while_loop` lives inside the kernel and
    runs to the final time, so a lane only waits for the slowest chain
    in its own tile once — crossed output times are written immediately
    via a masked quartic evaluation broadcast over the (T, C) plane, the
    same trick as the generic integrator's mode="while" in-loop emission
    (ode/adaptive.py).  The dense-output coefficients never enter the
    carry: they are consumed by emission in the iteration that computes
    them.
    """
    def kernel(px_ref, py_ref, fx_ref, fy_ref, t1_ref, dt_ref,
               ax_ref, ay_ref, zx_ref, zy_ref, ts_ref,
               oxs_ref, oys_ref, onfe_ref, onacc_ref, onrej_ref, ot1_ref):
        tsv = ts_ref[:]                     # (TP, 1); padded rows = _FAR
        tf = tsv[T - 1 : T, :]              # (1, 1) final time
        oxs_ref[:] = jnp.zeros(oxs_ref.shape, oxs_ref.dtype)
        oys_ref[:] = jnp.zeros(oys_ref.shape, oys_ref.dtype)
        rhs = _make_rhs(sf, ell, N, RP, ax_ref[:], ay_ref[:], zx_ref[:],
                        zy_ref[:])

        pi = controller == "pi"

        def cond(carry):
            (px, py, fx, fy, t1, dt, ep, nfe, nacc, nrej) = carry
            # budget is PER-CHAIN: a runaway lane exhausting max_steps
            # freezes only itself (it leaves the active set); the rest of
            # the tile keeps integrating
            return jnp.any((t1 < tf) & (nacc + nrej < max_steps))

        def body(carry):
            (px, py, fx, fy, t1, dt, ep, nfe, nacc, nrej) = carry
            active = (t1 < tf) & (nacc + nrej < max_steps)  # (1, C)

            kx, ky, y1x, y1y, f1x, f1y = _rk_stages(rhs, px, py, fx, fy, dt)
            accept, ratio, dt_next, ep_next = _step_decision(
                kx, ky, px, py, y1x, y1y, dt, rtol, atol, safety, ifactor,
                dfactor, N, RP, err_prev=ep if pi else None)
            if ep_next is None:
                ep_next = ep

            take = active & accept
            step_taken = active

            # --- in-loop dense-output emission: every output time this
            # accepted step crossed gets its quartic value now ---
            emit = (tsv > t1) & (tsv <= t1 + dt) & take    # (TP, C)

            @pl.when(jnp.any(emit))
            def _():
                midx = _midpoint(px, kx, dt)
                midy = _midpoint(py, ky, dt)
                cfs_x = _quartic_coeffs(px, y1x, midx, fx, f1x, dt)
                cfs_y = _quartic_coeffs(py, y1y, midy, fy, f1y, dt)
                X = (tsv - t1) / dt                        # (TP, C)

                def horner(cfs, n):
                    a, b, c, d, e = (cf[n : n + 1, :] for cf in cfs)
                    return (((a * X + b) * X + c) * X + d) * X + e

                for n in range(N):
                    blk = oxs_ref[pl.ds(n * TP, TP), :]
                    oxs_ref[pl.ds(n * TP, TP), :] = jnp.where(
                        emit, horner(cfs_x, n), blk)
                    blk = oys_ref[pl.ds(n * TP, TP), :]
                    oys_ref[pl.ds(n * TP, TP), :] = jnp.where(
                        emit, horner(cfs_y, n), blk)

            def sel(new, old):
                return jnp.where(take, new, old)

            fstep = step_taken.astype(jnp.float32)
            facc = take.astype(jnp.float32)
            return (
                sel(y1x, px), sel(y1y, py), sel(f1x, fx), sel(f1y, fy),
                sel(t1 + dt, t1),
                jnp.where(step_taken, dt_next, dt),
                jnp.where(step_taken, ep_next, ep),
                nfe + 6.0 * fstep, nacc + facc, nrej + fstep - facc,
            )

        carry = (px_ref[:], py_ref[:], fx_ref[:], fy_ref[:], t1_ref[:],
                 dt_ref[:], jnp.ones_like(t1_ref[:]),
                 jnp.full_like(t1_ref[:], 2.0),
                 jnp.zeros_like(t1_ref[:]), jnp.zeros_like(t1_ref[:]))
        (px, py, _, _, t1, _, _, nfe, nacc, nrej) = jax.lax.while_loop(
            cond, body, carry)

        # Output times never crossed (possible only on max_steps
        # exhaustion) hold the chain's FINAL state instead of the zeros
        # the buffers were initialized with — callers that ignore
        # reached_final_time see a frozen trajectory, not silent zeros.
        # (The per-step kernel extrapolates its last quartic instead;
        # the paths only differ on budget exhaustion.)
        rest = tsv > t1                                    # (TP, C)

        @pl.when(jnp.any(rest))
        def _():
            for n in range(N):
                blk = oxs_ref[pl.ds(n * TP, TP), :]
                oxs_ref[pl.ds(n * TP, TP), :] = jnp.where(
                    rest, px[n : n + 1, :], blk)
                blk = oys_ref[pl.ds(n * TP, TP), :]
                oys_ref[pl.ds(n * TP, TP), :] = jnp.where(
                    rest, py[n : n + 1, :], blk)

        onfe_ref[:] = nfe
        onacc_ref[:] = nacc
        onrej_ref[:] = nrej
        ot1_ref[:] = t1

    return kernel


def gp_dopri5_solve_whole(A, x0, ts, static, rtol=1e-7, atol=1e-9,
                          safety=0.9, ifactor=10.0, dfactor=0.2,
                          max_steps=100_000, tile=1024, controller="i",
                          interpret=False):
    """Whole-solve variant of `gp_dopri5_solve`: same semantics and stats
    (identical tableau/controller/quartic — the step arithmetic is shared
    code — so NFE matches), ~1.4x faster — the adaptive while-loop runs
    inside the kernel, so chains don't barrier at every output interval
    (see _make_whole_kernel).  The one behavioral difference: on
    max_steps exhaustion, un-reached output times hold the chain's final
    state (the per-step path extrapolates its last quartic); check
    stats["reached_final_time"].

    controller="pi" opts into the Gustafsson PI step controller
    (ode/step_control.pi_step_size semantics): on this workload
    rejections drop 7.5x (9.7 -> 1.3 per solve) but convert into
    smaller accepted steps, so NFE and throughput are unchanged — use
    it for smoother step sequences, and keep the parity default "i"
    when step decisions must match torchdiffeq / the per-step kernel.

    A (C, M, 2), x0 (N, 2) shared, ts (T,) increasing.  Returns
    (ys (T, C, N, 2), stats).  Any C >= 1: the chain axis is padded up to
    a multiple of `tile` with copies of chain 0 (padding must be benign —
    a diverging pad lane would spin the while loop — and chain 0's own
    step count never exceeds the true max), then sliced back, so an
    awkward C (e.g. 10,112 = 79 x 128) doesn't walk the tile down to 128
    and serialize the grid.  Unlike the per-step path, the (N*TP, tile)
    output blocks live in VMEM, so the tile is walked down (in 128-lane
    multiples) to keep the kernel's scoped VMEM inside the 16 MiB budget
    (see the model at the walk-down below) — dense output grids trade
    grid-level parallelism, not compilability.
    """
    if controller not in ("i", "pi"):
        raise ValueError(
            f"unknown step controller {controller!r}; expected 'i' "
            "(reference parity) or 'pi' (Gustafsson)"
        )
    C_in = A.shape[0]
    f32 = jnp.float32
    ts = ts.astype(f32)
    N = x0.shape[-2]
    RP = _pad8(N)
    T = ts.shape[0]
    TP = _pad8(T)
    MP = _pad8(static.Z.shape[0])

    tile = max(128, min(tile, ((C_in + 127) // 128) * 128))
    tile -= tile % 128                      # BlockSpec lane width contract
    # VMEM walk-down: the kernel's scoped VMEM is ~(2.8 KB fixed + 2x
    # double-buffered (N*TP, tile) output blocks) per lane against a
    # 16 MiB budget — measured 7,876 B/lane at T=60, where tile=2048
    # OOMs by 132 KB and tile=1024 fits with ~8 MiB headroom.  Dense
    # output grids trade grid-level parallelism, not compilability.
    while tile > 128 and tile * (3000 + 16 * N * TP) > 15 * 1024 * 1024:
        tile -= 128
    C = ((C_in + tile - 1) // tile) * tile
    if C != C_in:
        A = jnp.concatenate(
            [A, jnp.broadcast_to(A[:1], (C - C_in,) + A.shape[1:])], axis=0
        )

    (px, py, fxp, fyp, dt0, consts, x0b) = _pack_initial(A, x0, static,
                                                         rtol, atol, C, N,
                                                         RP, MP)
    ax, ay, zx, zy = consts
    tsp = jnp.concatenate([ts, jnp.full((TP - T,), _FAR, f32)])[:, None]
    t1 = jnp.full((1, C), ts[0], f32)

    kernel = _make_whole_kernel(
        static.sf, static.ell, rtol, atol, safety, ifactor, dfactor,
        N, RP, T, TP, max_steps, controller,
    )

    def vtile(rows):
        return pl.BlockSpec((rows, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def vshared(rows, cols=1):
        return pl.BlockSpec((rows, cols), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    oxs, oys, nfe, nacc, nrej, t1f = pl.pallas_call(
        kernel,
        grid=(C // tile,),
        in_specs=[vtile(RP), vtile(RP), vtile(RP), vtile(RP),
                  vtile(1), vtile(1),
                  vtile(MP), vtile(MP), vshared(MP), vshared(MP),
                  vshared(TP)],
        out_specs=[vtile(N * TP), vtile(N * TP), vtile(1), vtile(1),
                   vtile(1), vtile(1)],
        out_shape=[jax.ShapeDtypeStruct((N * TP, C), f32)] * 2
        + [jax.ShapeDtypeStruct((1, C), f32)] * 4,
        interpret=interpret,
    )(px, py, fxp, fyp, t1, dt0, ax, ay, zx, zy, tsp)

    # (N*TP, C) -> (T, C, N, 2); row 0 is ts[0] = x0 (never emitted)
    ys = jnp.stack(
        [oxs.reshape(N, TP, C)[:, :T], oys.reshape(N, TP, C)[:, :T]],
        axis=-1,
    )                                              # (N, T, C, 2)
    ys = jnp.moveaxis(ys, 0, 2)                    # (T, C, N, 2)
    ys = ys.at[0].set(x0b)
    ys = ys[:, :C_in]
    stats = {
        "nfe": nfe[0, :C_in].astype(jnp.int32),
        "n_accepted": nacc[0, :C_in].astype(jnp.int32),
        "n_rejected": nrej[0, :C_in].astype(jnp.int32),
        "reached_final_time": jnp.all(t1f[:, :C_in] >= ts[-1]),
    }
    return ys, stats


def _pallas_step(state: GPDopri5State, next_t, consts, cfg, N, RP,
                 steps_per_call=1, interpret=False, tile=2048):
    ax, ay, zx, zy = consts
    C = state.px.shape[1]
    # the grid must tile C exactly (C is a multiple of 128 by contract)
    tile = min(tile, C)
    while C % tile:
        tile -= 128
    kernel = _make_kernel(*cfg, N, RP, steps_per_call)
    state_arrays = [state.px, state.py, state.fx, state.fy, state.t0,
                    state.t1, state.dt, state.cx, state.cy, state.nfe,
                    state.nacc, state.nrej]
    shapes = [jax.ShapeDtypeStruct(s.shape, s.dtype) for s in state_arrays]

    def vtile(rows):
        return pl.BlockSpec((rows, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    state_specs = [vtile(a.shape[0]) for a in state_arrays]
    outs = pl.pallas_call(
        kernel,
        grid=(C // tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + state_specs
        + [vtile(ax.shape[0]), vtile(ay.shape[0]),
           pl.BlockSpec((zx.shape[0], 1), lambda i: (0, 0),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((zy.shape[0], 1), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=state_specs,
        out_shape=shapes,
        input_output_aliases={i + 1: i for i in range(12)},
        interpret=interpret,
    )(
        next_t.reshape(1), *state_arrays, ax, ay, zx, zy,
    )
    return GPDopri5State(*outs)


def _interp_eval(state: GPDopri5State, t, RP):
    """Quartic dense-output evaluation (XLA, between intervals)."""
    denom = jnp.where(state.t1 == state.t0, 1.0, state.t1 - state.t0)
    x = jnp.where(state.t1 == state.t0, 0.0, (t - state.t0) / denom)  # (1,C)

    def horner(c):
        a, b, cc, d, e = (c[RP * j : RP * j + RP] for j in range(5))
        return (((a * x + b) * x + cc) * x + d) * x + e

    return horner(state.cx), horner(state.cy)


def gp_dopri5_solve(A, x0, ts, static, rtol=1e-7, atol=1e-9, safety=0.9,
                    ifactor=10.0, dfactor=0.2, max_steps=100_000,
                    steps_per_call=1, interpret=False):
    """Solve the GP-field ODE for C chains with the fused stepper.

    A:  (C, M, D=2) per-chain precomputed weights (Kzz^{-1} L U).
    x0: (N, 2) shared initial trajectory points.
    ts: (T,) output times.
    static: models.kernel_regression.GPVectorFieldStatic.

    Returns (ys (T, C, N, 2), stats dict).  C must be a multiple of 128.

    Step-budget semantics: this legacy per-step path advances all chains
    in one host-side while loop per output interval, so `max_steps` is
    COLLECTIVE — one runaway chain exhausting the budget halts the whole
    batch for that interval (visible via reached_final_time).  The
    whole-solve kernel (gp_dopri5_solve_whole) enforces the budget
    per-chain instead; prefer it.
    """
    C = A.shape[0]
    if C % 128 != 0:
        raise ValueError(f"chain count must be a multiple of 128, got {C}")
    f32 = jnp.float32
    ts = ts.astype(f32)
    N = x0.shape[-2]
    RP = _pad8(N)
    MP = _pad8(static.Z.shape[0])
    cfg = (static.sf, static.ell, rtol, atol, safety, ifactor, dfactor)

    (px, py, fxp, fyp, dt0, consts, x0b) = _pack_initial(
        A, x0, static, rtol, atol, C, N, RP, MP)

    t0s = jnp.full((1, C), ts[0], f32)
    zeros_c = jnp.zeros((5 * RP, C), f32)
    state = GPDopri5State(
        px=px, py=py,
        fx=fxp, fy=fyp,
        t0=t0s, t1=t0s, dt=dt0,
        cx=zeros_c.at[4 * RP:].set(px), cy=zeros_c.at[4 * RP:].set(py),
        nfe=jnp.full((1, C), 2.0, f32), nacc=jnp.zeros((1, C), f32),
        nrej=jnp.zeros((1, C), f32),
    )

    def advance(state, next_t):
        def cond(s):
            budget = jnp.max(s.nacc + s.nrej) < max_steps
            return jnp.any(s.t1 < next_t) & budget

        def body(s):
            return _pallas_step(s, next_t, consts, cfg, N, RP,
                                steps_per_call, interpret)

        state = jax.lax.while_loop(cond, body, state)
        ex, ey = _interp_eval(state, next_t, RP)
        y = jnp.stack([ex[:N].T, ey[:N].T], axis=-1)     # (C, N, 2)
        return state, y

    state, ys_tail = jax.lax.scan(advance, state, ts[1:])
    ys = jnp.concatenate([x0b[None], ys_tail], axis=0)
    stats = {
        "nfe": state.nfe[0].astype(jnp.int32),
        "n_accepted": state.nacc[0].astype(jnp.int32),
        "n_rejected": state.nrej[0].astype(jnp.int32),
        "reached_final_time": jnp.all(state.t1 >= ts[-1]),
    }
    return ys, stats
