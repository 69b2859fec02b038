"""Shared whole-solve dopri5 recording/replay kernel bodies (Pallas TPU).

The differentiable fused adaptive solvers for the GP field
(ops/gp_dopri5_grad.py) and the MLP field (ops/mlp_dopri5.py) are the
same algorithm — forward kernel integrates the whole adaptive solve in
one while loop, RECORDING the step mesh; backward kernel sweeps the
recorded iterations in reverse, rematerializing the six dopri5 stages and
pulling cotangents through the dense-output quartics, the y_mid
combination, and the transposed stage recurrence — differing only in the
vector field and its hand-written VJP.  This module holds the two kernel
bodies once, parameterized by field callbacks:

  make_fwd_rec_kernel(make_rhs, n_weights, ...)
      make_rhs(w) -> rhs(sx, sy) -> (fx, fy) over (RP, C) planes, where
      `w` is the tuple of the field's weight/operand blocks (per-chain or
      shared; the caller's BlockSpecs decide).

  make_bwd_kernel(make_field_vjp, n_weights, n_wbar, ...)
      make_field_vjp(w) -> (rhs, rhs_vjp) with
      rhs_vjp(sx, sy, cx, cy, wbar) -> (ubx, uby, wbar'): state cotangent
      pullback plus accumulation into the first `n_wbar` weight-cotangent
      arrays (zx/zy-style shared constants receive no cotangent).

Kernel ref layout (fixed contract, both fields):
  forward : px, py, fx, fy, t1, dt, *w, ts |
            oxs, oys, nfe, nacc, nrej, t1, stx, sty, nit
  backward: stx, sty, gx, gy, *w, ts, nit | *wbar, x0bx, x0by

The integration arithmetic is the single-source helpers of
ops/gp_dopri5.py (`_rk_stages`, `_step_decision`, `_quartic_coeffs`,
`_midpoint`), so trajectories stay bit-for-bit with the non-recording
whole-solve kernel.  Discrete-adjoint semantics (frozen step mesh,
store_steps budget) are documented in ops/gp_dopri5_grad.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..ode.tableaus import DOPRI5
from .gp_dopri5 import _midpoint, _quartic_coeffs, _rk_stages, _step_decision


def _check_tableau(tableau):
    """The kernel bodies assume a 7-stage FSAL pair with quartic dense
    output (dopri5/tsit5): 6 beta rows, k7 = f(y1), c_mid present."""
    import numpy as np

    if len(tableau.beta) != 6 or tableau.c_mid is None:
        raise ValueError("fused kernels support 7-stage FSAL tableaus "
                         "with c_mid dense output (dopri5, tsit5)")
    if not np.allclose(np.asarray(tableau.c_sol[:6]),
                       np.asarray(tableau.beta[5]), atol=1e-12):
        raise ValueError("tableau is not FSAL (c_sol != last beta row)")


def make_fwd_rec_kernel(make_rhs, n_weights, rtol, atol, safety, ifactor,
                        dfactor, N, RP, T, TP, max_steps, S, SP, controller,
                        tableau=DOPRI5):
    """Whole-solve forward with step-mesh recording (see module docstring
    and ops/gp_dopri5_grad.py for the recording strategy).  `tableau` is
    any 7-stage FSAL pair with quartic dense output (DOPRI5, TSIT5)."""
    _check_tableau(tableau)

    def kernel(px_ref, py_ref, fx_ref, fy_ref, t1_ref, dt_ref, *refs):
        w = tuple(r[:] for r in refs[:n_weights])
        ts_ref = refs[n_weights]
        (oxs_ref, oys_ref, onfe_ref, onacc_ref, onrej_ref, ot1_ref,
         stx_ref, sty_ref, onit_ref) = refs[n_weights + 1:]
        tsv = ts_ref[:]
        tf = tsv[T - 1 : T, :]
        oxs_ref[:] = jnp.zeros(oxs_ref.shape, oxs_ref.dtype)
        oys_ref[:] = jnp.zeros(oys_ref.shape, oys_ref.dtype)
        # zero the record buffers: unreached rows must read take=0
        stx_ref[:] = jnp.zeros(stx_ref.shape, stx_ref.dtype)
        sty_ref[:] = jnp.zeros(sty_ref.shape, sty_ref.dtype)
        rhs = make_rhs(w)
        pi = controller == "pi"

        def cond(carry):
            (i, px, py, fx, fy, t1, dt, ep, nfe, nacc, nrej) = carry
            return jnp.any((t1 < tf) & (nacc + nrej < max_steps))

        def body(carry):
            (i, px, py, fx, fy, t1, dt, ep, nfe, nacc, nrej) = carry
            active = (t1 < tf) & (nacc + nrej < max_steps)

            kx, ky, y1x, y1y, f1x, f1y = _rk_stages(rhs, px, py, fx, fy,
                                                    dt, tableau)
            accept, ratio, dt_next, ep_next = _step_decision(
                kx, ky, px, py, y1x, y1y, dt, rtol, atol, safety, ifactor,
                dfactor, N, RP, err_prev=ep if pi else None,
                tableau=tableau)
            if ep_next is None:
                ep_next = ep

            take = active & accept
            step_taken = active

            # ---- record this iteration's step mesh (clamped on overflow:
            # the trajectory stays exact, the gradient is then invalid —
            # see ops/gp_dopri5_grad.py docstring) ----
            row = jnp.minimum(i, S - 1) * SP
            # zero-size pads crash Mosaic ("positive constant sizes"):
            # only emit the filler rows when SP - 3 - N > 0
            zpad = ([jnp.zeros((SP - 3 - N, px.shape[1]), px.dtype)]
                    if SP - 3 - N > 0 else [])
            stx_ref[pl.ds(row, SP), :] = jnp.concatenate(
                [px[:N]] + zpad + [dt, t1, take.astype(px.dtype)], axis=0)
            sty_ref[pl.ds(row, SP), :] = jnp.concatenate(
                [py[:N]] + zpad + [jnp.zeros((3, px.shape[1]), px.dtype)],
                axis=0)

            emit = (tsv > t1) & (tsv <= t1 + dt) & take

            @pl.when(jnp.any(emit))
            def _():
                midx = _midpoint(px, kx, dt, tableau)
                midy = _midpoint(py, ky, dt, tableau)
                cfs_x = _quartic_coeffs(px, y1x, midx, fx, f1x, dt)
                cfs_y = _quartic_coeffs(py, y1y, midy, fy, f1y, dt)
                X = (tsv - t1) / dt

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
                i + 1,
                sel(y1x, px), sel(y1y, py), sel(f1x, fx), sel(f1y, fy),
                sel(t1 + dt, t1),
                jnp.where(step_taken, dt_next, dt),
                jnp.where(step_taken, ep_next, ep),
                nfe + 6.0 * fstep, nacc + facc, nrej + fstep - facc,
            )

        carry = (jnp.int32(0),
                 px_ref[:], py_ref[:], fx_ref[:], fy_ref[:], t1_ref[:],
                 dt_ref[:], jnp.ones_like(t1_ref[:]),
                 jnp.full_like(t1_ref[:], 2.0),
                 jnp.zeros_like(t1_ref[:]), jnp.zeros_like(t1_ref[:]))
        (i, px, py, _, _, t1, _, _, nfe, nacc, nrej) = jax.lax.while_loop(
            cond, body, carry)

        rest = tsv > t1

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
        onit_ref[:] = jnp.full_like(t1, i.astype(jnp.float32))

    return kernel


def make_bwd_kernel(make_field_vjp, n_weights, n_wbar, N, RP, T, TP, S, SP,
                    tableau=DOPRI5):
    """Reverse sweep over the recorded step mesh (see module docstring).

    The adjoint carry is (lx, ly, wbar) with wbar a tuple of `n_wbar`
    arrays shaped like the first `n_wbar` weight blocks; rejected /
    inactive rows pass both the state adjoint and the weight cotangents
    through untouched.  The stage-recurrence transpose only assumes the
    7-stage FSAL structure, so any `_check_tableau`-accepted pair works."""
    _check_tableau(tableau)
    beta = [[float(b) for b in row] for row in tableau.beta]
    c_mid = [float(c) for c in tableau.c_mid]

    def kernel(stx_ref, sty_ref, gx_ref, gy_ref, *refs):
        w = tuple(r[:] for r in refs[:n_weights])
        ts_ref, nit_ref = refs[n_weights], refs[n_weights + 1]
        outs = refs[n_weights + 2:]              # n_wbar wbar + x0 bar x/y
        rhs, rhs_vjp = make_field_vjp(w)
        tsv = ts_ref[:]                              # (TP, 1)
        C = stx_ref.shape[1]
        niter = jnp.minimum(jnp.max(nit_ref[:]).astype(jnp.int32), S)

        def body(j, carry):
            lx, ly, wbar = carry
            it = niter - 1 - j
            bx = stx_ref[pl.ds(it * SP, SP), :]
            by = sty_ref[pl.ds(it * SP, SP), :]
            zrows = ([jnp.zeros((RP - N, C), jnp.float32)]
                     if RP > N else [])
            y0x = jnp.concatenate([bx[:N]] + zrows, 0)     # (RP, C)
            y0y = jnp.concatenate([by[:N]] + zrows, 0)
            dt = bx[SP - 3 : SP - 2, :]                    # (1, C)
            t0 = bx[SP - 2 : SP - 1, :]
            take = bx[SP - 1 : SP, :] > 0.5
            dts = jnp.where(dt > 0, dt, 1.0)               # unwritten rows

            # ---- recompute stages, keeping the stage points ----
            f0x, f0y = rhs(y0x, y0y)
            kx, ky = [f0x], [f0y]
            uxs, uys = [], []
            for row in beta:
                incx = sum(b * k for b, k in zip(row, kx) if b != 0.0)
                incy = sum(b * k for b, k in zip(row, ky) if b != 0.0)
                ux = y0x + dts * incx
                uy = y0y + dts * incy
                uxs.append(ux)
                uys.append(uy)
                fxi, fyi = rhs(ux, uy)
                kx.append(fxi)
                ky.append(fyi)
            y1x, y1y = uxs[5], uys[5]                      # last stage point

            # ---- quartic dense-output VJP for the times this step emitted
            # (transpose of the forward kernel's Horner evaluation +
            # _quartic_coeffs linear map) ----
            emit = (tsv > t0) & (tsv <= t0 + dt) & take    # (TP, C)
            X1 = jnp.where(emit, (tsv - t0) / dts, 0.0)
            X2 = X1 * X1
            X3 = X2 * X1
            X4 = X2 * X2

            def quartic_bar(g_ref):
                y0b, y1b, ymb, f0b, f1b = [], [], [], [], []
                for n in range(N):
                    wgt = jnp.where(emit, g_ref[pl.ds(n * TP, TP), :], 0.0)
                    a = jnp.sum(wgt * X4, 0, keepdims=True)  # (1, C)
                    b = jnp.sum(wgt * X3, 0, keepdims=True)
                    c = jnp.sum(wgt * X2, 0, keepdims=True)
                    d = jnp.sum(wgt * X1, 0, keepdims=True)
                    e = jnp.sum(wgt, 0, keepdims=True)
                    y0b.append(-8 * a + 18 * b - 11 * c + e)
                    y1b.append(-8 * a + 14 * b - 5 * c)
                    ymb.append(16 * a - 32 * b + 16 * c)
                    f0b.append(dts * (-2 * a + 5 * b - 4 * c + d))
                    f1b.append(dts * (2 * a - 3 * b + c))
                pad = ([jnp.zeros((RP - N, C), jnp.float32)]
                       if RP > N else [])
                return tuple(jnp.concatenate(v + pad, 0)
                             for v in (y0b, y1b, ymb, f0b, f1b))

            y0bx, y1bx, ymbx, f0bx, f1bx = quartic_bar(gx_ref)
            y0by, y1by, ymby, f0by, f1by = quartic_bar(gy_ref)

            # y_mid = y0 + dt * (c_mid . k)
            kbx = [dts * c * ymbx if c != 0.0 else jnp.zeros_like(ymbx)
                   for c in c_mid]
            kby = [dts * c * ymby if c != 0.0 else jnp.zeros_like(ymby)
                   for c in c_mid]
            y0bx = y0bx + ymbx
            y0by = y0by + ymby

            # k7 = f(y1): cotangent = carried-in f1_bar + c_mid share
            wbar_i = tuple(jnp.zeros_like(wb) for wb in wbar)
            ubx, uby, wbar_i = rhs_vjp(y1x, y1y, kbx[6] + f1bx,
                                       kby[6] + f1by, wbar_i)
            y1tx = lx + y1bx + ubx
            y1ty = ly + y1by + uby

            # y1 = y0 + dt * (beta[5] . k)
            y0bx = y0bx + y1tx
            y0by = y0by + y1ty
            for jj, b in enumerate(beta[5]):
                if b != 0.0:
                    kbx[jj] = kbx[jj] + dts * b * y1tx
                    kby[jj] = kby[jj] + dts * b * y1ty

            # stages 6..2: k_{r+2} = f(u_{r+1}), u_{r+1} = y0 + dt beta[r].k
            for r in range(4, -1, -1):
                ubx, uby, wbar_i = rhs_vjp(uxs[r], uys[r],
                                           kbx[r + 1], kby[r + 1], wbar_i)
                y0bx = y0bx + ubx
                y0by = y0by + uby
                for jj, b in enumerate(beta[r]):
                    if b != 0.0:
                        kbx[jj] = kbx[jj] + dts * b * ubx
                        kby[jj] = kby[jj] + dts * b * uby

            # k1 = f(y0) (FSAL recomputed, so f0_bar lands here too)
            ubx, uby, wbar_i = rhs_vjp(y0x, y0y, kbx[0] + f0bx,
                                       kby[0] + f0by, wbar_i)
            y0bx = y0bx + ubx
            y0by = y0by + uby

            # rejected / inactive rows: adjoint passes through untouched
            lx = jnp.where(take, y0bx, lx)
            ly = jnp.where(take, y0by, ly)
            wbar = tuple(wb + jnp.where(take, wbi, 0.0)
                         for wb, wbi in zip(wbar, wbar_i))
            return lx, ly, wbar

        z_rp = jnp.zeros((RP, C), jnp.float32)
        wbar0 = tuple(jnp.zeros_like(w[k]) for k in range(n_wbar))
        lx, ly, wbar = jax.lax.fori_loop(
            0, niter, body, (z_rp, z_rp, wbar0))
        for o, g in zip(outs[:n_wbar], wbar):
            o[:] = g
        outs[n_wbar][:] = lx
        outs[n_wbar + 1][:] = ly

    return kernel
