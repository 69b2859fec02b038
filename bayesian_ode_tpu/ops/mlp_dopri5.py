"""Differentiable whole-solve fused dopri5 for the MLP field (custom VJP).

The adaptive-solver machinery is the same single-source helpers as the GP
whole-solve kernels (ops/gp_dopri5.py: `_rk_stages`, `_step_decision`,
`_quartic_coeffs`, `_midpoint` — tableau, controller, ulps floor, dense
output all identical to the generic integrator), and the discrete-adjoint
strategy is ops/gp_dopri5_grad.py's verbatim: the forward kernel records
the accepted-step mesh per lockstep iteration, the backward kernel sweeps
it in reverse, rematerializing the six dopri5 stages and pulling
cotangents back through the emitted quartic dense-output evaluations, the
y_mid combination, and the transposed stage recurrence.  Only the vector
field differs: the reference's NN mean-function baseline

    f(x) = W3^T elu(W2^T elu(W1^T x + b1) + b2) + b3

(notebooks/jai/nn.ipynb cell 4) with per-chain weights packed lane-major
exactly as ops/mlp_rk4.py does, and the hand-written layer VJPs of
mlp_rk4's `_mlp_factory` replacing the GP kernel algebra.

This closes the last fused-engine gap: model="nn" at an adaptive dopri5
tolerance previously had to run through the generic bounded-scan
integrator; now SGLD/pSGLD/aSGHMC/MALA on the NN posterior run fused end
to end at solver tolerance, same as the GP north-star configuration.

Step sizes are frozen constants of the backward pass (discrete adjoint at
tolerance — the gradient-noise analysis in ops/gp_dopri5_grad.py's module
docstring applies unchanged).  The `store_steps` budget caveat also
applies: gradients are valid only while every tile's lockstep iteration
count stays within the record buffer.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ode.tableaus import DOPRI5
from .gp_dopri5 import (
    _FAR,
    _hairer_initial_step,
    _midpoint,
    _pad8,
    _quartic_coeffs,
    _rk_stages,
    _step_decision,
)
from .gp_dopri5_grad import _store_block_height
from .mlp_rk4 import _mlp_factory, _pack_weights


def _w_rows(H: int) -> int:
    """Total packed weight rows: w1x/w1y/b1/b2/w3x/w3y (H each), w2 (H*H),
    b3x/b3y (1 each)."""
    return 6 * H + H * H + 2


def _make_fwd_rec_kernel(H, rtol, atol, safety, ifactor, dfactor,
                         N, RP, T, TP, max_steps, S, SP, controller):
    """gp_dopri5_grad._make_fwd_rec_kernel with the MLP field."""
    mlp_rhs, _ = _mlp_factory(H, N, RP)

    def kernel(px_ref, py_ref, fx_ref, fy_ref, t1_ref, dt_ref, *refs):
        w = tuple(r[:] for r in refs[:9])
        ts_ref = refs[9]
        (oxs_ref, oys_ref, onfe_ref, onacc_ref, onrej_ref, ot1_ref,
         stx_ref, sty_ref, onit_ref) = refs[10:]
        tsv = ts_ref[:]
        tf = tsv[T - 1 : T, :]
        oxs_ref[:] = jnp.zeros(oxs_ref.shape, oxs_ref.dtype)
        oys_ref[:] = jnp.zeros(oys_ref.shape, oys_ref.dtype)
        stx_ref[:] = jnp.zeros(stx_ref.shape, stx_ref.dtype)
        sty_ref[:] = jnp.zeros(sty_ref.shape, sty_ref.dtype)
        rhs = lambda sx, sy: mlp_rhs(sx, sy, w)  # noqa: E731
        pi = controller == "pi"

        def cond(carry):
            (i, px, py, fx, fy, t1, dt, ep, nfe, nacc, nrej) = carry
            return jnp.any((t1 < tf) & (nacc + nrej < max_steps))

        def body(carry):
            (i, px, py, fx, fy, t1, dt, ep, nfe, nacc, nrej) = carry
            active = (t1 < tf) & (nacc + nrej < max_steps)

            kx, ky, y1x, y1y, f1x, f1y = _rk_stages(rhs, px, py, fx, fy, dt)
            accept, ratio, dt_next, ep_next = _step_decision(
                kx, ky, px, py, y1x, y1y, dt, rtol, atol, safety, ifactor,
                dfactor, N, RP, err_prev=ep if pi else None)
            if ep_next is None:
                ep_next = ep

            take = active & accept
            step_taken = active

            row = jnp.minimum(i, S - 1) * SP
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
                midx = _midpoint(px, kx, dt)
                midy = _midpoint(py, ky, dt)
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


def _make_bwd_kernel(H, N, RP, T, TP, S, SP):
    """gp_dopri5_grad._make_bwd_kernel with the MLP layer VJPs; the carry
    accumulates the 9 packed weight cotangents instead of (A_bar_x/y)."""
    beta = [[float(b) for b in row] for row in DOPRI5.beta]
    c_mid = [float(c) for c in DOPRI5.c_mid]
    mlp_rhs, mlp_rhs_vjp = _mlp_factory(H, N, RP)

    def kernel(stx_ref, sty_ref, gx_ref, gy_ref, *refs):
        w = tuple(r[:] for r in refs[:9])
        ts_ref, nit_ref = refs[9], refs[10]
        outs = refs[11:]                             # 9 wbar + x0 bar x/y
        rhs = lambda sx, sy: mlp_rhs(sx, sy, w)  # noqa: E731
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

            # ---- quartic dense-output VJP (identical to the GP kernel) --
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
            wbar_i = tuple(jnp.zeros_like(wi) for wi in w)
            ubx, uby, wbar_i = mlp_rhs_vjp(y1x, y1y, kbx[6] + f1bx,
                                           kby[6] + f1by, w, wbar_i)
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
                ubx, uby, wbar_i = mlp_rhs_vjp(uxs[r], uys[r],
                                               kbx[r + 1], kby[r + 1],
                                               w, wbar_i)
                y0bx = y0bx + ubx
                y0by = y0by + uby
                for jj, b in enumerate(beta[r]):
                    if b != 0.0:
                        kbx[jj] = kbx[jj] + dts * b * ubx
                        kby[jj] = kby[jj] + dts * b * uby

            # k1 = f(y0) (FSAL recomputed, so f0_bar lands here too)
            ubx, uby, wbar_i = mlp_rhs_vjp(y0x, y0y, kbx[0] + f0bx,
                                           kby[0] + f0by, w, wbar_i)
            y0bx = y0bx + ubx
            y0by = y0by + uby

            # rejected / inactive rows: adjoint passes through untouched
            lx = jnp.where(take, y0bx, lx)
            ly = jnp.where(take, y0by, ly)
            wbar = tuple(wb + jnp.where(take, wbi, 0.0)
                         for wb, wbi in zip(wbar, wbar_i))
            return lx, ly, wbar

        z_rp = jnp.zeros((RP, C), jnp.float32)
        wbar0 = tuple(jnp.zeros_like(wi) for wi in w)
        lx, ly, wbar = jax.lax.fori_loop(
            0, niter, body, (z_rp, z_rp, wbar0))
        for o, g in zip(outs[:9], wbar):
            o[:] = g
        outs[9][:] = lx
        outs[10][:] = ly

    return kernel


# VMEM sizing.  The backward sweep's unrolled 7x rhs + 7x rhs_vjp keeps the
# stage points, the 7 k-cotangents, both weight sets (w, wbar, wbar_i) and
# the per-point MLP intermediates (4 H-row activations per of the N points)
# live on the Mosaic stack; the model below is deliberately generous and
# the per-kernel scoped-vmem limit is raised to match (same strategy as
# ops/gp_dopri5_grad.py, where the measured stack at tile=512 was 25 MiB).
_BWD_STACK_BUDGET = 48 * 1024 * 1024
_BWD_VMEM_LIMIT = 100 * 1024 * 1024


def _fwd_tile_for(C_in, tile, H, N, TP, S, SP):
    W = _w_rows(H)
    tile = max(128, min(tile, ((C_in + 127) // 128) * 128))
    tile -= tile % 128
    while tile > 128 and tile * (3000 + 8 * W + 16 * N * TP + 16 * S * SP) \
            > (15 * 1024 * 1024):
        tile -= 128
    return tile


def _bwd_stack_bytes(tile, H, N, TP, RP):
    # per-point MLP temporaries (a1/h1/a2/h2 + h1b/a2b chains, ~6 H-row
    # slots each) stay live across the UNROLLED N-point python loop in
    # rhs_vjp, so the stack scales with N, not just RP
    W = _w_rows(H)
    return tile * 4 * (6 * W + 40 * RP + 12 * TP + 36 * H * max(N, 1))


def _bwd_block_bytes(tile, H, N, TP, S, SP, RP):
    W = _w_rows(H)
    return tile * 4 * (2 * S * SP + 2 * N * TP + 4 * W + 2 * RP + 8)


def _bwd_tile_for(C, tile, H, N, TP, S, SP, RP):
    tile = min(tile, C)

    def fits(t):
        return (_bwd_stack_bytes(t, H, N, TP, RP) <= _BWD_STACK_BUDGET
                and _bwd_stack_bytes(t, H, N, TP, RP)
                + 2 * _bwd_block_bytes(t, H, N, TP, S, SP, RP)
                <= _BWD_VMEM_LIMIT)

    while tile > 128 and (C % tile or not fits(tile)):
        tile -= 128
    return tile


def _fwd_impl(packed, x0, ts, H, rtol, atol, safety, ifactor, dfactor,
              max_steps, store_steps, controller, tile, interpret):
    C_in = packed[0].shape[1]
    f32 = jnp.float32
    ts = ts.astype(f32)
    N = x0.shape[-2]
    RP = _pad8(N)
    SP = _store_block_height(N, RP)
    T = ts.shape[0]
    TP = _pad8(T)
    S = store_steps

    tile = _fwd_tile_for(C_in, tile, H, N, TP, S, SP)
    C = ((C_in + tile - 1) // tile) * tile
    if C != C_in:
        # pad lanes replicate chain 0's weights; their output cotangents
        # are zeroed in _bwd_rule so they contribute no spurious gradient
        packed = tuple(
            jnp.concatenate(
                [wi, jnp.broadcast_to(wi[:, :1], wi.shape[:1] + (C - C_in,))],
                axis=1)
            for wi in packed)

    x0b = jnp.broadcast_to(x0.astype(f32), (C, N, 2))

    def pack_points(p):      # (C, N) -> (RP, C)
        return jnp.concatenate([p.T, jnp.zeros((RP - N, C), f32)], axis=0)

    px = pack_points(x0b[:, :, 0])
    py = pack_points(x0b[:, :, 1])

    # Hairer-style initial derivative + dt (XLA, once) on the packed
    # weights directly (same math as models.mlp.mlp_vector_field)
    from .mlp_rk4 import _elu

    (w1x, w1y, b1, w2, b2, w3x, w3y, b3x, b3y) = packed

    def rhs_ref(pts):                                # (C, N, 2)
        x = pts[..., 0].T                            # (N, C) -> rows
        y = pts[..., 1].T
        fx_rows, fy_rows = [], []
        for n in range(N):
            a1 = w1x * x[n : n + 1] + w1y * y[n : n + 1] + b1
            h1 = _elu(a1)
            a2 = jnp.concatenate(
                [jnp.sum(w2[j * H : (j + 1) * H] * h1, 0, keepdims=True)
                 for j in range(H)], 0) + b2
            h2 = _elu(a2)
            fx_rows.append(jnp.sum(w3x * h2, 0, keepdims=True) + b3x)
            fy_rows.append(jnp.sum(w3y * h2, 0, keepdims=True) + b3y)
        fx = jnp.concatenate(fx_rows, 0)             # (N, C)
        fy = jnp.concatenate(fy_rows, 0)
        return jnp.stack([fx.T, fy.T], axis=-1)      # (C, N, 2)

    f0, dt0 = _hairer_initial_step(rhs_ref, x0b, rtol, atol)
    fxp = pack_points(f0[:, :, 0])
    fyp = pack_points(f0[:, :, 1])
    tsp = jnp.concatenate([ts, jnp.full((TP - T,), _FAR, f32)])[:, None]
    t1 = jnp.full((1, C), ts[0], f32)

    kernel = _make_fwd_rec_kernel(H, rtol, atol, safety, ifactor, dfactor,
                                  N, RP, T, TP, max_steps, S, SP,
                                  controller)

    def vtile(rows):
        return pl.BlockSpec((rows, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def vshared(rows, cols=1):
        return pl.BlockSpec((rows, cols), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        kernel,
        grid=(C // tile,),
        in_specs=[vtile(RP), vtile(RP), vtile(RP), vtile(RP),
                  vtile(1), vtile(1)]
        + [vtile(wi.shape[0]) for wi in packed]
        + [vshared(TP)],
        out_specs=[vtile(N * TP), vtile(N * TP), vtile(1), vtile(1),
                   vtile(1), vtile(1), vtile(S * SP), vtile(S * SP),
                   vtile(1)],
        out_shape=[jax.ShapeDtypeStruct((N * TP, C), f32)] * 2
        + [jax.ShapeDtypeStruct((1, C), f32)] * 4
        + [jax.ShapeDtypeStruct((S * SP, C), f32)] * 2
        + [jax.ShapeDtypeStruct((1, C), f32)],
        interpret=interpret,
    )(px, py, fxp, fyp, t1, dt0, *packed, tsp)
    oxs, oys, nfe, nacc, nrej, t1f, stx, sty, nit = outs

    ys = jnp.stack(
        [oxs.reshape(N, TP, C)[:, :T], oys.reshape(N, TP, C)[:, :T]],
        axis=-1,
    )
    ys = jnp.moveaxis(ys, 0, 2)                    # (T, C, N, 2)
    ys = ys.at[0].set(x0b)
    ys = ys[:, :C_in]
    return ys, (packed, stx, sty, nit, tsp)


@partial(jax.custom_vjp, nondiff_argnums=tuple(range(3, 14)))
def _traj(packed, x0, ts, H, rtol, atol, safety, ifactor, dfactor,
          max_steps, store_steps, controller, tile, interpret):
    return _fwd_impl(packed, x0, ts, H, rtol, atol, safety, ifactor,
                     dfactor, max_steps, store_steps, controller, tile,
                     interpret)[0]


def _fwd_rule(packed, x0, ts, H, rtol, atol, safety, ifactor, dfactor,
              max_steps, store_steps, controller, tile, interpret):
    ys, res = _fwd_impl(packed, x0, ts, H, rtol, atol, safety, ifactor,
                        dfactor, max_steps, store_steps, controller, tile,
                        interpret)
    return ys, (x0, ts) + res


def _bwd_rule(H, rtol, atol, safety, ifactor, dfactor, max_steps,
              store_steps, controller, tile, interpret, res, g):
    (x0, ts, packed_pad, stx, sty, nit, tsp) = res
    C = packed_pad[0].shape[1]                     # forward's padded grid
    f32 = jnp.float32
    N = x0.shape[-2]
    RP = _pad8(N)
    SP = _store_block_height(N, RP)
    T = ts.shape[0]
    TP = _pad8(T)
    S = store_steps
    C_in = g.shape[1]
    # re-derive the FORWARD's 128-aligned tile first (gp_dopri5_grad.py's
    # _bwd_rule does the same): walking down from the raw user tile could
    # leave the 128 lattice and pick a backward tile that does not divide
    # the padded C, silently skipping trailing chains in the grid
    tile_f = _fwd_tile_for(C_in, tile, H, N, TP, S, SP)
    tile_ = _bwd_tile_for(C, tile_f, H, N, TP, S, SP, RP)

    g = g.astype(f32)                              # (T, C_in, N, 2)
    g0 = g[0]                                      # (C_in, N, 2)
    gk = g.at[0].set(0.0)
    if C != C_in:                                  # zero-pad the pad lanes
        gk = jnp.concatenate(
            [gk, jnp.zeros((T, C - C_in, N, 2), f32)], axis=1)
    gT = jnp.moveaxis(gk, 1, 2)                    # (T, N, C, 2)
    zpad = jnp.zeros((TP - T, N, C, 2), f32)
    gT = jnp.concatenate([gT, zpad], axis=0)       # (TP, N, C, 2)
    gT = jnp.moveaxis(gT, 1, 0)                    # (N, TP, C, 2)
    gx = gT[..., 0].reshape(N * TP, C)
    gy = gT[..., 1].reshape(N * TP, C)

    kernel = _make_bwd_kernel(H, N, RP, T, TP, S, SP)

    def vtile(rows):
        return pl.BlockSpec((rows, tile_), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def vshared(rows, cols=1):
        return pl.BlockSpec((rows, cols), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        kernel,
        grid=(C // tile_,),
        in_specs=[vtile(S * SP), vtile(S * SP), vtile(N * TP),
                  vtile(N * TP)]
        + [vtile(wi.shape[0]) for wi in packed_pad]
        + [vshared(TP), vtile(1)],
        out_specs=[vtile(wi.shape[0]) for wi in packed_pad]
        + [vtile(RP), vtile(RP)],
        out_shape=[jax.ShapeDtypeStruct(wi.shape, f32) for wi in packed_pad]
        + [jax.ShapeDtypeStruct((RP, C), f32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_BWD_VMEM_LIMIT),
        interpret=interpret,
    )(stx, sty, gx, gy, *packed_pad, tsp, nit)

    wbar = tuple(o[:, :C_in] for o in outs[:9])
    x0bx, x0by = outs[9], outs[10]
    x0_bar = jnp.stack(
        [jnp.sum(x0bx[:N], axis=1), jnp.sum(x0by[:N], axis=1)], axis=-1
    ) + jnp.sum(g0, axis=0)
    return wbar, x0_bar.astype(x0.dtype), jnp.zeros_like(ts)


_traj.defvjp(_fwd_rule, _bwd_rule)


def mlp_dopri5_trajectory(params, x0, ts, rtol=1e-7, atol=1e-9,
                          safety=0.9, ifactor=10.0, dfactor=0.2,
                          max_steps=100_000, store_steps=128,
                          controller="i", tile=256, interpret=False):
    """Adaptive dopri5 trajectories of the MLP field, differentiable
    w.r.t. params and x0 through a hand-written discrete adjoint.

    params: models.mlp layer list with leading chain axis C (exactly
    [2, H, H, 2] sizes); x0 (N, 2) shared; ts (T,) increasing.  Returns
    (T, C, N, 2).  Any C >= 1 (padded to the tile internally).  Gradients
    require max(n_accepted + n_rejected) <= store_steps per chain.
    """
    if controller not in ("i", "pi"):
        raise ValueError(
            f"unknown step controller {controller!r}; expected 'i' or 'pi'")
    H = params[0]["w"].shape[-1]
    packed = _pack_weights(params, params[0]["w"].shape[0], H)
    return _traj(packed, x0, ts, H, float(rtol), float(atol),
                 float(safety), float(ifactor), float(dfactor),
                 int(max_steps), int(store_steps), controller, tile,
                 interpret)


def mlp_dopri5_solve_stats(params, x0, ts, rtol=1e-7, atol=1e-9,
                           safety=0.9, ifactor=10.0, dfactor=0.2,
                           max_steps=100_000, store_steps=128,
                           controller="i", tile=256, interpret=False):
    """Forward solve returning (trajectory, stats) where stats carries the
    per-tile lockstep iteration count `n_iterations` (C,) — the quantity
    the `store_steps` gradient budget must cover.  Use it to size
    `store_steps` before a long sampling run (the GP field has
    `gp_dopri5_solve_whole`'s stats for this; the MLP field's step counts
    are field-dependent and not pre-measured)."""
    H = params[0]["w"].shape[-1]
    packed = _pack_weights(params, params[0]["w"].shape[0], H)
    ys, (packed_pad, stx, sty, nit, tsp) = _fwd_impl(
        packed, x0, ts, H, float(rtol), float(atol), float(safety),
        float(ifactor), float(dfactor), int(max_steps), int(store_steps),
        controller, tile, interpret)
    C_in = packed[0].shape[1]
    return ys, {"n_iterations": nit[0, :C_in]}


def make_fused_mlp_potential_dopri5(x0, ts, X, reg: float = 0.5,
                                    rtol=1e-7, atol=1e-9,
                                    max_steps=100_000, store_steps=128,
                                    controller="i", tile=256,
                                    interpret=None):
    """Batched MLP posterior potential (SSE + L2 prior, nn.ipynb cell 6)
    with the solve at adaptive dopri5 tolerance through the fused
    differentiable whole-solve kernel; `jax.grad` flows through the
    hand-written discrete adjoint.  Matches models.mlp.make_potential with
    solve=odeint(method='dopri5') numerically."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    X = jnp.asarray(X, jnp.float32)

    def potential_batch(params):
        traj = mlp_dopri5_trajectory(params, x0, ts, rtol=rtol, atol=atol,
                                     max_steps=max_steps,
                                     store_steps=store_steps,
                                     controller=controller, tile=tile,
                                     interpret=interpret)
        xode = jnp.transpose(traj, (1, 2, 0, 3))       # (C, N, T, 2)
        loss = jnp.sum((X[None] - xode) ** 2, axis=(1, 2, 3))
        l2 = sum(
            jnp.sum(layer["w"].reshape(layer["w"].shape[0], -1) ** 2, axis=1)
            + jnp.sum(layer["b"] ** 2, axis=1)
            for layer in params
        )
        return loss + reg * l2

    return potential_batch
