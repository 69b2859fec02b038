"""Differentiable whole-solve fused dopri5 for the GP field (custom VJP).

Round-1's `gp_dopri5_solve_whole` (ops/gp_dopri5.py) made the forward
adaptive solve one Pallas kernel, but SGLD at the north-star configuration
(10k chains, dopri5 rtol=1e-7; BASELINE.json) still had to take gradients
through the generic `mode="bounded"` integrator.  This module closes that
gap with the discrete-adjoint strategy of ops/gp_rk4.py applied to the
adaptive solver:

  - forward: the whole-solve kernel, additionally RECORDING the accepted
    step mesh — per while-loop iteration it stores the step-start state
    (the 2N coordinates), dt, t0 and an "accepted" flag into a lockstep
    (store_steps x SP, C) VMEM buffer at the iteration index (a scalar
    dynamic row store; per-lane scatter by acceptance count is not a TPU
    vector op, and lockstep iterations only exceed useful steps by the
    tile's step-count spread);
  - backward: ONE Pallas kernel sweeps the recorded iterations in reverse,
    recomputing the six dopri5 stages from each stored step start
    (rematerialization) and applying hand-derived VJPs of the GP field
    (same formulas as ops/gp_rk4.py:54-76) through

      * the quartic dense-output evaluations this step emitted (the
        observation-time cotangents enter HERE: each emitted time's
        cotangent is pulled back through the Horner evaluation to the
        interp_fit coefficients and on to (y0, y1, y_mid, f0, f1)),
      * the y_mid combination (linear in the k stages),
      * the RK stage recurrence (transposed stage-by-stage),

    with rejected-step / inactive-lane rows passing the adjoint through
    unchanged (their `take` flag is 0).

Step sizes are treated as CONSTANTS of the backward pass (the "frozen
step mesh" discrete adjoint): the controller's dependence on the
parameters contributes O(local error) = O(rtol) relative terms.  At
rtol=1e-7 that is BELOW the f32 accumulation floor — measured against
the generic mode="bounded" backprop run in float64 (VDP posterior,
C=16): this kernel 2.1e-4 max-rel, the generic f32 path 3.1e-4, i.e.
the hand-written adjoint is at the f32 noise floor and no noisier than
the generic backprop.  This matches the
reference's semantics of gradients-at-tolerance (torchdiffeq treats the
integrator output as the function being differentiated,
/root/reference/torchdiffeq/_impl/adjoint.py:63-98).

Budget caveat: the recording buffer holds `store_steps` lockstep
iterations.  If any tile executes more (max over its lanes of
accepted+rejected steps), later iterations clobber the last row and the
GRADIENT is invalid (the forward trajectory is still exact).  Size
`store_steps` from `gp_dopri5_solve_whole`'s stats
(max(n_accepted + n_rejected) plus margin); the default 128 is ~2.4x the
VDP-posterior mean at rtol=1e-7.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gp_dopri5 import _FAR, _make_rhs, _pack_initial, _pad8


class _StaticLite(NamedTuple):
    Z: jax.Array
    sf: float
    ell: float


def _store_block_height(N: int, RP: int) -> int:
    """Rows per recorded iteration: N state rows + 3 aux rows (dt, t0,
    take), padded to the 8-row sublane tile."""
    return RP if RP - N >= 3 else RP + 8


def _make_rhs_vjp(sf: float, ell: float, N: int, RP: int, ax, ay, zx, zy):
    """VJP of the GP field closure (math of ops/gp_rk4.py:54-76):
    given cotangents (cx, cy) of f at the N points, returns
    (u_bar_x, u_bar_y (RP, C); A_bar_x, A_bar_y (MP, C))."""
    sf2 = sf * sf
    inv2ell2 = 0.5 / (ell * ell)
    invell2 = 1.0 / (ell * ell)

    def rhs_vjp(sx, sy, cx, cy):
        ubx, uby = [], []
        abx = jnp.zeros_like(ax)
        aby = jnp.zeros_like(ay)
        for n in range(N):
            dxn = sx[n : n + 1, :] - zx
            dyn = sy[n : n + 1, :] - zy
            K = sf2 * jnp.exp(-(dxn * dxn + dyn * dyn) * inv2ell2)
            cxn = cx[n : n + 1, :]
            cyn = cy[n : n + 1, :]
            abx = abx + K * cxn
            aby = aby + K * cyn
            adotc = ax * cxn + ay * cyn
            w = K * adotc * invell2
            ubx.append(jnp.sum(w * (-dxn), 0, keepdims=True))
            uby.append(jnp.sum(w * (-dyn), 0, keepdims=True))
        pad = jnp.zeros_like(ubx[0])
        return (jnp.concatenate(ubx + [pad] * (RP - N), 0),
                jnp.concatenate(uby + [pad] * (RP - N), 0), abx, aby)

    return rhs_vjp


def _make_fwd_rec_kernel(sf, ell, rtol, atol, safety, ifactor, dfactor,
                         N, RP, T, TP, max_steps, S, SP, controller):
    """gp_dopri5._make_whole_kernel plus step-mesh recording: the shared
    recording body (ops/fused_adaptive.py) over the GP field.  The
    integration arithmetic is the same shared helpers, so trajectories
    match the non-recording kernel bit for bit."""
    from .fused_adaptive import make_fwd_rec_kernel

    def make_rhs(w):
        ax, ay, zx, zy = w
        return _make_rhs(sf, ell, N, RP, ax, ay, zx, zy)

    return make_fwd_rec_kernel(make_rhs, 4, rtol, atol, safety, ifactor,
                               dfactor, N, RP, T, TP, max_steps, S, SP,
                               controller)


def _make_bwd_kernel(sf, ell, N, RP, T, TP, S, SP):
    """Reverse sweep over the recorded step mesh: the shared replay body
    (ops/fused_adaptive.py) over the GP field's hand-written VJP.  The
    weight blocks are (ax, ay, zx, zy); only (ax, ay) receive cotangents
    (zx/zy are the shared inducing grid)."""
    from .fused_adaptive import make_bwd_kernel

    def make_field_vjp(w):
        ax, ay, zx, zy = w
        rhs = _make_rhs(sf, ell, N, RP, ax, ay, zx, zy)
        raw_vjp = _make_rhs_vjp(sf, ell, N, RP, ax, ay, zx, zy)

        def rhs_vjp(sx, sy, cx, cy, wbar):
            ubx, uby, dax, day = raw_vjp(sx, sy, cx, cy)
            return ubx, uby, (wbar[0] + dax, wbar[1] + day)

        return rhs, rhs_vjp

    return make_bwd_kernel(make_field_vjp, 4, 2, N, RP, T, TP, S, SP)


def _tile_for(C_in, tile, N, TP, S, SP):
    """Forward VMEM walk-down: per-lane bytes ~ (fixed inputs + 2x
    double-buffered output/record blocks) against the 16 MiB budget
    (model of gp_dopri5.gp_dopri5_solve_whole)."""
    tile = max(128, min(tile, ((C_in + 127) // 128) * 128))
    tile -= tile % 128
    while tile > 128 and tile * (3000 + 16 * N * TP + 16 * S * SP) > (
            15 * 1024 * 1024):
        tile -= 128
    return tile


# Backward budgets (bytes).  The reverse sweep's Mosaic STACK is the binding
# constraint, not the block buffers: the fully-unrolled 7x rhs + 7x rhs_vjp
# per fori_loop iteration keeps ~64 live f32 (MP, tile) slots per chain of
# N - measured 25.0 MiB at tile=512, N=5, MP=40 on v5e (r2 bench log), which
# overflows the default 16 MiB scoped-vmem limit.  We raise the per-kernel
# limit via CompilerParams and size the tile so stack + double-buffered
# blocks stay well inside the 128 MiB v5e VMEM.
_BWD_STACK_BUDGET = 48 * 1024 * 1024
_BWD_VMEM_LIMIT = 100 * 1024 * 1024


def _bwd_stack_bytes(tile, N, TP, MP):
    return tile * 4 * (64 * N * MP + 12 * TP)


def _bwd_block_bytes(tile, N, TP, S, SP, MP, RP):
    return tile * 4 * (2 * S * SP + 2 * N * TP + 4 * MP + 2 * RP + 8)


def _bwd_tile_for(C, tile, N, TP, S, SP, MP, RP):
    """Backward tile walk-down.  Must DIVIDE the forward's padded chain
    count C (the record buffers are sliced on the same column grid); 128
    always does since C is a multiple of the forward tile (itself a
    multiple of 128)."""
    tile = min(tile, C)

    def fits(t):
        return (_bwd_stack_bytes(t, N, TP, MP) <= _BWD_STACK_BUDGET
                and _bwd_stack_bytes(t, N, TP, MP)
                + 2 * _bwd_block_bytes(t, N, TP, S, SP, MP, RP)
                <= _BWD_VMEM_LIMIT)

    while tile > 128 and (C % tile or not fits(tile)):
        tile -= 128
    return tile


def _fwd_impl(A, x0, ts, Z, sf, ell, rtol, atol, safety, ifactor, dfactor,
              max_steps, store_steps, controller, tile, interpret):
    C_in = A.shape[0]
    f32 = jnp.float32
    ts = ts.astype(f32)
    N = x0.shape[-2]
    RP = _pad8(N)
    SP = _store_block_height(N, RP)
    T = ts.shape[0]
    TP = _pad8(T)
    MP = _pad8(Z.shape[0])
    S = store_steps

    tile = _tile_for(C_in, tile, N, TP, S, SP)
    C = ((C_in + tile - 1) // tile) * tile
    if C != C_in:
        A = jnp.concatenate(
            [A, jnp.broadcast_to(A[:1], (C - C_in,) + A.shape[1:])], axis=0
        )

    static = _StaticLite(Z=Z, sf=sf, ell=ell)
    (px, py, fxp, fyp, dt0, consts, x0b) = _pack_initial(
        A, x0, static, rtol, atol, C, N, RP, MP)
    ax, ay, zx, zy = consts
    tsp = jnp.concatenate([ts, jnp.full((TP - T,), _FAR, f32)])[:, None]
    t1 = jnp.full((1, C), ts[0], f32)

    kernel = _make_fwd_rec_kernel(sf, ell, rtol, atol, safety, ifactor,
                                  dfactor, N, RP, T, TP, max_steps, S, SP,
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
                  vtile(1), vtile(1),
                  vtile(MP), vtile(MP), vshared(MP), vshared(MP),
                  vshared(TP)],
        out_specs=[vtile(N * TP), vtile(N * TP), vtile(1), vtile(1),
                   vtile(1), vtile(1), vtile(S * SP), vtile(S * SP),
                   vtile(1)],
        out_shape=[jax.ShapeDtypeStruct((N * TP, C), f32)] * 2
        + [jax.ShapeDtypeStruct((1, C), f32)] * 4
        + [jax.ShapeDtypeStruct((S * SP, C), f32)] * 2
        + [jax.ShapeDtypeStruct((1, C), f32)],
        interpret=interpret,
    )(px, py, fxp, fyp, t1, dt0, ax, ay, zx, zy, tsp)
    oxs, oys, nfe, nacc, nrej, t1f, stx, sty, nit = outs

    ys = jnp.stack(
        [oxs.reshape(N, TP, C)[:, :T], oys.reshape(N, TP, C)[:, :T]],
        axis=-1,
    )
    ys = jnp.moveaxis(ys, 0, 2)                    # (T, C, N, 2)
    ys = ys.at[0].set(x0b)
    ys = ys[:, :C_in]
    return ys, (stx, sty, nit, ax, ay, zx, zy, tsp)


@partial(jax.custom_vjp, nondiff_argnums=tuple(range(4, 16)))
def _traj(A, x0, ts, Z, sf, ell, rtol, atol, safety, ifactor, dfactor,
          max_steps, store_steps, controller, tile, interpret):
    return _fwd_impl(A, x0, ts, Z, sf, ell, rtol, atol, safety, ifactor,
                     dfactor, max_steps, store_steps, controller, tile,
                     interpret)[0]


def _fwd_rule(A, x0, ts, Z, sf, ell, rtol, atol, safety, ifactor, dfactor,
              max_steps, store_steps, controller, tile, interpret):
    ys, res = _fwd_impl(A, x0, ts, Z, sf, ell, rtol, atol, safety, ifactor,
                        dfactor, max_steps, store_steps, controller, tile,
                        interpret)
    return ys, (A, x0, ts, Z) + res


def _bwd_rule(sf, ell, rtol, atol, safety, ifactor, dfactor, max_steps,
              store_steps, controller, tile, interpret, res, g):
    (A, x0, ts, Z, stx, sty, nit, ax, ay, zx, zy, tsp) = res
    C_in = A.shape[0]
    f32 = jnp.float32
    N = x0.shape[-2]
    RP = _pad8(N)
    SP = _store_block_height(N, RP)
    T = ts.shape[0]
    TP = _pad8(T)
    M = Z.shape[0]
    MP = _pad8(M)
    S = store_steps
    # the record buffers were padded to the FORWARD's grid: recompute that
    # C exactly (tile is a nondiff arg, C_in is static), then pick a
    # backward tile that divides it and fits the reverse sweep's stack
    tile_f = _tile_for(C_in, tile, N, TP, S, SP)
    C = ((C_in + tile_f - 1) // tile_f) * tile_f
    tile_ = _bwd_tile_for(C, tile_f, N, TP, S, SP, MP, RP)

    g = g.astype(f32)                              # (T, C_in, N, 2)
    # ts[0] is the pass-through row (never kernel-emitted)
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

    kernel = _make_bwd_kernel(sf, ell, N, RP, T, TP, S, SP)

    def vtile(rows):
        return pl.BlockSpec((rows, tile_), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def vshared(rows, cols=1):
        return pl.BlockSpec((rows, cols), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    abx, aby, x0bx, x0by = pl.pallas_call(
        kernel,
        grid=(C // tile_,),
        in_specs=[vtile(S * SP), vtile(S * SP), vtile(N * TP),
                  vtile(N * TP), vtile(MP), vtile(MP), vshared(MP),
                  vshared(MP), vshared(TP), vtile(1)],
        out_specs=[vtile(MP), vtile(MP), vtile(RP), vtile(RP)],
        out_shape=[jax.ShapeDtypeStruct((MP, C), f32)] * 2
        + [jax.ShapeDtypeStruct((RP, C), f32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_BWD_VMEM_LIMIT),
        interpret=interpret,
    )(stx, sty, gx, gy, ax, ay, zx, zy, tsp, nit)

    A_bar = jnp.stack([abx[:M, :C_in].T, aby[:M, :C_in].T], axis=-1)
    x0_bar = jnp.stack(
        [jnp.sum(x0bx[:N], axis=1), jnp.sum(x0by[:N], axis=1)], axis=-1
    ) + jnp.sum(g0, axis=0)
    return (A_bar.astype(A.dtype), x0_bar.astype(x0.dtype),
            jnp.zeros_like(ts), jnp.zeros_like(Z))


_traj.defvjp(_fwd_rule, _bwd_rule)


def gp_dopri5_trajectory(A, x0, ts, static, rtol=1e-7, atol=1e-9,
                         safety=0.9, ifactor=10.0, dfactor=0.2,
                         max_steps=100_000, store_steps=128,
                         controller="i", tile=1024, interpret=False):
    """Adaptive dopri5 trajectories of the GP field, differentiable w.r.t.
    A and x0 through a hand-written discrete adjoint (module docstring).

    A (C, M, 2), x0 (N, 2) shared, ts (T,) increasing.  Returns
    (T, C, N, 2).  Forward values match `gp_dopri5_solve_whole` (same
    shared step arithmetic).  Any C >= 1 (chain axis padded to the tile
    internally).  `store_steps` bounds the recorded step mesh per chain:
    gradients require max(n_accepted + n_rejected) <= store_steps (check
    with gp_dopri5_solve_whole's stats when in doubt).
    """
    if controller not in ("i", "pi"):
        raise ValueError(
            f"unknown step controller {controller!r}; expected 'i' or 'pi'")
    return _traj(A, x0, ts, static.Z, float(static.sf), float(static.ell),
                 float(rtol), float(atol), float(safety), float(ifactor),
                 float(dfactor), int(max_steps), int(store_steps),
                 controller, tile, interpret)


def make_fused_gp_potential_dopri5(static, x0, ts, Y, rtol=1e-7, atol=1e-9,
                                   max_steps=100_000, store_steps=128,
                                   controller="i", tile=1024,
                                   interpret=None):
    """GP posterior potential at the BASELINE north-star configuration:
    the solve is adaptive dopri5 at (rtol, atol) through the fused
    whole-solve kernel, and `jax.grad` flows through the hand-written
    discrete adjoint — so SGLD/pSGLD at dopri5 tolerance runs fused end
    to end.  Matches models.kernel_regression.make_potential with
    solve=odeint(method='dopri5') numerically (params {'U','logsn'}
    with leading chain axis)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    Y = jnp.asarray(Y, jnp.float32)
    D = Y.shape[-1]
    numel = Y.size
    KzzinvL = static.KzzinvL.astype(jnp.float32)
    Kzzinv = static.Kzzinv.astype(jnp.float32)

    def potential_batch(params):
        U = params["U"].astype(jnp.float32)              # (C, M, 2)
        logsn = params["logsn"].astype(jnp.float32)      # (C, 2)
        A = jnp.einsum("mk,ckd->cmd", KzzinvL, U)
        traj = gp_dopri5_trajectory(A, x0, ts, static, rtol=rtol, atol=atol,
                                    max_steps=max_steps,
                                    store_steps=store_steps,
                                    controller=controller, tile=tile,
                                    interpret=interpret)
        xode = jnp.transpose(traj, (1, 2, 0, 3))         # (C, N, T, 2)
        sn2 = jnp.exp(logsn) ** 2
        resid = (Y[None] - xode) ** 2
        loss = jnp.sum(resid / (2.0 * sn2[:, None, None, :]), axis=(1, 2, 3))
        loss += numel * jnp.sum(logsn, axis=-1) / D
        loss += jnp.einsum("ckd,km,cmd->c", U, Kzzinv, U) / 2.0
        return loss

    return potential_batch
