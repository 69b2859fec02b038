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

from .gp_dopri5 import _FAR, _hairer_initial_step, _pad8
from .gp_dopri5_grad import _store_block_height
from .mlp_rk4 import _mlp_factory, _pack_weights


def _w_rows(H: int) -> int:
    """Total packed weight rows: w1x/w1y/b1/b2/w3x/w3y (H each), w2 (H*H),
    b3x/b3y (1 each)."""
    return 6 * H + H * H + 2


def _make_fwd_rec_kernel(H, rtol, atol, safety, ifactor, dfactor,
                         N, RP, T, TP, max_steps, S, SP, controller):
    """The shared recording forward body (ops/fused_adaptive.py) over the
    MLP field (9 packed weight blocks)."""
    from .fused_adaptive import make_fwd_rec_kernel

    mlp_rhs, _ = _mlp_factory(H, N, RP)

    def make_rhs(w):
        return lambda sx, sy: mlp_rhs(sx, sy, w)

    return make_fwd_rec_kernel(make_rhs, 9, rtol, atol, safety, ifactor,
                               dfactor, N, RP, T, TP, max_steps, S, SP,
                               controller)


def _make_bwd_kernel(H, N, RP, T, TP, S, SP):
    """The shared replay backward body (ops/fused_adaptive.py) over the
    MLP layer VJPs; all 9 packed weight blocks receive cotangents."""
    from .fused_adaptive import make_bwd_kernel

    mlp_rhs, mlp_rhs_vjp = _mlp_factory(H, N, RP)

    def make_field_vjp(w):
        rhs = lambda sx, sy: mlp_rhs(sx, sy, w)  # noqa: E731

        def rhs_vjp(sx, sy, cx, cy, wbar):
            return mlp_rhs_vjp(sx, sy, cx, cy, w, wbar)

        return rhs, rhs_vjp

    return make_bwd_kernel(make_field_vjp, 9, 9, N, RP, T, TP, S, SP)


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
