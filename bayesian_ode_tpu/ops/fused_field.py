"""Public fused adaptive-dopri5 engine: any vector field, one registration.

VERDICT r4 #2: the whole-solve recording/replay kernel bodies
(ops/fused_adaptive.py) were proven on two hand-adapted fields
(ops/gp_dopri5_grad.py, ops/mlp_dopri5.py); this module promotes the
field-callback contract to a documented public entry point so a NEW model
gets the fused 6-12x speedup from a ~100-line field description instead
of a new kernel file:

    field = FusedField(n_weights=..., n_wbar=..., make_rhs=...,
                       make_rhs_vjp=..., rhs_ref=...)
    ys = fused_dopri5_trajectory(field, packed, x0, ts, rtol=1e-7, ...)

`packed` is a tuple of `(rows, C)` float32 arrays — the field's weights
with chains on the LANE axis (plus any shared constant blocks last).
States are 2-component phase points: x0 is (N, 2) and the kernels carry
(x, y) plane pairs — the reference model family's layout (VdP/FHN/LV
phase spaces, the spiral, the 2-D GP/MLP fields).  A D-component
generalization would replace the sx/sy pair with a D-tuple of planes in
ops/fused_adaptive.py; nothing else in the engine is dimension-aware.
The engine owns everything the two hand-written adapters duplicated:
chain padding to the tile grid, state-plane packing, the Hairer initial
step, the recording forward / replay backward `pallas_call` plumbing,
VMEM tile walk-downs (forward block model + backward Mosaic-stack
model), the `store_steps` budget surface (`fused_dopri5_stats`), and the
custom-VJP wiring (cotangents for the first `n_wbar` blocks, zeros for
trailing shared constants).

Field contract (all callbacks close over static sizes, e.g. hidden
width; see ops/spiral_dopri5.py for a complete worked example):

  make_rhs(w, N, RP) -> rhs(sx, sy) -> (fx, fy)
      `w` is the packed tuple as `(rows, tile)` kernel refs; sx/sy are
      `(RP, tile)` planes holding the N trajectory points' x/y rows
      (rows N..RP-1 are zero padding and must map to zero output rows).
  make_rhs_vjp(w, N, RP) -> rhs_vjp(sx, sy, cx, cy, wbar)
      -> (xbar, ybar, wbar')
      Pull state cotangents (cx, cy) back through the field at the stage
      point (sx, sy), ACCUMULATING into the `n_wbar` weight-cotangent
      arrays (a tuple shaped like packed[:n_wbar]).
  rhs_ref(w, pts) -> dpts
      Plain-XLA reference of the same field over `(C, N, 2)` points —
      used once per solve for the Hairer initial-step heuristic (and
      handy for parity tests).

Gradients are the frozen-step-mesh discrete adjoint at tolerance — the
semantics, O(rtol) error analysis, and `store_steps` budget caveat of
ops/gp_dopri5_grad.py's module docstring apply verbatim.  `pack` your
params with ordinary differentiable jnp ops (transposes/stacks): the
engine returns cotangents in packed layout and JAX transposes the
packing automatically (same pattern as ops/mlp_rk4._pack_weights).

Reference for scope: torchdiffeq's one-`odeint`-for-every-model contract
(/root/reference/torchdiffeq/_impl/odeint.py:20) — this is the fused
analogue of that genericity.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ode.tableaus import DOPRI5, TSIT5
from .gp_dopri5 import _FAR, _hairer_initial_step, _pad8
from .gp_dopri5_grad import _store_block_height

# solver-agnostic fused engine (VERDICT r4 #8): any 7-stage FSAL pair
# with quartic dense output drops into the same recording/replay bodies
_TABLEAUS = {"dopri5": DOPRI5, "tsit5": TSIT5}


class FusedField(NamedTuple):
    """A vector field registered with the fused adaptive engine.

    Build ONCE per model configuration and reuse (the object is a
    static argument of the jitted solve; a fresh instance per call would
    defeat compilation caching).
    """
    n_weights: int                 # packed (rows, C) blocks, total
    n_wbar: int                    # leading blocks receiving cotangents
    make_rhs: Callable             # (w, N, RP) -> rhs(sx, sy)
    make_rhs_vjp: Callable         # (w, N, RP) -> rhs_vjp(...)
    rhs_ref: Callable              # (w, pts (C, N, 2)) -> (C, N, 2)
    # optional per-lane f32-slot model of the backward kernel's Mosaic
    # stack: (W_rows, N, TP, RP) -> slots.  The default is deliberately
    # generous (walks the tile down further than strictly needed); give
    # a calibrated model if the default tile is too small for speed.
    bwd_stack_rows: Optional[Callable] = None


# VMEM sizing (bytes): same budgets as the hand-written adapters — the
# backward sweep's unrolled 7x rhs + 7x rhs_vjp Mosaic stack is the
# binding constraint, raised per-kernel via CompilerParams.
_BWD_STACK_BUDGET = 48 * 1024 * 1024
_BWD_VMEM_LIMIT = 100 * 1024 * 1024


def _w_rows(packed) -> int:
    return sum(int(w.shape[0]) for w in packed)


def _fwd_tile_for(C_in, tile, W, N, TP, S, SP):
    tile = max(128, min(tile, ((C_in + 127) // 128) * 128))
    tile -= tile % 128
    while tile > 128 and tile * (3000 + 8 * W + 16 * N * TP + 16 * S * SP) \
            > (15 * 1024 * 1024):
        tile -= 128
    return tile


def _default_stack_rows(W, N, TP, RP):
    # stage points + k cotangents + quartic temporaries (40 RP rows),
    # emission masks (12 TP rows), w/wbar/wbar_i copies (6 W rows) and a
    # generous 8-slot-per-point-per-weight-row bound on the field VJP's
    # live intermediates (covers the measured MLP/GP adapters)
    return 6 * W + 40 * RP + 12 * TP + 8 * N * W


def _bwd_tile_for(field, C, tile, W, N, TP, S, SP, RP):
    rows = (field.bwd_stack_rows or _default_stack_rows)(W, N, TP, RP)

    def fits(t):
        stack = t * 4 * rows
        blocks = t * 4 * (2 * S * SP + 2 * N * TP + 4 * W + 2 * RP + 8)
        return stack <= _BWD_STACK_BUDGET \
            and stack + 2 * blocks <= _BWD_VMEM_LIMIT

    tile = min(tile, C)
    while tile > 128 and (C % tile or not fits(tile)):
        tile -= 128
    return tile


def _fwd_impl(field, packed, x0, ts, rtol, atol, safety, ifactor, dfactor,
              max_steps, store_steps, controller, tile, interpret,
              method="dopri5"):
    from .fused_adaptive import make_fwd_rec_kernel

    tableau = _TABLEAUS[method]

    C_in = packed[0].shape[1]
    f32 = jnp.float32
    ts = ts.astype(f32)
    N = x0.shape[-2]
    RP = _pad8(N)
    SP = _store_block_height(N, RP)
    T = ts.shape[0]
    TP = _pad8(T)
    S = store_steps
    W = _w_rows(packed)

    tile = _fwd_tile_for(C_in, tile, W, N, TP, S, SP)
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

    f0, dt0 = _hairer_initial_step(
        lambda pts: field.rhs_ref(packed, pts), x0b, rtol, atol)
    fxp = pack_points(f0[:, :, 0])
    fyp = pack_points(f0[:, :, 1])
    tsp = jnp.concatenate([ts, jnp.full((TP - T,), _FAR, f32)])[:, None]
    t1 = jnp.full((1, C), ts[0], f32)

    kernel = make_fwd_rec_kernel(
        lambda w: field.make_rhs(w, N, RP), field.n_weights, rtol, atol,
        safety, ifactor, dfactor, N, RP, T, TP, max_steps, S, SP,
        controller, tableau=tableau)

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
    stats = {"nfe": nfe[0, :C_in], "n_accepted": nacc[0, :C_in],
             "n_rejected": nrej[0, :C_in], "n_iterations": nit[0, :C_in]}
    return ys, stats, (packed, stx, sty, nit, tsp)


@partial(jax.custom_vjp, nondiff_argnums=tuple([0] + list(range(4, 15))))
def _traj(field, packed, x0, ts, rtol, atol, safety, ifactor, dfactor,
          max_steps, store_steps, controller, tile, interpret,
          method="dopri5"):
    return _fwd_impl(field, packed, x0, ts, rtol, atol, safety, ifactor,
                     dfactor, max_steps, store_steps, controller, tile,
                     interpret, method)[0]


def _fwd_rule(field, packed, x0, ts, rtol, atol, safety, ifactor, dfactor,
              max_steps, store_steps, controller, tile, interpret,
              method="dopri5"):
    ys, _, res = _fwd_impl(field, packed, x0, ts, rtol, atol, safety,
                           ifactor, dfactor, max_steps, store_steps,
                           controller, tile, interpret, method)
    return ys, (x0, ts) + res


def _bwd_rule(field, rtol, atol, safety, ifactor, dfactor, max_steps,
              store_steps, controller, tile, interpret, method, res, g):
    from .fused_adaptive import make_bwd_kernel

    (x0, ts, packed_pad, stx, sty, nit, tsp) = res
    C = packed_pad[0].shape[1]                     # forward's padded grid
    f32 = jnp.float32
    N = x0.shape[-2]
    RP = _pad8(N)
    SP = _store_block_height(N, RP)
    T = ts.shape[0]
    TP = _pad8(T)
    S = store_steps
    W = _w_rows(packed_pad)
    C_in = g.shape[1]
    # re-derive the FORWARD's 128-aligned tile first: walking down from
    # the raw user tile could leave the 128 lattice and pick a backward
    # tile that does not divide the padded C, silently skipping trailing
    # chains in the grid
    tile_f = _fwd_tile_for(C_in, tile, W, N, TP, S, SP)
    tile_ = _bwd_tile_for(field, C, tile_f, W, N, TP, S, SP, RP)

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

    def make_field_vjp(w):
        rhs = field.make_rhs(w, N, RP)
        rhs_vjp = field.make_rhs_vjp(w, N, RP)
        return rhs, rhs_vjp

    kernel = make_bwd_kernel(make_field_vjp, field.n_weights, field.n_wbar,
                             N, RP, T, TP, S, SP,
                             tableau=_TABLEAUS[method])

    def vtile(rows):
        return pl.BlockSpec((rows, tile_), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def vshared(rows, cols=1):
        return pl.BlockSpec((rows, cols), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    nbar = field.n_wbar
    outs = pl.pallas_call(
        kernel,
        grid=(C // tile_,),
        in_specs=[vtile(S * SP), vtile(S * SP), vtile(N * TP),
                  vtile(N * TP)]
        + [vtile(wi.shape[0]) for wi in packed_pad]
        + [vshared(TP), vtile(1)],
        out_specs=[vtile(wi.shape[0]) for wi in packed_pad[:nbar]]
        + [vtile(RP), vtile(RP)],
        out_shape=[jax.ShapeDtypeStruct(wi.shape, f32)
                   for wi in packed_pad[:nbar]]
        + [jax.ShapeDtypeStruct((RP, C), f32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_BWD_VMEM_LIMIT),
        interpret=interpret,
    )(stx, sty, gx, gy, *packed_pad, tsp, nit)

    wbar = tuple(o[:, :C_in] for o in outs[:nbar]) + tuple(
        jnp.zeros(wi.shape[:1] + (C_in,), f32)
        for wi in packed_pad[nbar:])
    x0bx, x0by = outs[nbar], outs[nbar + 1]
    x0_bar = jnp.stack(
        [jnp.sum(x0bx[:N], axis=1), jnp.sum(x0by[:N], axis=1)], axis=-1
    ) + jnp.sum(g0, axis=0)
    return wbar, x0_bar.astype(x0.dtype), jnp.zeros_like(ts)


_traj.defvjp(_fwd_rule, _bwd_rule)


def fused_dopri5_trajectory(field: FusedField, packed, x0, ts,
                            rtol=1e-7, atol=1e-9, safety=0.9,
                            ifactor=10.0, dfactor=0.2, max_steps=100_000,
                            store_steps=128, controller="i", tile=256,
                            interpret=False, method="dopri5"):
    """Adaptive dopri5 trajectories of a registered field, differentiable
    w.r.t. `packed` and `x0` through the hand-written discrete adjoint.

    packed: tuple of (rows, C) float32 weight blocks (chains on lanes);
    x0 (N, 2) shared; ts (T,) increasing.  Returns (T, C, N, 2).  Any
    C >= 1 (padded to the tile internally).  Gradients require
    max(n_accepted + n_rejected) <= store_steps per chain — size the
    budget with `fused_dopri5_stats`.
    """
    if controller not in ("i", "pi"):
        raise ValueError(
            f"unknown step controller {controller!r}; expected 'i' or 'pi'")
    if method not in _TABLEAUS:
        raise ValueError(f"unknown fused method {method!r}; expected one "
                         f"of {sorted(_TABLEAUS)}")
    return _traj(field, tuple(packed), x0, ts, float(rtol), float(atol),
                 float(safety), float(ifactor), float(dfactor),
                 int(max_steps), int(store_steps), controller, tile,
                 interpret, method)


def fused_dopri5_stats(field: FusedField, packed, x0, ts, rtol=1e-7,
                       atol=1e-9, safety=0.9, ifactor=10.0, dfactor=0.2,
                       max_steps=100_000, store_steps=128, controller="i",
                       tile=256, interpret=False, method="dopri5"):
    """Forward solve returning (trajectory, stats) with per-chain
    `nfe` / `n_accepted` / `n_rejected` and the per-tile lockstep
    `n_iterations` the `store_steps` gradient budget must cover."""
    if controller not in ("i", "pi"):
        raise ValueError(
            f"unknown step controller {controller!r}; expected 'i' or 'pi'")
    if method not in _TABLEAUS:
        raise ValueError(f"unknown fused method {method!r}; expected one "
                         f"of {sorted(_TABLEAUS)}")
    ys, stats, _ = _fwd_impl(field, tuple(packed), x0, ts, float(rtol),
                             float(atol), float(safety), float(ifactor),
                             float(dfactor), int(max_steps),
                             int(store_steps), controller, tile, interpret,
                             method)
    return ys, stats
