"""Fused rk4 trajectory solver with hand-written backward for the GP field.

The SGLD inner loop (the reference's sampler workload, gp.py:346) is a
fixed-grid rk4 solve plus its gradient.  The generic path runs ~60 scan
steps x ~10 XLA kernels each, twice (forward + backward).  Here:

  - forward: ONE Pallas kernel integrates all T-1 rk4 (3/8-rule) steps,
    storing the trajectory in VMEM and writing it out once;
  - backward: ONE Pallas kernel sweeps the stored trajectory in reverse,
    recomputing the four stages per step (rematerialization) and applying
    hand-derived VJPs of the GP field
        f(u) = sum_m K_m(u) A_m,   K_m = sf^2 exp(-|u - z_m|^2 / (2 ell^2))
        u_bar = sum_m K_m (A_m . c) (z_m - u) / ell^2,   A_m_bar += K_m c
    accumulating the adjoint state and the weight cotangent A_bar.

Exposed as `gp_rk4_trajectory` with `jax.custom_vjp`, so
`jax.grad(potential)` through the fused solve Just Works.  Chains ride
the 128-lane axis (layout of ops/gp_dopri5.py); the chain axis is tiled
by a Pallas grid so trajectory storage stays within VMEM.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FAR = 1e9


def _pad8(n: int) -> int:
    return ((n + 7) // 8) * 8


def _rhs_factory(sf, ell, N, RP):
    sf2 = sf * sf
    inv2ell2 = 0.5 / (ell * ell)
    invell2 = 1.0 / (ell * ell)

    def rhs(sx, sy, ax, ay, zx, zy):
        outx, outy = [], []
        for n in range(N):
            dxn = sx[n : n + 1, :] - zx
            dyn = sy[n : n + 1, :] - zy
            K = sf2 * jnp.exp(-(dxn * dxn + dyn * dyn) * inv2ell2)
            outx.append(jnp.sum(K * ax, 0, keepdims=True))
            outy.append(jnp.sum(K * ay, 0, keepdims=True))
        pad = jnp.zeros_like(outx[0])
        return (jnp.concatenate(outx + [pad] * (RP - N), 0),
                jnp.concatenate(outy + [pad] * (RP - N), 0))

    def rhs_vjp(sx, sy, cx, cy, ax, ay, zx, zy):
        """(u_bar_x, u_bar_y, A_bar_x, A_bar_y) for cotangents (cx, cy) of
        f at the 5 points."""
        ubx, uby = [], []
        abx = jnp.zeros_like(ax)
        aby = jnp.zeros_like(ay)
        for n in range(N):
            dxn = sx[n : n + 1, :] - zx
            dyn = sy[n : n + 1, :] - zy
            K = sf2 * jnp.exp(-(dxn * dxn + dyn * dyn) * inv2ell2)
            cxn = cx[n : n + 1, :]
            cyn = cy[n : n + 1, :]
            # A_bar += K * c
            abx = abx + K * cxn
            aby = aby + K * cyn
            # u_bar = sum_m K_m (A_m . c) (z_m - u)/ell^2
            adotc = ax * cxn + ay * cyn
            w = K * adotc * invell2
            ubx.append(jnp.sum(w * (-dxn), 0, keepdims=True))
            uby.append(jnp.sum(w * (-dyn), 0, keepdims=True))
        pad = jnp.zeros_like(ubx[0])
        return (jnp.concatenate(ubx + [pad] * (RP - N), 0),
                jnp.concatenate(uby + [pad] * (RP - N), 0), abx, aby)

    return rhs, rhs_vjp


def _make_fwd_kernel(sf, ell, T, N, RP):
    rhs, _ = _rhs_factory(sf, ell, N, RP)

    def kernel(dts_ref, x0x_ref, x0y_ref, ax_ref, ay_ref, zx_ref, zy_ref,
               oxs_ref, oys_ref):
        ax, ay = ax_ref[:], ay_ref[:]
        zx, zy = zx_ref[:], zy_ref[:]
        oxs_ref[0:RP, :] = x0x_ref[:]
        oys_ref[0:RP, :] = x0y_ref[:]

        def body(t, carry):
            px, py = carry
            dt = dts_ref[t]
            k1x, k1y = rhs(px, py, ax, ay, zx, zy)
            u2x, u2y = px + dt / 3 * k1x, py + dt / 3 * k1y
            k2x, k2y = rhs(u2x, u2y, ax, ay, zx, zy)
            u3x = px + dt * (-k1x / 3 + k2x)
            u3y = py + dt * (-k1y / 3 + k2y)
            k3x, k3y = rhs(u3x, u3y, ax, ay, zx, zy)
            u4x = px + dt * (k1x - k2x + k3x)
            u4y = py + dt * (k1y - k2y + k3y)
            k4x, k4y = rhs(u4x, u4y, ax, ay, zx, zy)
            nx = px + dt / 8 * (k1x + 3 * k2x + 3 * k3x + k4x)
            ny = py + dt / 8 * (k1y + 3 * k2y + 3 * k3y + k4y)
            oxs_ref[pl.ds((t + 1) * RP, RP), :] = nx
            oys_ref[pl.ds((t + 1) * RP, RP), :] = ny
            return nx, ny

        jax.lax.fori_loop(0, T - 1, body, (x0x_ref[:], x0y_ref[:]))

    return kernel


def _make_bwd_kernel(sf, ell, T, N, RP):
    rhs, rhs_vjp = _rhs_factory(sf, ell, N, RP)

    def kernel(dts_ref, xs_ref, ys_ref, gx_ref, gy_ref, ax_ref, ay_ref,
               zx_ref, zy_ref, oax_ref, oay_ref, ox0x_ref, ox0y_ref):
        ax, ay = ax_ref[:], ay_ref[:]
        zx, zy = zx_ref[:], zy_ref[:]

        def body(i, carry):
            lx, ly, abx, aby = carry
            t = T - 2 - i                     # step index T-2 .. 0
            dt = dts_ref[t]
            px = xs_ref[pl.ds(t * RP, RP), :]
            py = ys_ref[pl.ds(t * RP, RP), :]
            # inject the observation cotangent at the step's endpoint
            lx = lx + gx_ref[pl.ds((t + 1) * RP, RP), :]
            ly = ly + gy_ref[pl.ds((t + 1) * RP, RP), :]

            # recompute stages
            k1x, k1y = rhs(px, py, ax, ay, zx, zy)
            u2x, u2y = px + dt / 3 * k1x, py + dt / 3 * k1y
            k2x, k2y = rhs(u2x, u2y, ax, ay, zx, zy)
            u3x = px + dt * (-k1x / 3 + k2x)
            u3y = py + dt * (-k1y / 3 + k2y)
            k3x, k3y = rhs(u3x, u3y, ax, ay, zx, zy)
            u4x = px + dt * (k1x - k2x + k3x)
            u4y = py + dt * (k1y - k2y + k3y)

            # reverse of: next = p + dt/8 (k1 + 3 k2 + 3 k3 + k4)
            pbx, pby = lx, ly
            kb1x = dt / 8 * lx
            kb1y = dt / 8 * ly
            kb2x = 3 * dt / 8 * lx
            kb2y = 3 * dt / 8 * ly
            kb3x = 3 * dt / 8 * lx
            kb3y = 3 * dt / 8 * ly
            kb4x = dt / 8 * lx
            kb4y = dt / 8 * ly

            # k4 = f(u4)
            ubx, uby, dax, day = rhs_vjp(u4x, u4y, kb4x, kb4y, ax, ay, zx, zy)
            abx += dax
            aby += day
            pbx += ubx
            pby += uby
            kb1x += dt * ubx
            kb1y += dt * uby
            kb2x += -dt * ubx
            kb2y += -dt * uby
            kb3x += dt * ubx
            kb3y += dt * uby

            # k3 = f(u3)
            ubx, uby, dax, day = rhs_vjp(u3x, u3y, kb3x, kb3y, ax, ay, zx, zy)
            abx += dax
            aby += day
            pbx += ubx
            pby += uby
            kb1x += -dt / 3 * ubx
            kb1y += -dt / 3 * uby
            kb2x += dt * ubx
            kb2y += dt * uby

            # k2 = f(u2)
            ubx, uby, dax, day = rhs_vjp(u2x, u2y, kb2x, kb2y, ax, ay, zx, zy)
            abx += dax
            aby += day
            pbx += ubx
            pby += uby
            kb1x += dt / 3 * ubx
            kb1y += dt / 3 * uby

            # k1 = f(p)
            ubx, uby, dax, day = rhs_vjp(px, py, kb1x, kb1y, ax, ay, zx, zy)
            abx += dax
            aby += day
            pbx += ubx
            pby += uby

            return pbx, pby, abx, aby

        z8 = jnp.zeros_like(gx_ref[0:RP, :])
        z40 = jnp.zeros_like(ax)
        lx, ly, abx, aby = jax.lax.fori_loop(
            0, T - 1, body, (z8, z8, z40, z40)
        )
        # cotangent for x0 includes its own observation term
        ox0x_ref[:] = lx + gx_ref[0:RP, :]
        ox0y_ref[:] = ly + gy_ref[0:RP, :]
        oax_ref[:] = abx
        oay_ref[:] = aby

    return kernel


def _pack_consts(A, Z, C):
    f32 = jnp.float32
    M = Z.shape[0]
    MP = _pad8(M)
    ax = jnp.concatenate(
        [A[:, :, 0].astype(f32).T, jnp.zeros((MP - M, C), f32)], 0
    )
    ay = jnp.concatenate(
        [A[:, :, 1].astype(f32).T, jnp.zeros((MP - M, C), f32)], 0
    )
    Zc = Z.astype(f32)
    zx = jnp.concatenate([Zc[:, 0], jnp.full((MP - M,), _FAR, f32)])[:, None]
    zy = jnp.concatenate([Zc[:, 1], jnp.full((MP - M,), _FAR, f32)])[:, None]
    return ax, ay, zx, zy


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _traj(A, x0, ts, Z, sf, ell, tile, interpret):
    return _fwd_impl(A, x0, ts, Z, sf, ell, tile, interpret)[0]


def gp_rk4_trajectory(A, x0, ts, static, tile=512, interpret=False):
    """rk4 (3/8-rule) trajectories of the GP field for C chains.

    A (C, M, 2), x0 (N, 2) shared, ts (T,).  Returns (T, C, N, 2).
    C must be a multiple of 128.  Differentiable w.r.t. A (and x0).
    """
    return _traj(A, x0, ts, static.Z, float(static.sf), float(static.ell),
                 tile, interpret)


def _fwd_impl(A, x0, ts, Z, sf, ell, tile, interpret):
    C = A.shape[0]
    if C % 128:
        raise ValueError(f"chain count must be a multiple of 128, got {C}")
    tile = min(tile, C)
    while C % tile:          # grid must tile C exactly
        tile -= 128
    f32 = jnp.float32
    T = ts.shape[0]
    N = x0.shape[-2]
    RP = _pad8(N)
    MP = _pad8(Z.shape[0])
    dts = jnp.diff(ts.astype(f32))
    ax, ay, zx, zy = _pack_consts(A, Z, C)
    x0b = jnp.broadcast_to(x0.astype(f32), (C, N, 2))
    x0x = jnp.concatenate([x0b[:, :, 0].T, jnp.zeros((RP - N, C), f32)], 0)
    x0y = jnp.concatenate([x0b[:, :, 1].T, jnp.zeros((RP - N, C), f32)], 0)

    kernel = _make_fwd_kernel(sf, ell, T, N, RP)
    vm = lambda bs=None, im=None: pl.BlockSpec(bs, im, memory_space=pltpu.VMEM)
    xs, ys = pl.pallas_call(
        kernel,
        grid=(C // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            vm((RP, tile), lambda i: (0, i)),
            vm((RP, tile), lambda i: (0, i)),
            vm((MP, tile), lambda i: (0, i)),
            vm((MP, tile), lambda i: (0, i)),
            vm((MP, 1), lambda i: (0, 0)),
            vm((MP, 1), lambda i: (0, 0)),
        ],
        out_specs=[
            vm((T * RP, tile), lambda i: (0, i)),
            vm((T * RP, tile), lambda i: (0, i)),
        ],
        out_shape=[jax.ShapeDtypeStruct((T * RP, C), f32)] * 2,
        interpret=interpret,
    )(dts, x0x, x0y, ax, ay, zx, zy)

    traj = jnp.stack(
        [xs.reshape(T, RP, C)[:, :N], ys.reshape(T, RP, C)[:, :N]],
        axis=-1,
    )                                            # (T, N, C, 2)
    traj = jnp.moveaxis(traj, 2, 1)              # (T, C, N, 2)
    return traj, (A, x0, ts, Z, xs, ys)


def _fwd_rule(A, x0, ts, Z, sf, ell, tile, interpret):
    traj, res = _fwd_impl(A, x0, ts, Z, sf, ell, tile, interpret)
    return traj, res


def _bwd_rule(sf, ell, tile, interpret, res, g):
    A, x0, ts, Z, xs, ys = res
    C = A.shape[0]
    tile_ = min(tile, C)
    while C % tile_:
        tile_ -= 128
    f32 = jnp.float32
    T = ts.shape[0]
    N = x0.shape[-2]
    RP = _pad8(N)
    M = Z.shape[0]
    MP = _pad8(M)
    dts = jnp.diff(ts.astype(f32))
    ax, ay, zx, zy = _pack_consts(A, Z, C)

    g = g.astype(f32)                            # (T, C, N, 2)
    gT = jnp.moveaxis(g, 1, 2)                   # (T, N, C, 2)
    zpad = jnp.zeros((T, RP - N, C), f32)
    gx = jnp.concatenate([gT[..., 0], zpad], axis=1).reshape(T * RP, C)
    gy = jnp.concatenate([gT[..., 1], zpad], axis=1).reshape(T * RP, C)

    kernel = _make_bwd_kernel(sf, ell, T, N, RP)
    vm = lambda bs, im: pl.BlockSpec(bs, im, memory_space=pltpu.VMEM)
    abx, aby, x0bx, x0by = pl.pallas_call(
        kernel,
        grid=(C // tile_,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            vm((T * RP, tile_), lambda i: (0, i)),
            vm((T * RP, tile_), lambda i: (0, i)),
            vm((T * RP, tile_), lambda i: (0, i)),
            vm((T * RP, tile_), lambda i: (0, i)),
            vm((MP, tile_), lambda i: (0, i)),
            vm((MP, tile_), lambda i: (0, i)),
            vm((MP, 1), lambda i: (0, 0)),
            vm((MP, 1), lambda i: (0, 0)),
        ],
        out_specs=[
            vm((MP, tile_), lambda i: (0, i)),
            vm((MP, tile_), lambda i: (0, i)),
            vm((RP, tile_), lambda i: (0, i)),
            vm((RP, tile_), lambda i: (0, i)),
        ],
        out_shape=[jax.ShapeDtypeStruct((MP, C), f32)] * 2
        + [jax.ShapeDtypeStruct((RP, C), f32)] * 2,
        interpret=interpret,
    )(dts, xs, ys, gx, gy, ax, ay, zx, zy)

    A_bar = jnp.stack([abx[:M].T, aby[:M].T], axis=-1)        # (C, M, 2)
    x0_bar = jnp.stack(
        [jnp.sum(x0bx[:N], axis=1), jnp.sum(x0by[:N], axis=1)], axis=-1
    )                                                          # (N, 2)
    return (A_bar.astype(A.dtype), x0_bar.astype(x0.dtype),
            jnp.zeros_like(ts), jnp.zeros_like(Z))


_traj.defvjp(_fwd_rule, _bwd_rule)


def make_fused_gp_potential(static, x0, ts, Y, tile=512, interpret=None):
    """Drop-in GP posterior potential using the fused rk4 kernels
    (matches models.kernel_regression.make_potential numerically; params
    {'U', 'logsn'} batched over chains are handled by vmap as usual)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    Y = jnp.asarray(Y, jnp.float32)
    D = Y.shape[-1]
    numel = Y.size
    KzzinvL = static.KzzinvL.astype(jnp.float32)
    Kzzinv = static.Kzzinv.astype(jnp.float32)

    def potential_batch(params):
        """Batched potential: params leaves have leading chain axis C."""
        U = params["U"].astype(jnp.float32)              # (C, M, 2)
        logsn = params["logsn"].astype(jnp.float32)      # (C, 2)
        A = jnp.einsum("mk,ckd->cmd", KzzinvL, U)
        traj = gp_rk4_trajectory(A, x0, ts, static, tile, interpret)
        # (T, C, N, 2) -> (C, N, T, 2): compare against Y (N, T, 2)
        xode = jnp.transpose(traj, (1, 2, 0, 3))
        sn2 = jnp.exp(logsn) ** 2                        # (C, 2)
        resid = (Y[None] - xode) ** 2                    # (C, N, T, 2)
        loss = jnp.sum(resid / (2.0 * sn2[:, None, None, :]), axis=(1, 2, 3))
        loss += numel * jnp.sum(logsn, axis=-1) / D
        loss += (
            jnp.einsum("ckd,km,cmd->c", U, Kzzinv, U) / 2.0
        )
        return loss

    return potential_batch
