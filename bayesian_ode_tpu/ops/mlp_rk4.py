"""Fused rk4 trajectory solver + hand-written backward for the MLP field.

Same architecture as ops/gp_rk4.py (chains on lanes, whole trajectory per
Pallas program, custom VJP with rematerialized stages), specialized to the
reference's neural-network vector field (notebooks/jai/nn.ipynb cell 4):

    f(x) = W3^T elu(W2^T elu(W1^T x + b1) + b2) + b3,   x in R^2, H hidden

This serves BASELINE config #3 — the Van der Pol NN mean-function baseline
under P-SGLD — at fused-kernel speed.  Per-chain weights ride the lane
axis: W1 as two (H, C) rows-per-input arrays, W2 as an (H*H, C) array with
row block j holding column w2[:, j], W3 as two (H, C) arrays per output.

Backward: standard layer VJPs with elu'(a) = where(a > 0, 1, elu(a) + 1),
accumulating weight cotangents per step; the 3/8-rule reversal is shared
with gp_rk4's derivation.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad8(n: int) -> int:
    return ((n + 7) // 8) * 8


def _elu(a):
    return jnp.where(a > 0, a, jnp.exp(a) - 1.0)


def _elu_deriv(a):
    return jnp.where(a > 0, 1.0, jnp.exp(a))


def _mlp_factory(H: int, N: int, RP: int):
    """Forward field + per-point VJP over lane-major packed weights."""

    def point_forward(x, y, w):
        """x, y: (1, C) one trajectory point; returns (fx, fy) (1, C) and
        the pre-activations needed by the VJP."""
        (w1x, w1y, b1, w2, b2, w3x, w3y, b3x, b3y) = w
        a1 = w1x * x + w1y * y + b1                    # (H, C)
        h1 = _elu(a1)
        a2_rows = []
        for j in range(H):
            blk = w2[j * H : (j + 1) * H]              # (H, C)
            a2_rows.append(jnp.sum(blk * h1, 0, keepdims=True))
        a2 = jnp.concatenate(a2_rows, 0) + b2          # (H, C)
        h2 = _elu(a2)
        fx = jnp.sum(w3x * h2, 0, keepdims=True) + b3x
        fy = jnp.sum(w3y * h2, 0, keepdims=True) + b3y
        return fx, fy, (a1, h1, a2, h2)

    def rhs(sx, sy, w):
        outx, outy = [], []
        for n in range(N):
            fx, fy, _ = point_forward(sx[n : n + 1], sy[n : n + 1], w)
            outx.append(fx)
            outy.append(fy)
        pad = jnp.zeros_like(outx[0])
        return (jnp.concatenate(outx + [pad] * (RP - N), 0),
                jnp.concatenate(outy + [pad] * (RP - N), 0))

    def rhs_vjp(sx, sy, cx, cy, w, wbar):
        """Accumulate weight cotangents into wbar and return
        (x_bar, y_bar) (RP, C) for cotangents (cx, cy) of f."""
        (w1x, w1y, b1, w2, b2, w3x, w3y, b3x, b3y) = w
        (gw1x, gw1y, gb1, gw2, gb2, gw3x, gw3y, gb3x, gb3y) = wbar
        xb_rows, yb_rows = [], []
        for n in range(N):
            x = sx[n : n + 1]
            y = sy[n : n + 1]
            cxn = cx[n : n + 1]
            cyn = cy[n : n + 1]
            _, _, (a1, h1, a2, h2) = point_forward(x, y, w)

            gb3x = gb3x + cxn
            gb3y = gb3y + cyn
            gw3x = gw3x + h2 * cxn
            gw3y = gw3y + h2 * cyn
            h2b = w3x * cxn + w3y * cyn                # (H, C)
            a2b = h2b * _elu_deriv(a2)
            gb2 = gb2 + a2b

            h1b = jnp.zeros_like(h1)
            gw2_rows = []
            for j in range(H):
                blk = w2[j * H : (j + 1) * H]
                a2bj = a2b[j : j + 1]
                h1b = h1b + blk * a2bj
                gw2_rows.append(h1 * a2bj)
            gw2 = gw2 + jnp.concatenate(gw2_rows, 0)

            a1b = h1b * _elu_deriv(a1)
            gb1 = gb1 + a1b
            gw1x = gw1x + x * a1b
            gw1y = gw1y + y * a1b
            xb_rows.append(jnp.sum(w1x * a1b, 0, keepdims=True))
            yb_rows.append(jnp.sum(w1y * a1b, 0, keepdims=True))
        pad = jnp.zeros_like(xb_rows[0])
        xb = jnp.concatenate(xb_rows + [pad] * (RP - N), 0)
        yb = jnp.concatenate(yb_rows + [pad] * (RP - N), 0)
        return xb, yb, (gw1x, gw1y, gb1, gw2, gb2, gw3x, gw3y, gb3x, gb3y)

    return rhs, rhs_vjp


_W_ROWS = None  # documented: weight ref row layout is built in _pack


def _make_fwd_kernel(H, T, N, RP):
    rhs, _ = _mlp_factory(H, N, RP)

    def kernel(dts_ref, x0x_ref, x0y_ref, *refs):
        w = tuple(r[:] for r in refs[:9])
        oxs_ref, oys_ref = refs[9], refs[10]
        oxs_ref[0:RP, :] = x0x_ref[:]
        oys_ref[0:RP, :] = x0y_ref[:]

        def body(t, carry):
            px, py = carry
            dt = dts_ref[t]
            k1x, k1y = rhs(px, py, w)
            k2x, k2y = rhs(px + dt / 3 * k1x, py + dt / 3 * k1y, w)
            k3x, k3y = rhs(px + dt * (-k1x / 3 + k2x),
                           py + dt * (-k1y / 3 + k2y), w)
            k4x, k4y = rhs(px + dt * (k1x - k2x + k3x),
                           py + dt * (k1y - k2y + k3y), w)
            nx = px + dt / 8 * (k1x + 3 * k2x + 3 * k3x + k4x)
            ny = py + dt / 8 * (k1y + 3 * k2y + 3 * k3y + k4y)
            oxs_ref[pl.ds((t + 1) * RP, RP), :] = nx
            oys_ref[pl.ds((t + 1) * RP, RP), :] = ny
            return nx, ny

        jax.lax.fori_loop(0, T - 1, body, (x0x_ref[:], x0y_ref[:]))

    return kernel


def _make_bwd_kernel(H, T, N, RP):
    rhs, rhs_vjp = _mlp_factory(H, N, RP)

    def kernel(dts_ref, xs_ref, ys_ref, gx_ref, gy_ref, *refs):
        w = tuple(r[:] for r in refs[:9])
        outs = refs[9:]  # 9 weight cotangents + x0 bar x/y

        def body(i, carry):
            lx, ly, wbar = carry
            t = T - 2 - i
            dt = dts_ref[t]
            px = xs_ref[pl.ds(t * RP, RP), :]
            py = ys_ref[pl.ds(t * RP, RP), :]
            lx = lx + gx_ref[pl.ds((t + 1) * RP, RP), :]
            ly = ly + gy_ref[pl.ds((t + 1) * RP, RP), :]

            k1x, k1y = rhs(px, py, w)
            u2x, u2y = px + dt / 3 * k1x, py + dt / 3 * k1y
            k2x, k2y = rhs(u2x, u2y, w)
            u3x = px + dt * (-k1x / 3 + k2x)
            u3y = py + dt * (-k1y / 3 + k2y)
            k3x, k3y = rhs(u3x, u3y, w)
            u4x = px + dt * (k1x - k2x + k3x)
            u4y = py + dt * (k1y - k2y + k3y)

            pbx, pby = lx, ly
            kb1x, kb1y = dt / 8 * lx, dt / 8 * ly
            kb2x, kb2y = 3 * dt / 8 * lx, 3 * dt / 8 * ly
            kb3x, kb3y = 3 * dt / 8 * lx, 3 * dt / 8 * ly
            kb4x, kb4y = dt / 8 * lx, dt / 8 * ly

            ubx, uby, wbar = rhs_vjp(u4x, u4y, kb4x, kb4y, w, wbar)
            pbx, pby = pbx + ubx, pby + uby
            kb1x, kb1y = kb1x + dt * ubx, kb1y + dt * uby
            kb2x, kb2y = kb2x - dt * ubx, kb2y - dt * uby
            kb3x, kb3y = kb3x + dt * ubx, kb3y + dt * uby

            ubx, uby, wbar = rhs_vjp(u3x, u3y, kb3x, kb3y, w, wbar)
            pbx, pby = pbx + ubx, pby + uby
            kb1x, kb1y = kb1x - dt / 3 * ubx, kb1y - dt / 3 * uby
            kb2x, kb2y = kb2x + dt * ubx, kb2y + dt * uby

            ubx, uby, wbar = rhs_vjp(u2x, u2y, kb2x, kb2y, w, wbar)
            pbx, pby = pbx + ubx, pby + uby
            kb1x, kb1y = kb1x + dt / 3 * ubx, kb1y + dt / 3 * uby

            ubx, uby, wbar = rhs_vjp(px, py, kb1x, kb1y, w, wbar)
            pbx, pby = pbx + ubx, pby + uby

            return pbx, pby, wbar

        z8 = jnp.zeros_like(gx_ref[0:RP, :])
        wbar0 = tuple(jnp.zeros_like(wi) for wi in w)
        lx, ly, wbar = jax.lax.fori_loop(0, T - 1, body, (z8, z8, wbar0))
        for o, g in zip(outs[:9], wbar):
            o[:] = g
        outs[9][:] = lx + gx_ref[0:RP, :]
        outs[10][:] = ly + gy_ref[0:RP, :]

    return kernel


def _pack_weights(params, C, H):
    """models.mlp layer list [{w,b}] (leading chain axis C) -> lane-major
    tuple (w1x, w1y, b1, w2, b2, w3x, w3y, b3x, b3y)."""
    f32 = jnp.float32
    w1 = params[0]["w"].astype(f32)          # (C, 2, H)
    b1 = params[0]["b"].astype(f32)          # (C, H)
    w2 = params[1]["w"].astype(f32)          # (C, H, H)
    b2 = params[1]["b"].astype(f32)
    w3 = params[2]["w"].astype(f32)          # (C, H, 2)
    b3 = params[2]["b"].astype(f32)          # (C, 2)
    w1x = w1[:, 0, :].T                      # (H, C)
    w1y = w1[:, 1, :].T
    # row block j holds w2[:, j] (the column feeding output j)
    w2p = jnp.transpose(w2, (2, 1, 0)).reshape(H * H, C)
    w3x = w3[:, :, 0].T
    w3y = w3[:, :, 1].T
    return (w1x, w1y, b1.T, w2p, b2.T, w3x, w3y, b3[:, 0][None, :],
            b3[:, 1][None, :])


def _unpack_wbar(wbar, C, H):
    (gw1x, gw1y, gb1, gw2, gb2, gw3x, gw3y, gb3x, gb3y) = wbar
    w1 = jnp.stack([gw1x.T, gw1y.T], axis=1)            # (C, 2, H)
    w2 = jnp.transpose(gw2.reshape(H, H, C), (2, 1, 0))  # (C, H, H)
    w3 = jnp.stack([gw3x.T, gw3y.T], axis=-1)           # (C, H, 2)
    b3 = jnp.stack([gb3x[0], gb3y[0]], axis=-1)         # (C, 2)
    return [
        {"w": w1, "b": gb1.T},
        {"w": w2, "b": gb2.T},
        {"w": w3, "b": b3},
    ]


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _traj(packed, x0, ts, H, tile, interpret):
    return _fwd_impl(packed, x0, ts, H, tile, interpret)[0]


def mlp_rk4_trajectory(params, x0, ts, tile=256, interpret=False):
    """rk4 (3/8-rule) trajectories of the MLP field for C chains.

    params: models.mlp layer list with a leading chain axis C (exactly
    [2, H, H, 2] sizes); x0 (N, 2) shared; ts (T,).  Returns (T, C, N, 2),
    differentiable w.r.t. params.  C must be a multiple of 128.
    """
    H = params[0]["w"].shape[-1]
    packed = _pack_weights(params, params[0]["w"].shape[0], H)
    return _traj(packed, x0, ts, H, tile, interpret)


def _fwd_impl(packed, x0, ts, H, tile, interpret):
    C = packed[0].shape[1]
    if C % 128:
        raise ValueError(f"chain count must be a multiple of 128, got {C}")
    tile = min(tile, C)
    while C % tile:
        tile -= 128
    f32 = jnp.float32
    T = ts.shape[0]
    N = x0.shape[-2]
    RP = _pad8(N)
    dts = jnp.diff(ts.astype(f32))
    x0b = jnp.broadcast_to(x0.astype(f32), (C, N, 2))
    x0x = jnp.concatenate([x0b[:, :, 0].T, jnp.zeros((RP - N, C), f32)], 0)
    x0y = jnp.concatenate([x0b[:, :, 1].T, jnp.zeros((RP - N, C), f32)], 0)

    kernel = _make_fwd_kernel(H, T, N, RP)

    def vt(rows):
        return pl.BlockSpec((rows, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    xs, ys = pl.pallas_call(
        kernel,
        grid=(C // tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), vt(RP), vt(RP)]
        + [vt(wi.shape[0]) for wi in packed],
        out_specs=[vt(T * RP), vt(T * RP)],
        out_shape=[jax.ShapeDtypeStruct((T * RP, C), f32)] * 2,
        interpret=interpret,
    )(dts, x0x, x0y, *packed)

    traj = jnp.stack(
        [xs.reshape(T, RP, C)[:, :N], ys.reshape(T, RP, C)[:, :N]], axis=-1
    )
    traj = jnp.moveaxis(traj, 2, 1)
    return traj, (packed, x0, ts, xs, ys)


def _fwd_rule(packed, x0, ts, H, tile, interpret):
    return _fwd_impl(packed, x0, ts, H, tile, interpret)


def _bwd_rule(H, tile, interpret, res, g):
    packed, x0, ts, xs, ys = res
    C = packed[0].shape[1]
    tile_ = min(tile, C)
    while C % tile_:
        tile_ -= 128
    f32 = jnp.float32
    T = ts.shape[0]
    N = x0.shape[-2]
    RP = _pad8(N)
    dts = jnp.diff(ts.astype(f32))

    g = g.astype(f32)
    gT = jnp.moveaxis(g, 1, 2)
    zpad = jnp.zeros((T, RP - N, C), f32)
    gx = jnp.concatenate([gT[..., 0], zpad], axis=1).reshape(T * RP, C)
    gy = jnp.concatenate([gT[..., 1], zpad], axis=1).reshape(T * RP, C)

    kernel = _make_bwd_kernel(H, T, N, RP)

    def vt(rows):
        return pl.BlockSpec((rows, tile_), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        kernel,
        grid=(C // tile_,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [vt(T * RP)] * 4 + [vt(wi.shape[0]) for wi in packed],
        out_specs=[vt(wi.shape[0]) for wi in packed] + [vt(RP), vt(RP)],
        out_shape=[jax.ShapeDtypeStruct(wi.shape, f32) for wi in packed]
        + [jax.ShapeDtypeStruct((RP, C), f32)] * 2,
        interpret=interpret,
    )(dts, xs, ys, gx, gy, *packed)

    wbar = tuple(outs[:9])
    x0bx, x0by = outs[9], outs[10]
    x0_bar = jnp.stack(
        [jnp.sum(x0bx[:N], axis=1), jnp.sum(x0by[:N], axis=1)], axis=-1
    )
    return wbar, x0_bar.astype(x0.dtype), jnp.zeros_like(ts)


_traj.defvjp(_fwd_rule, _bwd_rule)


def make_fused_mlp_potential(x0, ts, X, reg: float = 0.5, tile=256,
                             interpret=None):
    """Batched MLP posterior potential (SSE + L2 prior, nn.ipynb cell 6)
    through the fused kernels; drop-in for models.mlp.make_potential with
    chain-batched layer params."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    X = jnp.asarray(X, jnp.float32)

    def potential_batch(params):
        traj = mlp_rk4_trajectory(params, x0, ts, tile, interpret)
        xode = jnp.transpose(traj, (1, 2, 0, 3))       # (C, N, T, 2)
        loss = jnp.sum((X[None] - xode) ** 2, axis=(1, 2, 3))
        l2 = sum(
            jnp.sum(layer["w"].reshape(layer["w"].shape[0], -1) ** 2, axis=1)
            + jnp.sum(layer["b"] ** 2, axis=1)
            for layer in params
        )
        return loss + reg * l2

    return potential_batch
