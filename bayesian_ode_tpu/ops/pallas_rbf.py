"""Pallas TPU kernel: tiled SVGD phi (RBF kernel matrix + Stein update).

The SVGD direction needs the full n x n RBF kernel against every particle
(stein.py), whose HBM materialization dominates at >= 4k particles (an
8192-particle K is 256 MB in f32).  This kernel tiles over particle rows:
each program holds one (TM, d) row block plus the full particle/score
arrays in VMEM, computes its K tile with two MXU matmuls
((TM, d) @ (d, n) for distances and (TM, n) @ (n, d) for the weighted
sums), and writes only the (TM, d) phi rows — K never touches HBM.

phi_i = (sum_j K_ij s_j + 2 gamma (x_i sum_j K_ij - sum_j K_ij x_j)) / n

Feature dimension is padded to the 128-lane tile; the bandwidth gamma
(median heuristic) is computed by the caller (a global reduction).
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _phi_kernel(gamma_ref, rows_ref, cols_ref, scores_ref, yy_ref, out_ref):
    """One (TM, TN) tile of the kernel matrix; the column grid dimension
    revisits the same output rows and accumulates (K never materializes
    beyond one VMEM tile)."""
    j = pl.program_id(1)
    gamma = gamma_ref[0]
    rows = rows_ref[:]                       # (TM, dp)
    cols = cols_ref[:]                       # (TN, dp)
    s_cols = scores_ref[:]                   # (TN, dp)

    xx = jnp.sum(rows * rows, axis=1, keepdims=True)          # (TM, 1)
    cross = jnp.dot(rows, cols.T, preferred_element_type=jnp.float32)
    d2 = jnp.maximum(xx + yy_ref[:].reshape(1, -1) - 2.0 * cross, 0.0)
    K = jnp.exp(-gamma * d2)                                  # (TM, TN)

    ksum = jnp.sum(K, axis=1, keepdims=True)                  # (TM, 1)
    Ks = jnp.dot(K, s_cols, preferred_element_type=jnp.float32)
    Kp = jnp.dot(K, cols, preferred_element_type=jnp.float32)
    # division by the true particle count happens in the caller
    tile = Ks + 2.0 * gamma * (rows * ksum - Kp)

    @pl.when(j == 0)
    def _():
        out_ref[:] = tile

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + tile


def svgd_phi_pallas(particles: jax.Array, scores: jax.Array, gamma,
                    tile_rows: int = 256, tile_cols: int = 1024,
                    interpret: bool = False):
    """phi(X) for particles/scores (n, d) with fixed bandwidth gamma.

    n is padded to a multiple of lcm(tile_rows, tile_cols) and d to the
    128-lane tile; padded rows are mapped far away so their kernel weights
    underflow to exactly 0 and real rows are unaffected.
    """
    n, d = particles.shape
    dp = max(128, ((d + 127) // 128) * 128)
    import math as _math

    step = _math.lcm(tile_rows, tile_cols)
    npad = ((n + step - 1) // step) * step

    # Far-away fill for padded rows: big^2 * dp stays well below f32 max
    # while gamma * big^2 underflows exp to exactly 0.
    big = jnp.asarray(1e9, particles.dtype)

    def pad(x, fill=0.0):
        return jnp.pad(
            x, ((0, npad - n), (0, dp - d)), constant_values=fill
        )

    p_pad = pad(particles)
    # push padded particles to a far corner: exp(-gamma * huge) == 0
    if npad > n:
        pad_rows = (jnp.arange(npad) >= n)[:, None]
        p_pad = jnp.where(pad_rows, big, p_pad)
    s_pad = pad(scores)
    yy = jnp.sum(p_pad * p_pad, axis=1)

    gamma_arr = jnp.asarray([gamma], jnp.float32)

    out = pl.pallas_call(
        _phi_kernel,
        grid=(npad // tile_rows, npad // tile_cols),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_rows, dp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_cols, dp), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_cols, dp), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_cols,), lambda i, j: (j,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_rows, dp), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, dp), jnp.float32),
        interpret=interpret,
    )(gamma_arr, p_pad, p_pad, s_pad, yy)

    # padded columns contributed K == 0; slice off padded rows/features
    return out[:n, :d] / n


def svgd_phi_reference(particles, scores, gamma):
    """Plain-XLA reference for testing (same math as stein.svgd_direction
    with fixed gamma)."""
    xx = jnp.sum(particles * particles, axis=1)
    d2 = jnp.maximum(
        xx[:, None] + xx[None, :] - 2.0 * particles @ particles.T, 0.0
    )
    K = jnp.exp(-gamma * d2)
    ksum = jnp.sum(K, axis=1)
    grad_K = 2.0 * gamma * (particles * ksum[:, None] - K @ particles)
    return (K @ scores + grad_K) / particles.shape[0]
