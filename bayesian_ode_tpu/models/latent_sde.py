"""Latent SDE: a variational stochastic differential equation over a
latent state, trained by the pathwise (Girsanov) ELBO.

Beyond the reference: its latent-variable model is the latent ODE VAE
(neuralode_examples/latent_ode.py; models/latent_ode.py here), whose
latent path is deterministic given z0 — all stochasticity is squeezed
into the initial state.  The latent SDE (Li et al. 2020, "Scalable
Gradients for Stochastic Differential Equations", arXiv:2001.01328;
torchsde's flagship example) lets the PATH itself be random:

    prior:      dz = f_theta(t, z) dt           + g_theta(t) dW
    posterior:  dz = h_phi(t, z, ctx(t)) dt     + g_theta(t) dW

with a SHARED diffusion so the two path measures are equivalent, and

    ELBO = E_q[ sum_k log p(x_k | z_k) - int_0^T (1/2)|u|^2 dt ]
           - KL(q(z0) || p(z0)),       u = (h - f) / g,

the Girsanov drift-mismatch penalty replacing the latent ODE's single
z0 KL.  TPU-first realization: the KL integral rides the SAME
`lax.scan` as the path — the state is the pytree {"z": z, "kl": kl}
through `sde.sdeint`, with drift {"z": h, "kl": |u|^2/2} and diffusion
{"z": g, "kl": 0}, so one fixed-grid Euler-Maruyama solve yields both
the trajectory and the discretized KL, and reverse-mode through the
scan gives exactly the discrete adjoint of the discretized objective
(no separate backward SDE pass needed at fixed step counts).

The posterior drift is conditioned on the data through a reverse-time
GRU context: ctx(t) is piecewise-constant between observation times
(torchsde examples/latent_sde.py's design), looked up inside the drift
by `searchsorted` on the concrete observation grid.

Everything is functional dicts like models/latent_ode.py: `init_params`,
`make_loss` (the -ELBO closure over (params, key)), `sample_prior`.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..sde import sdeint
from .latent_ode import _linear, _linear_init, log_normal_pdf, normal_kl

__all__ = [
    "init_params",
    "encode",
    "make_loss",
    "sample_prior",
    "sample_posterior",
]


def _mlp_init(key, sizes):
    keys = jax.random.split(key, len(sizes) - 1)
    return [_linear_init(k, a, b) for k, a, b in zip(keys, sizes[:-1], sizes[1:])]


def _mlp(params, x, act=jax.nn.softplus):
    for p in params[:-1]:
        x = act(_linear(p, x))
    return _linear(params[-1], x)


def init_params(key, latent_dim=4, obs_dim=2, ctx_dim=16, nhidden=32,
                rnn_nhidden=32):
    """Parameter pytree: prior drift f, posterior drift h (takes ctx),
    per-dimension log-diffusion, reverse GRU encoder (context + q(z0)),
    decoder, and a learnable standard-normal-initialized p(z0)."""
    keys = jax.random.split(key, 8)
    return {
        "f": _mlp_init(keys[0], [latent_dim + 1, nhidden, latent_dim]),
        "h": _mlp_init(keys[1], [latent_dim + 1 + ctx_dim, nhidden, latent_dim]),
        "logsd": jnp.full((latent_dim,), -1.0),
        "gru": _gru_init(keys[2], obs_dim, rnn_nhidden),
        "ctx_proj": _linear_init(keys[3], rnn_nhidden, ctx_dim),
        "qz0": _linear_init(keys[4], rnn_nhidden, 2 * latent_dim),
        "dec": _mlp_init(keys[5], [latent_dim, nhidden, obs_dim]),
        "pz0_mean": jnp.zeros((latent_dim,)),
        "pz0_logvar": jnp.zeros((latent_dim,)),
    }


def _gru_init(key, d_in, d_h):
    k1, k2 = jax.random.split(key)
    return {
        "ih": _linear_init(k1, d_in, 3 * d_h),
        "hh": _linear_init(k2, d_h, 3 * d_h),
    }


def _gru_cell(p, h, x):
    gi = _linear(p["ih"], x)
    gh = _linear(p["hh"], h)
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def encode(params, xs):
    """Reverse-time GRU over observations (B, T, obs_dim) ->
    (ctx (B, T, ctx_dim), qz0_mean (B, L), qz0_logvar (B, L)).

    ctx[:, k] summarizes observations k..T-1 — the filtering context the
    posterior drift reads on the interval [t_k, t_{k+1})."""
    B, T = xs.shape[0], xs.shape[1]
    d_h = params["gru"]["hh"]["w"].shape[0]
    h0 = jnp.zeros((B, d_h))

    def cell(h, x):
        h = _gru_cell(params["gru"], h, x)
        return h, h

    hs_rev_last, hs_rev = jax.lax.scan(cell, h0, jnp.moveaxis(xs, 1, 0)[::-1])
    hs = hs_rev[::-1]                                    # (T, B, d_h)
    ctx = _linear(params["ctx_proj"], hs)                # (T, B, ctx_dim)
    out = _linear(params["qz0"], hs_rev_last)            # (B, 2L)
    L = out.shape[-1] // 2
    return jnp.moveaxis(ctx, 0, 1), out[:, :L], out[:, L:]


def _prior_drift(params, t, z):
    tcol = jnp.broadcast_to(jnp.asarray(t, z.dtype), z.shape[:-1] + (1,))
    return _mlp(params["f"], jnp.concatenate([z, tcol], axis=-1))


def _posterior_drift(params, t, z, c):
    tcol = jnp.broadcast_to(jnp.asarray(t, z.dtype), z.shape[:-1] + (1,))
    return _mlp(params["h"], jnp.concatenate([z, tcol, c], axis=-1))


def _diffusion(params, z):
    return jnp.broadcast_to(jnp.exp(params["logsd"]).astype(z.dtype), z.shape)


def make_loss(ts, xs, noise_std: float = 0.1, substeps: int = 2,
              kl_weight: float = 1.0) -> Callable:
    """-ELBO(params, key) for observations xs (B, T, obs_dim) at
    concrete times ts (T,).

    One Euler-Maruyama solve of the augmented posterior SDE per batch
    (batch rides the state's leading axis), Girsanov KL accumulated in
    the "kl" channel, Gaussian observation likelihood at the grid points.
    """
    # host grid first (numpy-able even when make_loss is built inside a
    # jitted step — jnp.asarray would stage a tracer that sdeint rejects)
    ts_host = np.asarray(jax.device_get(ts))
    ts = jnp.asarray(ts_host)
    xs = jnp.asarray(xs)
    noise_logvar = 2.0 * jnp.log(jnp.asarray(noise_std))
    B = xs.shape[0]

    def loss(params, key):
        ctx, qm, qlv = encode(params, xs)                # (B,T,C),(B,L),(B,L)
        k_z0, k_path = jax.random.split(key)
        eps = jax.random.normal(k_z0, qm.shape)
        z0 = qm + eps * jnp.exp(0.5 * qlv)

        def drift(t, state):
            z = state["z"]
            # piecewise-constant context: the interval [ts[k], ts[k+1])
            # reads ctx[:, k]
            k = jnp.clip(jnp.searchsorted(ts, t, side="right") - 1,
                         0, ts.shape[0] - 1)
            c = ctx[:, k]
            h = _posterior_drift(params, t, z, c)
            f = _prior_drift(params, t, z)
            g = _diffusion(params, z)
            u = (h - f) / g
            return {"z": h, "kl": 0.5 * jnp.sum(u * u, axis=-1)}

        def diffusion(t, state):
            return {"z": _diffusion(params, state["z"]),
                    "kl": jnp.zeros_like(state["kl"])}

        state0 = {"z": z0, "kl": jnp.zeros((B,), z0.dtype)}
        path = sdeint(drift, diffusion, state0, ts_host, k_path,
                      options={"substeps": substeps})
        zs = jnp.moveaxis(path["z"], 0, 1)               # (B, T, L)
        kl_path = path["kl"][-1]                         # (B,)

        pred_x = _mlp(params["dec"], zs)
        logpx = jnp.sum(log_normal_pdf(xs, pred_x, noise_logvar),
                        axis=(-2, -1))                   # (B,)
        kl_z0 = jnp.sum(
            normal_kl(qm, qlv, params["pz0_mean"], params["pz0_logvar"]),
            axis=-1)
        return jnp.mean(-logpx + kl_weight * (kl_z0 + kl_path))

    return loss


def sample_prior(params, key, ts, num_samples: int, substeps: int = 2):
    """Generate (num_samples, T, obs_dim) decoded draws from the PRIOR
    SDE — the generative model after training."""
    ts_host = np.asarray(jax.device_get(ts))
    k_z0, k_path = jax.random.split(key)
    L = params["pz0_mean"].shape[0]
    z0 = (params["pz0_mean"]
          + jnp.exp(0.5 * params["pz0_logvar"])
          * jax.random.normal(k_z0, (num_samples, L)))
    zs = sdeint(lambda t, z: _prior_drift(params, t, z),
                lambda t, z: _diffusion(params, z),
                z0, ts_host, k_path, options={"substeps": substeps})
    return jnp.moveaxis(_mlp(params["dec"], zs), 0, 1)


def sample_posterior(params, key, ts, xs, substeps: int = 2):
    """Decoded posterior-path draws conditioned on observations xs
    (B, T, obs_dim): one posterior-SDE sample per batch row."""
    ts_host = np.asarray(jax.device_get(ts))
    ts = jnp.asarray(ts_host)
    ctx, qm, qlv = encode(params, xs)
    k_z0, k_path = jax.random.split(key)
    z0 = qm + jnp.exp(0.5 * qlv) * jax.random.normal(k_z0, qm.shape)

    def drift(t, z):
        k = jnp.clip(jnp.searchsorted(ts, t, side="right") - 1,
                     0, ts.shape[0] - 1)
        return _posterior_drift(params, t, z, ctx[:, k])

    zs = sdeint(drift, lambda t, z: _diffusion(params, z), z0, ts_host,
                k_path, options={"substeps": substeps})
    return jnp.moveaxis(_mlp(params["dec"], zs), 0, 1)
