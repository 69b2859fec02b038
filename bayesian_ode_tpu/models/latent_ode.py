"""Latent ODE VAE over 2-D spirals.

Reference: neuralode_examples/latent_ode.py.  A RecognitionRNN encodes the
observation sequence in reverse to q(z0); a 4-d latent ODE (ELU MLP,
latent_ode.py:108-125) is integrated over the sample times; a decoder maps
back to observation space; the loss is -ELBO = -log N(x | x_hat, sigma^2)
+ KL(q(z0) || N(0, I)) (latent_ode.py:250-273).

TPU-first: the reverse RNN encode is a `lax.scan` (the reference's Python
loop over time, latent_ode.py:253-256), the whole training step jits, and
the spiral batch dimension vmaps/shards.
"""
from __future__ import annotations

import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _linear_init(key, d_in, d_out):
    # torch.nn.Linear default: U(-1/sqrt(d_in), 1/sqrt(d_in))
    k1, k2 = jax.random.split(key)
    bound = 1.0 / math.sqrt(d_in)
    return {
        "w": jax.random.uniform(k1, (d_in, d_out), minval=-bound, maxval=bound),
        "b": jax.random.uniform(k2, (d_out,), minval=-bound, maxval=bound),
    }


def _linear(p, x):
    return x @ p["w"] + p["b"]


def init_params(key, latent_dim=4, obs_dim=2, nhidden=20, rnn_nhidden=25):
    keys = jax.random.split(key, 7)
    return {
        "func": {
            "fc1": _linear_init(keys[0], latent_dim, nhidden),
            "fc2": _linear_init(keys[1], nhidden, nhidden),
            "fc3": _linear_init(keys[2], nhidden, latent_dim),
        },
        "rec": {
            "i2h": _linear_init(keys[3], obs_dim + rnn_nhidden, rnn_nhidden),
            "h2o": _linear_init(keys[4], rnn_nhidden, latent_dim * 2),
        },
        "dec": {
            "fc1": _linear_init(keys[5], latent_dim, nhidden),
            "fc2": _linear_init(keys[6], nhidden, obs_dim),
        },
    }


def latent_field(func_params, t, z):
    """ELU MLP latent dynamics (latent_ode.py:108-125)."""
    h = jax.nn.elu(_linear(func_params["fc1"], z))
    h = jax.nn.elu(_linear(func_params["fc2"], h))
    return _linear(func_params["fc3"], h)


def encode(rec_params, samp_trajs, rnn_nhidden=25):
    """Reverse-time RNN encode to (qz0_mean, qz0_logvar)
    (latent_ode.py:127-144, 253-257) as a lax.scan."""
    B = samp_trajs.shape[0]
    h0 = jnp.zeros((B, rnn_nhidden))

    def cell(h, obs):
        combined = jnp.concatenate([obs, h], axis=1)
        h = jnp.tanh(_linear(rec_params["i2h"], combined))
        out = _linear(rec_params["h2o"], h)
        return h, out

    # iterate t = T-1 .. 0
    obs_rev = jnp.moveaxis(samp_trajs, 1, 0)[::-1]
    _, outs = jax.lax.scan(cell, h0, obs_rev)
    out = outs[-1]
    d = out.shape[-1] // 2
    return out[:, :d], out[:, d:]


def decode(dec_params, z):
    h = jax.nn.relu(_linear(dec_params["fc1"], z))
    return _linear(dec_params["fc2"], h)


def log_normal_pdf(x, mean, logvar):
    const = jnp.log(2.0 * jnp.pi)
    return -0.5 * (const + logvar + (x - mean) ** 2 / jnp.exp(logvar))


def normal_kl(mu1, lv1, mu2, lv2):
    v1, v2 = jnp.exp(lv1), jnp.exp(lv2)
    return lv2 / 2.0 - lv1 / 2.0 + (v1 + (mu1 - mu2) ** 2) / (2.0 * v2) - 0.5


def make_loss(odeint_fn: Callable, samp_trajs, samp_ts,
              noise_std: float = 0.3, rnn_nhidden: int = 25) -> Callable:
    """-ELBO(params, key) (latent_ode.py:250-273)."""
    noise_logvar = 2.0 * jnp.log(jnp.asarray(noise_std))

    def loss(params, key):
        qz0_mean, qz0_logvar = encode(params["rec"], samp_trajs, rnn_nhidden)
        eps = jax.random.normal(key, qz0_mean.shape)
        z0 = eps * jnp.exp(0.5 * qz0_logvar) + qz0_mean
        pred_z = odeint_fn(
            lambda t, z: latent_field(params["func"], t, z), z0, samp_ts
        )
        pred_z = jnp.moveaxis(pred_z, 0, 1)          # (B, T, latent)
        pred_x = decode(params["dec"], pred_z)
        logpx = jnp.sum(log_normal_pdf(samp_trajs, pred_x, noise_logvar),
                        axis=(-2, -1))
        kl = jnp.sum(
            normal_kl(qz0_mean, qz0_logvar, jnp.zeros_like(qz0_mean),
                      jnp.zeros_like(qz0_logvar)),
            axis=-1,
        )
        return jnp.mean(-logpx + kl)

    return loss


def generate_spiral2d(nspiral=1000, ntotal=500, nsample=100, start=0.0,
                      stop=6 * np.pi, noise_std=0.3, a=0.0, b=0.3, seed=0
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Archimedean-spiral dataset (latent_ode.py:39-105): clockwise and
    counter-clockwise spirals, random windows, additive noise."""
    rng = np.random.RandomState(seed)
    orig_ts = np.linspace(start, stop, num=ntotal)
    samp_ts = orig_ts[:nsample]

    zs_cw = stop + 1.0 - orig_ts
    rs_cw = a + b * 50.0 / zs_cw
    orig_cw = np.stack(
        [rs_cw * np.cos(zs_cw) - 5.0, rs_cw * np.sin(zs_cw)], axis=1
    )
    zs_cc = orig_ts
    rs_cc = a + b * zs_cc
    orig_cc = np.stack(
        [rs_cc * np.cos(zs_cc) + 5.0, rs_cc * np.sin(zs_cc)], axis=1
    )

    orig_trajs, samp_trajs = [], []
    for _ in range(nspiral):
        t0_idx = rng.randint(nsample, ntotal - nsample)
        orig = orig_cc if rng.rand() > 0.5 else orig_cw
        orig_trajs.append(orig)
        samp = orig[t0_idx : t0_idx + nsample].copy()
        samp += rng.randn(*samp.shape) * noise_std
        samp_trajs.append(samp)

    return (np.stack(orig_trajs), np.stack(samp_trajs), orig_ts, samp_ts)
