"""ODEnet for MNIST-style image classification.

Reference: neuralode_examples/odenet_mnist.py — a conv net whose residual
stack is replaced by one ODE block integrating a GroupNorm + time-concat
conv field over t in [0, 1] at rtol=atol=tol (odenet_mnist.py:92-134), with
forward/backward NFE meters (the NFE comes from solver stats here) and a
downsampling head + pooled linear classifier.

Plain-pytree implementation; convolutions via lax.conv_general_dilated in
NHWC (TPU-native layout).
"""
from __future__ import annotations

import math
from typing import Callable, Dict

import jax
import jax.numpy as jnp


def _conv_init(key, k, c_in, c_out):
    # torch Conv2d default init: U(+-1/sqrt(fan_in))
    k1, k2 = jax.random.split(key)
    bound = 1.0 / math.sqrt(c_in * k * k)
    return {
        "w": jax.random.uniform(k1, (k, k, c_in, c_out), minval=-bound,
                                maxval=bound),
        "b": jax.random.uniform(k2, (c_out,), minval=-bound, maxval=bound),
    }


def _conv(p, x, stride=1):
    out = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["b"]


def _group_norm(p, x, groups=32, eps=1e-5):
    N, H, W, C = x.shape
    g = min(groups, C)
    xg = x.reshape(N, H, W, g, C // g)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xg, axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) / jnp.sqrt(var + eps)
    x = xg.reshape(N, H, W, C)
    return x * p["scale"] + p["bias"]


def _gn_init(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}


def init_resblock(key, dim: int):
    """Pre-activation residual block params (odenet_mnist.py:48-74)."""
    k1, k2 = jax.random.split(key)
    return {
        "gn1": _gn_init(dim),
        "conv1": _conv_init(k1, 3, dim, dim),
        "gn2": _gn_init(dim),
        "conv2": _conv_init(k2, 3, dim, dim),
    }


def resblock(params, x):
    out = jax.nn.relu(_group_norm(params["gn1"], x))
    out = _conv(params["conv1"], out)
    out = jax.nn.relu(_group_norm(params["gn2"], out))
    out = _conv(params["conv2"], out)
    return out + x


def init_params(key, dim: int = 64, n_classes: int = 10,
                network: str = "odenet", n_resblocks: int = 6) -> Dict:
    keys = jax.random.split(key, 8)
    if network == "resnet":
        # the reference's ResNet baseline replaces the ODE block with 6
        # residual blocks (odenet_mnist.py:304)
        rkeys = jax.random.split(keys[3], n_resblocks)
        feature = {"resblocks": [init_resblock(k, dim) for k in rkeys]}
    else:
        feature = {}
    base = {
        "down": {
            "conv1": _conv_init(keys[0], 3, 1, dim),
            "gn1": _gn_init(dim),
            "conv2": _conv_init(keys[1], 4, dim, dim),
            "gn2": _gn_init(dim),
            "conv3": _conv_init(keys[2], 4, dim, dim),
        },
        "odefunc": {
            "gn1": _gn_init(dim),
            # time-concat convs: one extra input channel carrying t
            # (odenet_mnist.py:60-75)
            "conv1": _conv_init(keys[3], 3, dim + 1, dim),
            "gn2": _gn_init(dim),
            "conv2": _conv_init(keys[4], 3, dim + 1, dim),
            "gn3": _gn_init(dim),
        },
        "head": {
            "gn": _gn_init(dim),
            "fc": {
                "w": jax.random.uniform(
                    keys[5], (dim, n_classes),
                    minval=-1.0 / math.sqrt(dim), maxval=1.0 / math.sqrt(dim)
                ),
                "b": jnp.zeros((n_classes,)),
            },
        },
    }
    base.update(feature)
    return base


def downsample(params, x):
    """1->dim conv + two stride-2 convs (odenet_mnist.py:288-295)."""
    h = _conv(params["conv1"], x)
    h = jax.nn.relu(_group_norm(params["gn1"], h))
    h = _conv(params["conv2"], h, stride=2)
    h = jax.nn.relu(_group_norm(params["gn2"], h))
    h = _conv(params["conv3"], h, stride=2)
    return h


def ode_field(params, t, h):
    """GroupNorm-relu-ConcatConv x2 + final norm (odenet_mnist.py:92-114)."""
    def concat_t(x):
        tt = jnp.broadcast_to(t, x.shape[:-1] + (1,)).astype(x.dtype)
        return jnp.concatenate([tt, x], axis=-1)

    out = jax.nn.relu(_group_norm(params["gn1"], h))
    out = _conv(params["conv1"], concat_t(out))
    out = jax.nn.relu(_group_norm(params["gn2"], out))
    out = _conv(params["conv2"], concat_t(out))
    return _group_norm(params["gn3"], out)


def classify(params, h):
    """Head: norm-relu-global pool-linear (odenet_mnist.py:296-300)."""
    h = jax.nn.relu(_group_norm(params["head"]["gn"], h))
    h = jnp.mean(h, axis=(1, 2))
    return h @ params["head"]["fc"]["w"] + params["head"]["fc"]["b"]


def forward(params, x, odeint_fn: Callable = None):
    """Full network: downsample -> feature stack -> classifier.

    With `odeint_fn(field, h0, ts)` the feature stack is one ODE block over
    [0, 1]; params built with network="resnet" use 6 residual blocks
    instead (the reference's baseline switch, odenet_mnist.py:304)."""
    h = downsample(params["down"], x)
    if "resblocks" in params:
        for blk in params["resblocks"]:
            h = resblock(blk, h)
        h1 = h
    else:
        ts = jnp.asarray([0.0, 1.0])
        hs = odeint_fn(lambda t, hh: ode_field(params["odefunc"], t, hh),
                       h, ts)
        h1 = jax.tree.map(lambda a: a[-1], hs)
    return classify(params, h1)


def make_loss(odeint_fn: Callable, images, labels) -> Callable:
    def loss(params):
        logits = forward(params, images, odeint_fn)
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], 1))

    return loss


def accuracy(params, images, labels, odeint_fn: Callable):
    logits = forward(params, images, odeint_fn)
    return jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
