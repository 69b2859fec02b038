"""ODEnet image classification (reference neuralode_examples/odenet_mnist.py).

  python examples/odenet_mnist.py --niters 200 --tol 1e-3

This environment has no network egress and no bundled MNIST, so by default
the driver trains on a synthetic structured-digit dataset of the same
shape (28x28x1, 10 classes); pass --mnist-npz PATH to train on a real
MNIST .npz with arrays x_train (N, 28, 28), y_train (N,).  Logs per-eval
NFE-forward (from solver stats, replacing the reference's nfe attribute
meters, odenet_mnist.py:102-105) and accuracy.
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bayesian_ode_tpu import odeint, odeint_with_stats
from bayesian_ode_tpu.models import odenet
from bayesian_ode_tpu.utils.logging import RunLogger
from bayesian_ode_tpu.utils.meters import RunningAverageMeter


def synthetic_digits(key, n, size=28):
    """Structured classes: oriented bar patterns + noise; learnable but
    non-trivial."""
    k1, k2 = jax.random.split(key)
    labels = jax.random.randint(k1, (n,), 0, 10)
    xx, yy = jnp.meshgrid(jnp.linspace(-1, 1, size), jnp.linspace(-1, 1, size))

    def render(lab, noise_key):
        angle = lab * jnp.pi / 10.0
        stripe = jnp.sin(6.0 * (xx * jnp.cos(angle) + yy * jnp.sin(angle))
                         + 0.3 * lab)
        blob = jnp.exp(-((xx - 0.05 * lab) ** 2 + yy**2) * 3.0)
        img = stripe * blob
        return img + 0.2 * jax.random.normal(noise_key, img.shape)

    keys = jax.random.split(k2, n)
    imgs = jax.vmap(render)(labels.astype(jnp.float32), keys)
    return imgs[..., None], labels


def main():
    from bayesian_ode_tpu.utils import enable_persistent_cache

    enable_persistent_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--niters", type=int, default=500)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--lr", type=float, default=0.1)
    ap.add_argument("--tol", type=float, default=1e-3)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--solver", default="dopri5", choices=["dopri5", "rk4"])
    ap.add_argument("--network", default="odenet",
                    choices=["odenet", "resnet"])
    ap.add_argument("--mnist-npz", default=None)
    ap.add_argument("--log", default=None)
    args = ap.parse_args()

    if args.mnist_npz:
        with np.load(args.mnist_npz) as d:
            x = jnp.asarray(d["x_train"][..., None], jnp.float32) / 255.0
            y = jnp.asarray(d["y_train"], jnp.int32)
    else:
        x, y = synthetic_digits(jax.random.PRNGKey(0), 4096)
    n_train = int(0.9 * x.shape[0])
    x_train, y_train = x[:n_train], y[:n_train]
    x_test, y_test = x[n_train:], y[n_train:]

    params = odenet.init_params(jax.random.PRNGKey(1), dim=args.dim,
                                network=args.network)
    tx = optax.sgd(args.lr, momentum=0.9)
    opt_state = tx.init(params)

    if args.solver == "rk4":
        solve = lambda f, h0, t: odeint(f, h0, t, method="rk4")
    else:
        solve = lambda f, h0, t: odeint(
            f, h0, t, rtol=args.tol, atol=args.tol, method="dopri5",
            options={"mode": "bounded", "max_steps_per_interval": 32},
        )

    @jax.jit
    def step(params, opt_state, key):
        idx = jax.random.randint(key, (args.batch_size,), 0, n_train)
        loss = odenet.make_loss(solve, x_train[idx], y_train[idx])
        val, g = jax.value_and_grad(loss)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, val

    @jax.jit
    def evaluate(params):
        acc = odenet.accuracy(params, x_test[:512], y_test[:512], solve)
        # forward NFE through the ODE block at eval shapes
        h = odenet.downsample(params["down"], x_test[:8])
        _, st = odeint_with_stats(
            lambda t, hh: odenet.ode_field(params["odefunc"], t, hh), h,
            jnp.asarray([0.0, 1.0]), args.tol, args.tol, "dopri5",
        )
        return acc, st["nfe"]

    logger = RunLogger(args.log, echo=True)
    tmeter = RunningAverageMeter(0.97)
    key = jax.random.PRNGKey(2)
    end = time.time()
    for itr in range(1, args.niters + 1):
        key, sub = jax.random.split(key)
        params, opt_state, val = step(params, opt_state, sub)
        tmeter.update(time.time() - end)
        if itr % 50 == 0:
            acc, nfe_f = evaluate(params)
            logger.log({"iter": itr, "loss": float(val),
                        "test_acc": float(acc), "nfe_forward": int(nfe_f),
                        "sec_per_iter": tmeter.avg})
        end = time.time()
    logger.close()


if __name__ == "__main__":
    main()
