"""Spiral neural-ODE demo (reference neuralode_examples/ode_demo.py).

Trains the Linear-Tanh-Linear field on y^3 against the true spiral
dy/dt = y^3 A with RMSprop on random sub-trajectory minibatches; --adjoint
flips the gradient engine exactly as the reference's import switch
(ode_demo.py:22-25).

  python examples/ode_demo.py --niters 500 --adjoint --viz
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bayesian_ode_tpu import odeint, odeint_adjoint
from bayesian_ode_tpu.models import spiral
from bayesian_ode_tpu.utils.logging import RunLogger
from bayesian_ode_tpu.utils.meters import RunningAverageMeter


def main():
    from bayesian_ode_tpu.utils import enable_persistent_cache

    enable_persistent_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--method", default="dopri5",
                    choices=["dopri5", "tsit5", "adams", "rk4"])
    ap.add_argument("--data-size", type=int, default=1000)
    ap.add_argument("--batch-time", type=int, default=10)
    ap.add_argument("--batch-size", type=int, default=20)
    ap.add_argument("--niters", type=int, default=2000)
    ap.add_argument("--test-freq", type=int, default=20)
    ap.add_argument("--adjoint", action="store_true")
    ap.add_argument("--viz", action="store_true")
    ap.add_argument("--log", default=None)
    args = ap.parse_args()

    t = jnp.linspace(0.0, 25.0, args.data_size)
    true_y = odeint(spiral.true_field, spiral.TRUE_Y0, t, method="dopri5")

    if args.adjoint:
        solve = lambda f, y0, tt: odeint_adjoint(f, y0, tt, rtol=1e-7,
                                                 atol=1e-9, method=args.method)
    else:
        opts = {"mode": "bounded"} if args.method in ("dopri5", "tsit5",
                                                      "adams") else None
        solve = lambda f, y0, tt: odeint(f, y0, tt, method=args.method,
                                         options=opts)

    params = spiral.init_params(jax.random.PRNGKey(0))
    tx = optax.rmsprop(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, key):
        by0, bt, by = spiral.get_batch(key, true_y, t, args.batch_time,
                                       args.batch_size)
        loss = spiral.make_loss(solve, by0, bt, by)
        val, g = jax.value_and_grad(loss)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, val

    @jax.jit
    def full_loss(params):
        pred = solve(lambda tt, y: spiral.vector_field(params, tt, y),
                     spiral.TRUE_Y0, t)
        return jnp.mean(jnp.abs(pred - true_y)), pred

    logger = RunLogger(args.log, echo=True)
    time_meter = RunningAverageMeter(0.97)
    loss_meter = RunningAverageMeter(0.97)
    key = jax.random.PRNGKey(1)
    end = time.time()
    for itr in range(1, args.niters + 1):
        key, sub = jax.random.split(key)
        params, opt_state, val = train_step(params, opt_state, sub)
        time_meter.update(time.time() - end)
        loss_meter.update(float(val))
        if itr % args.test_freq == 0:
            test_loss, pred = full_loss(params)
            logger.log({"iter": itr, "batch_loss": loss_meter.avg,
                        "total_loss": float(test_loss),
                        "sec_per_iter": time_meter.avg})
            if args.viz:
                _viz(np.asarray(true_y), np.asarray(pred), itr)
        end = time.time()
    logger.close()


def _viz(true_y, pred_y, itr):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import os

    os.makedirs("png", exist_ok=True)
    fig, ax = plt.subplots(figsize=(5, 5))
    ax.plot(true_y[:, 0], true_y[:, 1], "g-", label="true")
    ax.plot(pred_y[:, 0], pred_y[:, 1], "b--", label="pred")
    ax.legend()
    fig.savefig(f"png/{itr:05d}.png", dpi=100)
    plt.close(fig)


if __name__ == "__main__":
    main()
