"""Latent ODE VAE on 2-D spirals (reference neuralode_examples/latent_ode.py).

  python examples/latent_ode.py --niters 500 --train-dir /tmp/latent_ckpt

Checkpoints the full training state (params + optimizer + data) to
--train-dir and resumes from it, the reference's interrupt/resume flow
(latent_ode.py:233-293) generalized to every-N-iters saving.
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bayesian_ode_tpu import odeint_adjoint
from bayesian_ode_tpu.models import latent_ode
from bayesian_ode_tpu.utils.checkpoint import load_pytree, save_pytree
from bayesian_ode_tpu.utils.logging import RunLogger
from bayesian_ode_tpu.utils.meters import RunningAverageMeter


def main():
    from bayesian_ode_tpu.utils import enable_persistent_cache

    enable_persistent_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--niters", type=int, default=2000)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--nspiral", type=int, default=1000)
    ap.add_argument("--train-dir", default=None)
    ap.add_argument("--ckpt-every", type=int, default=200)
    ap.add_argument("--visualize", action="store_true")
    args = ap.parse_args()

    orig, samp, orig_ts, samp_ts = latent_ode.generate_spiral2d(
        nspiral=args.nspiral, noise_std=0.3
    )
    samp = jnp.asarray(samp, jnp.float32)
    ts = jnp.asarray(samp_ts, jnp.float32)

    params = latent_ode.init_params(jax.random.PRNGKey(0))
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)
    start_iter = 0

    ckpt_path = None
    if args.train_dir is not None:
        os.makedirs(args.train_dir, exist_ok=True)
        ckpt_path = os.path.join(args.train_dir, "ckpt.npz")
        if os.path.exists(ckpt_path):
            state = load_pytree(ckpt_path, {"params": params,
                                            "opt_state": opt_state,
                                            "iter": jnp.asarray(0)})
            params, opt_state = state["params"], state["opt_state"]
            start_iter = int(state["iter"])
            print(f"resumed from {ckpt_path} at iter {start_iter}")

    solve = lambda f, z0, t: odeint_adjoint(f, z0, t, rtol=1e-5, atol=1e-7,
                                            method="dopri5")
    loss_fn = latent_ode.make_loss(solve, samp, ts, noise_std=0.3)

    @jax.jit
    def step(params, opt_state, key):
        val, g = jax.value_and_grad(loss_fn)(params, key)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, val

    logger = RunLogger(
        os.path.join(args.train_dir, "run.jsonl") if args.train_dir else None,
        echo=True,
    )
    meter = RunningAverageMeter()
    key = jax.random.PRNGKey(1)
    for itr in range(start_iter + 1, args.niters + 1):
        key, sub = jax.random.split(key)
        params, opt_state, val = step(params, opt_state, sub)
        meter.update(float(val))
        if itr % 20 == 0:
            logger.log({"iter": itr, "running_avg_elbo": -meter.avg})
        if ckpt_path is not None and itr % args.ckpt_every == 0:
            save_pytree(ckpt_path, {"params": params, "opt_state": opt_state,
                                    "iter": jnp.asarray(itr)})
    logger.close()

    if args.visualize and args.train_dir:
        _viz(params, samp, ts, solve, args.train_dir)


def _viz(params, samp, ts, solve, out_dir):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    mu, logvar = latent_ode.encode(params["rec"], samp[:8])
    zs = solve(lambda t, z: latent_ode.latent_field(params["func"], t, z), mu,
               ts)
    xs = latent_ode.decode(params["dec"], jnp.moveaxis(zs, 0, 1))
    fig, ax = plt.subplots(figsize=(5, 5))
    for i in range(4):
        ax.plot(np.asarray(samp[i, :, 0]), np.asarray(samp[i, :, 1]), ".",
                ms=2)
        ax.plot(np.asarray(xs[i, :, 0]), np.asarray(xs[i, :, 1]), "-")
    fig.savefig(os.path.join(out_dir, "vis.png"), dpi=120)
    plt.close(fig)


if __name__ == "__main__":
    main()
