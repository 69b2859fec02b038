"""Latent SDE on noisy damped oscillations (beyond the reference: its
latent-variable example is the latent ODE VAE, neuralode_examples/
latent_ode.py — this is the stochastic-path counterpart, Li et al. 2020).

  python examples/latent_sde.py --niters 800 --train-dir /tmp/latent_sde

Same interrupt/resume flow as examples/latent_ode.py (full training state
checkpointed every --ckpt-every iters); --visualize writes data overlaid
with posterior reconstructions and prior draws.
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bayesian_ode_tpu.models import latent_sde
from bayesian_ode_tpu.utils.checkpoint import load_pytree, save_pytree
from bayesian_ode_tpu.utils.logging import RunLogger
from bayesian_ode_tpu.utils.meters import RunningAverageMeter


def generate_oscillations(key, n=256, T=40, t1=6.0, noise_std=0.05):
    """Noisy 2-D damped oscillators with random phase/decay — trajectories
    whose path-to-path variability a deterministic latent path cannot
    carry (the latent SDE's job)."""
    k1, k2, k3 = jax.random.split(key, 3)
    ts = np.linspace(0.0, t1, T)
    phase = jax.random.uniform(k1, (n, 1)) * 2 * np.pi
    decay = 0.1 + 0.2 * jax.random.uniform(k2, (n, 1))
    env = jnp.exp(-decay * ts[None])
    xs = jnp.stack([env * jnp.sin(ts[None] + phase),
                    env * jnp.cos(ts[None] + phase)], axis=-1)
    xs = xs + noise_std * jax.random.normal(k3, xs.shape)
    return ts, xs


def main():
    from bayesian_ode_tpu.utils import enable_persistent_cache

    enable_persistent_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--niters", type=int, default=800)
    ap.add_argument("--lr", type=float, default=5e-3)
    ap.add_argument("--ntraj", type=int, default=256)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--substeps", type=int, default=3)
    ap.add_argument("--latent-dim", type=int, default=4)
    ap.add_argument("--noise-std", type=float, default=0.05)
    ap.add_argument("--kl-anneal", type=int, default=200,
                    help="linear KL warmup iters (0 disables)")
    ap.add_argument("--train-dir", default=None)
    ap.add_argument("--ckpt-every", type=int, default=200)
    ap.add_argument("--visualize", action="store_true")
    args = ap.parse_args()

    ts, xs = generate_oscillations(jax.random.PRNGKey(0), n=args.ntraj,
                                   noise_std=args.noise_std)

    params = latent_sde.init_params(jax.random.PRNGKey(1),
                                    latent_dim=args.latent_dim, obs_dim=2)
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

    # the minibatch and the annealed KL weight are traced ARGUMENTS (fixed
    # shapes), so every iteration reuses one compiled step
    @jax.jit
    def step(params, opt_state, key, batch, kl_w):
        loss_fn = latent_sde.make_loss(ts, batch, noise_std=args.noise_std,
                                       substeps=args.substeps,
                                       kl_weight=kl_w)
        val, g = jax.value_and_grad(loss_fn)(params, key)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, val

    logger = RunLogger(
        os.path.join(args.train_dir, "run.jsonl") if args.train_dir else None,
        echo=True,
    )
    meter = RunningAverageMeter()
    key = jax.random.PRNGKey(2)
    n = xs.shape[0]
    for itr in range(start_iter + 1, args.niters + 1):
        key, k_batch, k_loss = jax.random.split(key, 3)
        idx = jax.random.choice(k_batch, n, (args.batch,), replace=False)
        kl_w = (1.0 if args.kl_anneal <= 0
                else min(1.0, itr / args.kl_anneal))
        params, opt_state, val = step(params, opt_state, k_loss, xs[idx],
                                      jnp.asarray(kl_w))
        meter.update(float(val))
        if itr % 20 == 0:
            logger.log({"iter": itr, "running_avg_neg_elbo": meter.avg,
                        "kl_weight": kl_w})
        if ckpt_path is not None and itr % args.ckpt_every == 0:
            save_pytree(ckpt_path, {"params": params, "opt_state": opt_state,
                                    "iter": jnp.asarray(itr)})
    logger.close()

    if args.visualize and args.train_dir:
        _viz(params, ts, xs, args.train_dir)


def _viz(params, ts, xs, out_dir):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    recon = latent_sde.sample_posterior(params, jax.random.PRNGKey(3), ts,
                                        xs[:4])
    prior = latent_sde.sample_prior(params, jax.random.PRNGKey(4), ts, 4)
    fig, axes = plt.subplots(1, 2, figsize=(10, 5))
    for i in range(4):
        axes[0].plot(np.asarray(xs[i, :, 0]), np.asarray(xs[i, :, 1]), ".",
                     ms=2)
        axes[0].plot(np.asarray(recon[i, :, 0]), np.asarray(recon[i, :, 1]),
                     "-")
        axes[1].plot(np.asarray(prior[i, :, 0]), np.asarray(prior[i, :, 1]),
                     "-")
    axes[0].set_title("data + posterior reconstruction")
    axes[1].set_title("prior draws")
    fig.savefig(os.path.join(out_dir, "vis.png"), dpi=120)
    plt.close(fig)


if __name__ == "__main__":
    main()
