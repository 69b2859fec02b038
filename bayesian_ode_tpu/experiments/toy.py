"""2-D toy-density sampler experiments.

Reference: scripts/toy/toy_plots.py:126-459 — per-sampler runners over the
banana / Gaussian / mixture targets with scatter + density plots and
step-size-weighted posterior means for decreasing-step samplers
(toy_plots.py:229-234).  Chains run vmapped; plotting uses matplotlib
hist2d instead of seaborn KDE.
"""
from __future__ import annotations

import json
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .. import samplers
from ..models import TOY_POTENTIALS
from ..samplers import schedules
from ..utils.logging import RunLogger


def make_toy_sampler(config: Dict, potential):
    method = config["method"]
    if method == "MALA":
        return samplers.mala(potential, config["lr"])
    if method == "SGLD":
        return samplers.sgld(
            potential,
            schedules.polynomial_decay(config["lr0"], config["lr_gamma"],
                                       config["lr_t0"],
                                       config.get("lr_alpha", 1.0)),
        )
    if method == "pSGLD":
        return samplers.psgld(
            potential,
            schedules.polynomial_decay(config["lr0"], config["lr_gamma"],
                                       config["lr_t0"],
                                       config.get("lr_alpha", 1.0)),
            alpha=config.get("psgld_alpha", 0.99),
            lambda_=config.get("lambda_", 1e-5),
        )
    if method == "aSGHMC":
        return samplers.asghmc(potential, config["lr"],
                               burn_in_steps=config["burn_in"],
                               mom_decay=config.get("mom_decay", 5e-2))
    if method == "PT":
        # replica exchange (no reference analogue): the mixture/grid toys
        # are exactly the targets single-temperature kernels get stuck on
        return samplers.parallel_tempering(
            potential,
            samplers.temperature_ladder(
                config.get("num_replicas", 6),
                config.get("beta_min", 0.05)),
            step_size=config["lr"],
            inner=config.get("pt_inner", "mala"),
            swap_every=config.get("swap_every", 1))
    raise ValueError(f"unknown toy sampler {method!r}")


def weighted_posterior_mean(positions, step_sizes):
    """Step-size-weighted mean sum(lr_t * x_t)/sum(lr_t) for
    decreasing-step samplers (toy_plots.py:229-234)."""
    w = step_sizes / jnp.sum(step_sizes, axis=-1, keepdims=True)
    return jnp.sum(positions * w[..., None], axis=(-3, -2)) / positions.shape[-3]


def run_toy(config: Dict, output: str, dists=("banana", "gauss",
                                              "multimodal"),
            make_plots: bool = True) -> Dict:
    out_dir = os.path.join(output, config["method"])
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, f"{config.get('id', 0)}.json"), "w") as f:
        json.dump(config, f, indent=2, default=str)

    n_chains = config.get("num_chains", 16)
    results = {}
    logger = RunLogger(os.path.join(out_dir, "run.jsonl"))
    if make_plots:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(ncols=len(dists), nrows=1, dpi=150,
                                 figsize=(4 * len(dists), 4))
        if len(dists) == 1:
            axes = [axes]

    for j, name in enumerate(dists):
        if name not in TOY_POTENTIALS:
            raise ValueError(f"unknown toy density {name!r}; expected one "
                             f"of {sorted(TOY_POTENTIALS)}")
        potential = TOY_POTENTIALS[name]()
        kernel = make_toy_sampler(config, potential)
        x0 = jnp.zeros(2) if name != "gauss" else jnp.asarray([2.0, 4.0])
        states = samplers.init_chains(
            kernel, jax.random.PRNGKey(config.get("seed", 0)), x0, n_chains,
            jitter=0.5,
        )
        _, pos, infos = jax.jit(
            lambda s, k: samplers.sample_chains(
                kernel, s, k, num_samples=config["num_samples"],
                burn_in=config["burn_in"],
                thin=config.get("thinning", 1),
            )
        )(states, jax.random.split(
            jax.random.PRNGKey(config.get("seed", 0) + 1), n_chains))

        flat = np.asarray(pos).reshape(-1, 2)
        mean = flat.mean(0)
        wmean = np.asarray(
            jnp.sum(pos * (infos["step_size"] /
                           jnp.sum(infos["step_size"], -1, keepdims=True)
                           )[..., None], axis=1).mean(0)
        )
        acc = float(jnp.mean(infos["accepted"].astype(jnp.float32)))
        ess = float(samplers.ess(pos[:, :, 0]))
        results[name] = {"mean": mean.tolist(),
                         "weighted_mean": wmean.tolist(),
                         "acceptance": acc, "ess_x": ess}
        logger.log({"event": "toy", "dist": name, **results[name]})

        if make_plots:
            ax = axes[j]
            ax.hist2d(flat[:, 0], flat[:, 1], bins=60, cmap="binary")
            ax.plot(flat[::97, 0], flat[::97, 1], ".", ms=1, alpha=0.3)
            ax.set_title(f"{name} ({config['method']})")

    if make_plots:
        fig.savefig(os.path.join(out_dir,
                                 f"{config.get('id', 0)}_densities.pdf"))
        import matplotlib.pyplot as plt

        plt.close(fig)
    logger.close()
    return results
