"""Bayesian nonparametric GP-ODE experiment driver (Van der Pol / FHN / LV).

TPU-native re-design of scripts/vanderpol/gp.py: where the reference fans a
config out to `multiprocessing.Pool` workers each running ONE chain
(gp.py:510-564), this driver runs `num_chains` vmapped chains in a single
jitted program, with the same config schema, method dispatch, artifact
layout ({output}/{method}/{id}{dir_name}/), thinning, posterior-mode and
posterior-predictive-band plots — plus the ESS/R-hat diagnostics the
reference lacks (SURVEY.md §5.5).
"""
from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .. import odeint, odeint_adjoint, samplers
from ..models import DYNAMICS
from ..models import kernel_regression as kr
from ..optim import lbfgs_minimize
from ..samplers import schedules
from ..utils.checkpoint import save_pytree
from ..utils.logging import RunLogger


def _out_dir(output: str, config: Dict) -> str:
    d = os.path.join(output, str(config["method"]),
                     str(config.get("id", 0)) + config.get("dir_name", ""))
    os.makedirs(d, exist_ok=True)
    return d


def _make_solve(config: Dict):
    """(solve, adaptive): the config-driven solver dispatch shared by
    build_model, run_evidence, and the SMC sampler branch.  Adaptive
    solvers honor config rtol/atol (defaults 1e-7/1e-9)."""
    solver = config.get("solver", "rk4")
    adaptive = solver in ("dopri5", "tsit5", "adams")
    if adaptive:
        solve = lambda f, x0, t: odeint_adjoint(
            f, x0, t, method=solver, rtol=config.get("rtol", 1e-7),
            atol=config.get("atol", 1e-9))
    else:
        solve = lambda f, x0, t: odeint_adjoint(f, x0, t, method=solver)
    return solve, adaptive


def build_model(config: Dict, data: Dict):
    """Grid + static kernel quantities + gradient-matched init + potential
    (gp.py:305-353).

    config["model"] == "nn" swaps the GP vector field for the MLP
    mean-function baseline (nn.ipynb cell 4; BASELINE config #3): uniform
    (-0.5, 0.5) init, SSE + L2 potential, no static kernel quantities.
    "spiral" is the reference ode_demo y^3-net; "fhn" is mechanistic
    FitzHugh-Nagumo parameter inference over theta = (a, b, c)
    (models/fhn_inference, Gaussian likelihood + Gaussian theta priors).

    config["solver"] picks the integrator (any odeint registry name;
    default "rk4" = the reference's sampler configuration, gp.py:346).
    Adaptive solvers ("dopri5"/"tsit5"/"adams") honor config rtol/atol
    (defaults 1e-7/1e-9) and force Precision.HIGHEST on the GP RHS
    matmuls (load-bearing: bf16 passes inflate adaptive NFE ~45x).
    """
    model = config.get("model", "gp")
    if model not in ("gp", "nn", "spiral", "fhn"):
        raise ValueError(f"unknown model {model!r}; expected 'gp', 'nn', "
                         "'spiral' or 'fhn'")
    solve, adaptive = _make_solve(config)
    if model == "fhn":
        # mechanistic parameter inference (models/fhn_inference): the
        # Ramsay/Girolami FHN posterior over theta = (a, b, c) — the
        # task the reference's GP/NN surrogates sidestep (gp.py:31-33
        # uses FHN only as a fixed data generator)
        from ..models import fhn_inference

        theta0 = fhn_inference.init_theta()
        noise0 = float(config.get("noise", data["noise"]))
        potential = fhn_inference.make_potential(
            data["x0"], data["t"], data["Y"], solve, noise=noise0)
        sq_err = fhn_inference.make_potential(
            data["x0"], data["t"], data["Y"], solve, noise=noise0,
            add_prior=False)
        return None, theta0, potential, sq_err
    if model == "spiral":
        # third NN architecture (reference ode_demo's y^3 tanh net,
        # models/spiral.py) on the same dataset contract — the
        # public-fused-engine acceptance field, driver-visible
        from ..models import spiral as spiral_model

        H = config.get("hidden", 50)
        params0 = spiral_model.init_params(
            jax.random.PRNGKey(config.get("seed", 0)), hidden=H)
        reg = config.get("reg", 0.5)
        potential = spiral_model.make_potential(
            data["x0"], data["t"], data["Y"], solve, reg=reg)
        sq_err = spiral_model.make_potential(
            data["x0"], data["t"], data["Y"], solve, reg=reg,
            add_prior=False)
        return None, params0, potential, sq_err
    if model == "nn":
        from ..models import mlp

        H = config.get("hidden", 32)
        params0 = mlp.init_mlp(jax.random.PRNGKey(config.get("seed", 0)),
                               [2, H, H, 2])
        reg = config.get("reg", 0.5)
        prec = jax.lax.Precision.HIGHEST if adaptive else None
        potential = mlp.make_potential(data["x0"], data["t"], data["Y"],
                                       solve, reg=reg, precision=prec)
        sq_err = mlp.make_potential(data["x0"], data["t"], data["Y"],
                                    solve, reg=reg, add_prior=False,
                                    precision=prec)
        return None, params0, potential, sq_err
    Z = kr.make_inducing_grid(data["Y"], M=config["M"])
    static = kr.make_static(Z, sf=config["sf"], ell=config["ell"])
    params0 = kr.init_params(data["Y"], data["t"], static,
                             noise=config.get("noise", data["noise"]))
    prec = jax.lax.Precision.HIGHEST if adaptive else None
    potential = kr.make_potential(static, data["x0"], data["t"], data["Y"],
                                  solve, precision=prec)
    sq_err = kr.make_potential(static, data["x0"], data["t"], data["Y"],
                               solve, add_prior=False, precision=prec)
    return static, params0, potential, sq_err


def _poly_sched(config):
    return schedules.polynomial_decay(
        lr0=config["lr0"], gamma=config["lr_gamma"], t0=config["lr_t0"],
        alpha=config.get("lr_alpha", 1.0),
    )


def make_sampler(config: Dict, potential: Callable):
    """Method dispatch (gp.py:360-378, extended with the full suite)."""
    method = config["method"]
    total = config["burn_in"] + config["num_samples"]
    if method == "SGLD":
        return samplers.sgld(potential, _poly_sched(config))
    if method == "MALA":
        return samplers.mala(potential, config["lr"])
    if method == "pSGLD":
        return samplers.psgld(potential, _poly_sched(config),
                              alpha=config["psgld_alpha"],
                              lambda_=config["lambda_"])
    if method == "aSGLD":
        return samplers.asgld(potential, _poly_sched(config),
                              alpha=config["psgld_alpha"],
                              lambda_=config["lambda_"])
    if method == "cSGLD":
        return samplers.csgld(potential, lr0=config["lr0"],
                              num_cycles=config.get("num_cycles", 4),
                              total_iters=total,
                              beta=config.get("beta", 0.25))
    if method == "aSGHMC":
        return samplers.asghmc(potential, config["lr"],
                               burn_in_steps=config["burn_in"],
                               mom_decay=config.get("mom_decay", 5e-2),
                               lambda_=config["lambda_"])
    if method == "acSGHMC":
        return samplers.acsghmc(potential, lr0=config["lr0"],
                                num_cycles=config.get("num_cycles", 4),
                                total_iters=total,
                                burn_in_steps=config["burn_in"],
                                beta=config.get("beta", 0.25),
                                mom_decay=config.get("mom_decay", 5e-2),
                                lambda_=config["lambda_"])
    if method == "BAOAB":
        return samplers.baoab(potential, config["lr"],
                              friction=config.get("friction", 1.0),
                              burn_in_steps=config["burn_in"],
                              lambda_=config["lambda_"])
    if method == "HMC":
        return samplers.hmc(potential, config["lr"],
                            num_leapfrog=config.get("num_leapfrog", 10),
                            jitter=config.get("eps_jitter", 0.2))
    if method == "AdaptiveHMC":
        return samplers.adaptive_hmc(
            potential, num_adapt=config["burn_in"],
            step_size=config["lr"],
            num_leapfrog=config.get("num_leapfrog", 10),
            target_accept=config.get("target_accept", 0.8),
            jitter=config.get("eps_jitter", 0.2))
    if method == "NUTS":
        return samplers.nuts(potential, config["lr"],
                             max_depth=config.get("max_depth", 10))
    if method == "AdaptiveNUTS":
        return samplers.adaptive_nuts(
            potential, num_adapt=config["burn_in"],
            step_size=config["lr"],
            max_depth=config.get("max_depth", 10),
            target_accept=config.get("target_accept", 0.8))
    if method == "SGRHMC":
        return samplers.sgrhmc(potential, _poly_sched(config),
                               friction=config.get("friction", 0.1),
                               lambda_=config["lambda_"])
    if method == "AdamSGLD":
        return samplers.adam_sgld(potential, _poly_sched(config),
                                  a=config.get("adam_a", 1.0),
                                  lambda_=config["lambda_"])
    if method == "MMALA":
        metric = samplers.softabs_metric(
            potential, softabs_coeff=config.get("softabs_coeff", 1e3)
        )
        return samplers.mmala(potential, config["lr"], metric_fn=metric)
    if method.startswith("HAMCMC"):
        variant = int(method[-1]) if method[-1].isdigit() else 1
        return samplers.hamcmc(potential, _poly_sched(config),
                               memory=config.get("memory", 5),
                               variant=variant,
                               trust_reg=config.get("trust_reg", 1.0),
                               H_gamma=config.get("H_gamma", 1.0))
    raise ValueError(f"unknown sampler method {method!r}")


def _sample_chain_checkpointed(kernel, state, key, total, burn_in, thin,
                               ckpt_every, ckpt_path, resume=False):
    """Segmented `sample_chain` with an on-disk checkpoint after every
    `ckpt_every` kept samples (VERDICT r4 #7: driver-level elastic resume
    of long chains, generalizing the reference latent_ode.py checkpoint
    pattern to sampling).

    The PRNG stream is segment-indexed (`fold_in(key, seg)`), burn-in
    runs only in segment 0, and the checkpoint carries the full sampler
    state pytree + collected positions/infos — so a run killed mid-chain
    and resumed with `resume=True` produces EXACTLY the chain an
    uninterrupted run of this function produces, PRNG keys included
    (tests/test_experiments.py gate).  Note the stream differs from the
    single-call `sample_chain(key, ...)` stream by construction; enable
    `ckpt_every` from the start of a run you may need to resume.
    """
    from ..utils.checkpoint import load_pytree, save_pytree

    segs = [(s, min(ckpt_every, total - s))
            for s in range(0, total, ckpt_every)]

    # hoisted jits: one per distinct (num_samples, burn_in) signature —
    # a fresh jax.jit per segment would retrace/re-lower the identical
    # program every ckpt_every samples (seconds each on the fused
    # potentials; the compile cache skips only the XLA compile)
    _seg_cache = {}

    def seg_fn(n, burn):
        key_ = (n, burn)
        if key_ not in _seg_cache:
            _seg_cache[key_] = jax.jit(
                lambda s, k, n=n, burn=burn: samplers.sample_chain(
                    kernel, s, k, num_samples=n, burn_in=burn, thin=thin))
        return _seg_cache[key_]

    # structure template for load_pytree's treedef check (shapes differ;
    # only the tree structure is compared)
    _, pos_t, info_t = jax.eval_shape(
        lambda s, k: samplers.sample_chain(kernel, s, k, num_samples=1,
                                           burn_in=0, thin=thin),
        state, key)
    template = {"state": state, "next_seg": 0,
                "positions": pos_t, "infos": info_t}

    start, positions, infos = 0, None, None
    if resume and os.path.exists(ckpt_path):
        blob = load_pytree(ckpt_path, template)
        state = blob["state"]
        start = int(blob["next_seg"])
        positions, infos = blob["positions"], blob["infos"]

    cat = lambda a, b: jax.tree.map(  # noqa: E731
        lambda x, y: jnp.concatenate([x, y], axis=0), a, b)
    for i, (s0, n) in enumerate(segs):
        if i < start:
            continue
        state, pos_i, info_i = jax.block_until_ready(
            seg_fn(n, burn_in if i == 0 else 0)(
                state, jax.random.fold_in(key, i)))
        positions = pos_i if positions is None else cat(positions, pos_i)
        infos = info_i if infos is None else cat(infos, info_i)
        save_pytree(ckpt_path, {"state": state, "next_seg": i + 1,
                                "positions": positions, "infos": infos})
    return state, positions, infos


def run_sampler(config: Dict, data: Dict, output: str,
                make_plots: bool = True) -> Dict[str, Any]:
    """Posterior sampling (gp.py:290-507) over vmapped chains.

    config["engine"] == "fused" runs SGLD/cSGLD/pSGLD/aSGHMC/MALA/BAOAB through the fused Pallas
    trajectory kernels (ops/gp_rk4.py for the GP field, ops/mlp_rk4.py for
    model="nn"; ~12x faster on TPU); chain counts are rounded up to a
    multiple of 128 there.  With config["solver"] == "dopri5" the fused
    engine integrates adaptively at config rtol/atol through the
    differentiable whole-solve kernels (ops/gp_dopri5_grad.py for the GP
    field — the BASELINE north-star configuration — and ops/mlp_dopri5.py
    for model="nn"), end to end fused.
    """
    out_dir = _out_dir(output, config)
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(config, f, indent=2, default=str)

    static, params0, potential, sq_err = build_model(config, data)
    n_chains = config.get("num_chains", 64)

    fused = config.get("engine") == "fused" and config["method"] in (
        "SGLD", "cSGLD", "pSGLD", "AdamSGLD", "aSGHMC", "acSGHMC",
        "SGRHMC", "MALA", "BAOAB", "HMC", "AdaptiveHMC", "NUTS",
        "AdaptiveNUTS", "PT", "Ensemble")
    # PT and Ensemble are batch-contract kernels by construction (replica
    # rows / interacting walkers), so on the generic engine they run over
    # the vmapped potential through the same batched path (the reference
    # runs every sampler against the GP model, gp.py:360-378).
    if fused or config["method"] in ("PT", "Ensemble"):
        f32 = jnp.float32 if fused else jnp.asarray(
            jax.tree.leaves(params0)[0]).dtype
        if fused:
            # stretch_move evaluates each HALF of the ensemble per sweep,
            # so the fused kernels' 128-multiple contract applies to N/2
            mult = 256 if config["method"] == "Ensemble" else 128
            n_chains = ((n_chains + mult - 1) // mult) * mult
        elif n_chains % 2:
            n_chains += 1          # stretch_move needs even red/black halves
        solver = config.get("solver", "rk4")
        if fused and solver not in ("rk4", "dopri5"):
            raise ValueError(
                f"engine='fused' supports solver 'rk4' or 'dopri5' "
                f"(got {solver!r}); use the generic engine for others")
        if not fused:
            pot_batch = jax.vmap(potential)
        elif config.get("model", "gp") == "fhn":
            # public fused engine (ops/fused_field): the mechanistic FHN
            # theta-field registration, adaptive dopri5 only
            if solver != "dopri5":
                raise ValueError(
                    "engine='fused' model='fhn' supports solver="
                    f"'dopri5' only (got {solver!r})")
            from ..ops.fhn_dopri5 import make_fused_fhn_potential_dopri5

            pot_batch = make_fused_fhn_potential_dopri5(
                data["x0"].astype(f32), data["t"].astype(f32),
                data["Y"].astype(f32),
                noise=float(config.get("noise", data["noise"])),
                rtol=config.get("rtol", 1e-7),
                atol=config.get("atol", 1e-9),
                store_steps=config.get("store_steps", 128),
            )
        elif config.get("model", "gp") == "spiral":
            # public fused engine (ops/fused_field): the spiral y^3-net
            # field registration, adaptive dopri5 only (no spiral rk4
            # kernel — use the generic engine for fixed-grid runs)
            if solver != "dopri5":
                raise ValueError(
                    "engine='fused' model='spiral' supports solver="
                    f"'dopri5' only (got {solver!r})")
            from ..ops.spiral_dopri5 import (
                make_fused_spiral_potential_dopri5,
            )

            pot_batch = make_fused_spiral_potential_dopri5(
                data["x0"].astype(f32), data["t"].astype(f32),
                data["Y"].astype(f32), reg=config.get("reg", 0.5),
                rtol=config.get("rtol", 1e-7),
                atol=config.get("atol", 1e-9),
                store_steps=config.get("store_steps", 128),
            )
        elif config.get("model", "gp") == "nn":
            if solver == "dopri5":
                from ..ops.mlp_dopri5 import make_fused_mlp_potential_dopri5

                # store_steps=256 (2x the GP field's bench-measured need):
                # MLP step counts grow as chains move toward data-fitting
                # fields and are not pre-measured; exceeding the budget
                # silently invalidates gradients (mlp_dopri5 docstring) —
                # probe with ops.mlp_dopri5.mlp_dopri5_solve_stats when in
                # doubt and override via config["store_steps"]
                pot_batch = make_fused_mlp_potential_dopri5(
                    data["x0"].astype(f32), data["t"].astype(f32),
                    data["Y"].astype(f32), reg=config.get("reg", 0.5),
                    rtol=config.get("rtol", 1e-7),
                    atol=config.get("atol", 1e-9),
                    store_steps=config.get("store_steps", 256),
                )
            else:
                from ..ops.mlp_rk4 import make_fused_mlp_potential

                pot_batch = make_fused_mlp_potential(
                    data["x0"].astype(f32), data["t"].astype(f32),
                    data["Y"].astype(f32), reg=config.get("reg", 0.5),
                )
        else:
            static32 = static._replace(
                Z=static.Z.astype(f32), KzzinvL=static.KzzinvL.astype(f32),
                Kzzinv=static.Kzzinv.astype(f32),
            )
            if solver == "dopri5":
                from ..ops.gp_dopri5_grad import (
                    make_fused_gp_potential_dopri5,
                )

                pot_batch = make_fused_gp_potential_dopri5(
                    static32, data["x0"].astype(f32),
                    data["t"].astype(f32), data["Y"].astype(f32),
                    rtol=config.get("rtol", 1e-7),
                    atol=config.get("atol", 1e-9),
                )
            else:
                from ..ops.gp_rk4 import make_fused_gp_potential

                pot_batch = make_fused_gp_potential(
                    static32, data["x0"].astype(f32), data["t"].astype(f32),
                    data["Y"].astype(f32),
                )
        if config["method"] == "pSGLD":
            kernel = samplers.psgld_batched(pot_batch, _poly_sched(config),
                                            alpha=config["psgld_alpha"],
                                            lambda_=config["lambda_"])
        elif config["method"] == "aSGHMC":
            kernel = samplers.asghmc_batched(
                pot_batch, config["lr"], burn_in_steps=config["burn_in"],
                mom_decay=config.get("mom_decay", 5e-2),
                lambda_=config["lambda_"])
        elif config["method"] == "MALA":
            kernel = samplers.mala_batched(pot_batch, config["lr"])
        elif config["method"] == "SGRHMC":
            kernel = samplers.sgrhmc_batched(
                pot_batch, _poly_sched(config),
                friction=config.get("friction", 0.1),
                lambda_=config["lambda_"])
        elif config["method"] == "AdamSGLD":
            kernel = samplers.adam_sgld_batched(
                pot_batch, _poly_sched(config),
                a=config.get("adam_a", 1.0), lambda_=config["lambda_"])
        elif config["method"] == "acSGHMC":
            kernel = samplers.acsghmc_batched(
                pot_batch, lr0=config["lr0"],
                num_cycles=config.get("num_cycles", 4),
                total_iters=config["burn_in"] + config["num_samples"],
                burn_in_steps=config["burn_in"],
                beta=config.get("beta", 0.25),
                mom_decay=config.get("mom_decay", 5e-2),
                lambda_=config["lambda_"])
        elif config["method"] == "cSGLD":
            kernel = samplers.csgld_batched(
                pot_batch, lr0=config["lr0"],
                num_cycles=config.get("num_cycles", 4),
                total_iters=config["burn_in"] + config["num_samples"],
                beta=config.get("beta", 0.25))
        elif config["method"] == "BAOAB":
            kernel = samplers.baoab_batched(
                pot_batch, config["lr"],
                friction=config.get("friction", 1.0),
                burn_in_steps=config["burn_in"],
                lambda_=config["lambda_"])
        elif config["method"] == "HMC":
            kernel = samplers.hmc_batched(
                pot_batch, config["lr"],
                num_leapfrog=config.get("num_leapfrog", 10),
                jitter=config.get("eps_jitter", 0.2))
        elif config["method"] == "AdaptiveHMC":
            kernel = samplers.adaptive_hmc_batched(
                pot_batch, num_adapt=config["burn_in"],
                step_size=config["lr"],
                num_leapfrog=config.get("num_leapfrog", 10),
                target_accept=config.get("target_accept", 0.8),
                jitter=config.get("eps_jitter", 0.2))
        elif config["method"] == "NUTS":
            kernel = samplers.nuts_batched(
                pot_batch, config["lr"],
                max_depth=config.get("max_depth", 10))
        elif config["method"] == "AdaptiveNUTS":
            kernel = samplers.adaptive_nuts_batched(
                pot_batch, num_adapt=config["burn_in"],
                step_size=config["lr"],
                max_depth=config.get("max_depth", 10),
                target_accept=config.get("target_accept", 0.8))
        elif config["method"] == "PT":
            # replica exchange over the batch contract: the K-rung ladder
            # multiplies the chain batch (rows = K*C, one fused fwd+bwd
            # covers every replica); recorded positions are the cold batch
            kernel = samplers.parallel_tempering_batched(
                pot_batch,
                samplers.temperature_ladder(
                    config.get("num_replicas", 4),
                    config.get("beta_min", 0.1)),
                config["lr"], inner=config.get("pt_inner", "mala"),
                swap_every=config.get("swap_every", 1),
                num_leapfrog=config.get("num_leapfrog", 10))
        elif config["method"] == "Ensemble":
            # Goodman-Weare stretch move: gradient-free interacting
            # walkers; chains double as walkers
            kernel = samplers.stretch_move(
                pot_batch, a=config.get("stretch_a", 2.0))
        else:
            kernel = samplers.sgld_batched(pot_batch, _poly_sched(config))
        jitter = config.get("jitter", 0.005)
        pos0 = jax.tree.map(
            lambda x: jnp.asarray(x, f32)[None]
            + jitter * jax.random.normal(
                jax.random.PRNGKey(config.get("seed", 0)),
                (n_chains,) + x.shape, f32),
            params0,
        )
        state = kernel.init(pos0)
        total = config["num_samples"] // config["thinning"]
        base_key = jax.random.PRNGKey(config.get("seed", 0) + 1)
        ckpt_every = int(config.get("ckpt_every") or 0)
        if ckpt_every > 0:
            _, positions, infos = _sample_chain_checkpointed(
                kernel, state, base_key, total, config["burn_in"],
                config["thinning"], ckpt_every,
                os.path.join(out_dir, "sampler_ckpt.npz"),
                resume=bool(config.get("resume")))
        else:
            run = jax.jit(
                lambda s, k: samplers.sample_chain(
                    kernel, s, k, num_samples=total,
                    burn_in=config["burn_in"], thin=config["thinning"],
                )
            )
            _, positions, infos = jax.block_until_ready(
                run(state, base_key))
        # (samples, C, ...) -> (C, samples, ...) to match the vmapped layout
        positions = jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), positions)
        accepted = infos["accepted"]
        if accepted.ndim == 2:          # per-chain masks (MALA): (T, C)
            accepted = jnp.swapaxes(accepted, 0, 1)
        else:                           # scalar-per-step kernels
            accepted = jnp.broadcast_to(accepted[None],
                                        (n_chains,) + accepted.shape)
        swap_acc = infos.get("swap_accepted")        # PT only: (T, C)
        infos = {"potential": jnp.swapaxes(infos["potential"], 0, 1),
                 "accepted": accepted,
                 "step_size": infos.get("step_size", jnp.zeros(()))}
        if swap_acc is not None:
            # (C, T), consistent with every neighboring info entry: only
            # the scalar mean is consumed today, but a future per-chain
            # consumer must not silently read the wrong axis (ADVICE r4)
            infos["swap_accepted"] = jnp.swapaxes(swap_acc, 0, 1)
    elif config["method"] == "SVGD":
        # BASELINE config #5: SVGD over a particle ensemble on the GP
        # posterior (the reference's stein.py stub, completed).  The
        # ensemble lives inside one kernel state, so this runs through
        # sample_chain like the fused engines; particles double as chains.
        # Caveats for the summary: the per-step potential is the ensemble
        # mean (broadcast per particle), and ESS/R-hat are not meaningful
        # for a deterministic interacting ensemble — reported only for
        # schema consistency.
        from ..utils.pytree import ravel_pytree

        kernel = samplers.svgd(potential,
                               step_size=config.get("lr", config["lr0"]))
        jitter = config.get("jitter", 0.005)
        pos0 = jax.tree.map(
            lambda x: jnp.asarray(x)[None] + jitter * jax.random.normal(
                jax.random.PRNGKey(config.get("seed", 0)),
                (n_chains,) + jnp.shape(x), jnp.asarray(x).dtype),
            params0,
        )
        state = kernel.init(pos0)
        run = jax.jit(
            lambda s, k: samplers.sample_chain(
                kernel, s, k,
                num_samples=config["num_samples"] // config["thinning"],
                burn_in=config["burn_in"], thin=config["thinning"],
            )
        )
        _, flat_positions, infos = jax.block_until_ready(
            run(state, jax.random.PRNGKey(config.get("seed", 0) + 1))
        )
        # (samples, n, P) flat particles -> parameter pytree (n, samples, ..)
        unravel = ravel_pytree(params0)[1]
        positions = jax.vmap(jax.vmap(unravel))(flat_positions)
        positions = jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), positions)
        pots_steps = infos["potential"]                 # (samples,) mean
        infos = {"potential": jnp.broadcast_to(pots_steps[None],
                                               (n_chains,) + pots_steps.shape),
                 "accepted": jnp.broadcast_to(infos["accepted"][None],
                                              (n_chains,)
                                              + infos["accepted"].shape),
                 "step_size": infos["step_size"]}
    elif config["method"] == "SMC":
        # Posterior sampling by adaptive tempered SMC: the prior-annealed
        # population is the structurally-matched sampler for ODE
        # posteriors (see run_evidence).  Particles double as chains; the
        # final population is recorded as one kept sample per particle,
        # and log Z lands in the summary for free.
        if config.get("model", "gp") != "gp":
            raise ValueError("method='SMC' supports the GP model "
                             "(the NN-architecture fields have no "
                             "normalized log-density split)")
        noise0 = float(config.get("noise", data["noise"]))
        solve, _ = _make_solve(config)
        parts = kr.make_log_density_parts(
            static, data["x0"], data["t"], data["Y"], solve,
            precision=jax.lax.Precision.HIGHEST,
            logsn_mu=config.get("logsn_mu"),
            logsn_sd=config.get("logsn_sd", 1.0), noise=noise0)
        key = jax.random.PRNGKey(config.get("seed", 0))
        particles0 = parts.sample_prior(key, n_chains)
        res = jax.block_until_ready(samplers.smc(
            jax.random.fold_in(key, 1), jax.vmap(parts.log_lik),
            jax.vmap(parts.log_prior), particles0,
            num_moves=config.get("smc_moves", 5),
            target_ess=config.get("smc_target_ess", 0.5),
            max_stages=config.get("smc_max_stages", 100)))
        positions = jax.tree.map(lambda x: x[:, None], res.particles)
        pots = -(res.log_lik
                 + jax.vmap(parts.log_prior)(res.particles))[:, None]
        infos = {"potential": pots,
                 "accepted": jnp.ones((n_chains, 1), bool),
                 "step_size": res.step_sizes,
                 "log_z": res.log_z}
    else:
        kernel = make_sampler(config, potential)
        if config.get("guard_finite"):
            # jit-safe NaN sanitizer (replaces the reference's raise-on-NaN
            # aborts, langevin.py:184-192): divergent chains freeze on
            # their last finite state instead of poisoning the batch
            kernel = samplers.guard_finite(kernel)
        states = samplers.init_chains(kernel, jax.random.PRNGKey(config.get("seed", 0)),
                                      params0, n_chains, jitter=config.get("jitter", 0.005))
        keys = jax.random.split(jax.random.PRNGKey(config.get("seed", 0) + 1), n_chains)
        run = jax.jit(
            lambda s, k: samplers.sample_chains(
                kernel, s, k, num_samples=config["num_samples"] // config["thinning"],
                burn_in=config["burn_in"], thin=config["thinning"],
            )
        )
        _, positions, infos = jax.block_until_ready(run(states, keys))

    # losses + diagnostics
    pots = np.asarray(infos["potential"])             # (chains, samples)
    logger = RunLogger(os.path.join(out_dir, "run.jsonl"))
    if isinstance(positions, dict) and "logsn" in positions:
        diag = positions["logsn"]                     # (chains, samples, 2)
    else:
        # nn model: diagnose the first two final-layer bias coordinates
        lead = jax.tree.leaves(positions)[-1]
        diag = lead.reshape(lead.shape[0], lead.shape[1], -1)[:, :, :2]
    if diag.shape[1] >= 4:
        ess_logsn = [float(samplers.ess(diag[:, :, d]))
                     for d in range(diag.shape[-1])]
        rhat_logsn = [float(samplers.split_rhat(diag[:, :, d]))
                      for d in range(diag.shape[-1])]
    else:
        # population methods (SMC) record one kept sample per particle;
        # chain autocorrelation diagnostics are undefined there
        ess_logsn = rhat_logsn = [float("nan")] * diag.shape[-1]
    acc = float(jnp.mean(infos["accepted"].astype(jnp.float32))) \
        if "accepted" in infos else 1.0
    summary = {
        "event": "summary", "method": config["method"],
        "num_chains": n_chains, "kept_samples": pots.shape[1],
        "min_potential": float(pots.min()),
        "median_potential": float(np.median(pots[:, -1])),
        "acceptance": acc, "ess_logsn": ess_logsn, "rhat_logsn": rhat_logsn,
    }
    if isinstance(infos, dict) and "swap_accepted" in infos:
        summary["swap_acceptance"] = float(
            jnp.mean(infos["swap_accepted"].astype(jnp.float32)))
    if isinstance(infos, dict) and "log_z" in infos:
        summary["log_z_smc"] = float(infos["log_z"])
    logger.log(summary)
    logger.close()

    save_pytree(os.path.join(out_dir, "chain.npz"),
                jax.tree.map(np.asarray, positions))
    np.save(os.path.join(out_dir, "total_loss_arr.npy"), pots)

    if make_plots:
        if static is None:
            _plots_sampler_nn(out_dir, config, data, positions, pots)
        else:
            _plots_sampler(out_dir, config, data, static, positions, pots)
    return summary


def _plots_sampler_nn(out_dir, config, data, positions, pots):
    """NN-architecture plots (model 'nn' or 'spiral'): loss curve +
    posterior-mode phase quiver of the learned field (the nn.ipynb
    counterparts of gp.py:383-438)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if config.get("model", "gp") == "fhn":
        from ..models import fhn_inference as _fhn

        field_fn = lambda p, t, y: _fhn.vector_field(p, t, y)  # noqa: E731
        label = "FHN theta"
    elif config.get("model", "gp") == "spiral":
        from ..models import spiral as _spiral

        field_fn = lambda p, t, y: _spiral.vector_field(p, t, y)  # noqa: E731
        label = "spiral y^3-net"
    else:
        from ..models import mlp

        field_fn = mlp.mlp_vector_field
        label = "MLP"

    fig, ax = plt.subplots()
    ax.plot(np.median(pots, axis=0))
    ax.set_xlabel("Kept sample")
    ax.set_ylabel("Negative log posterior (median over chains)")
    fig.savefig(os.path.join(out_dir, "post.pdf"))
    plt.close(fig)

    ci, si = np.unravel_index(np.argmin(pots), pots.shape)
    mode = jax.tree.map(lambda x: jnp.asarray(x[ci, si]), positions)
    lo = np.asarray(data["Y"]).reshape(-1, 2).min(0) - 0.5
    hi = np.asarray(data["Y"]).reshape(-1, 2).max(0) + 0.5
    gx, gy = np.meshgrid(np.linspace(lo[0], hi[0], 15),
                         np.linspace(lo[1], hi[1], 15))
    grid_pts = jnp.asarray(np.stack([gx.ravel(), gy.ravel()], 1))
    field = np.asarray(field_fn(mode, 0.0, grid_pts))
    fig, ax = plt.subplots(figsize=(6, 5))
    ax.quiver(gx, gy, field[:, 0].reshape(gx.shape),
              field[:, 1].reshape(gx.shape), alpha=0.6)
    for traj in np.asarray(data["Y"]):
        ax.plot(traj[:, 0], traj[:, 1], ".", ms=2)
    ax.set_title(f"posterior mode {label} field ({config['method']})")
    fig.savefig(os.path.join(out_dir, "phase_mode.pdf"))
    plt.close(fig)


def _plots_sampler(out_dir, config, data, static, positions, pots):
    """Loss curves, posterior-mode phase plot with quiver of the learned
    field, posterior predictive mean +/- 5 sigma bands, logsn histogram
    (gp.py:383-507)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    # loss curves
    fig, ax = plt.subplots()
    ax.plot(np.median(pots, axis=0))
    ax.set_xlabel("Kept sample")
    ax.set_ylabel("Negative log posterior (median over chains)")
    fig.savefig(os.path.join(out_dir, "post.pdf"))
    plt.close(fig)

    # posterior-mode phase plot with learned-field quiver (gp.py:419-438)
    ci, si = np.unravel_index(np.argmin(pots), pots.shape)
    mode = {"U": jnp.asarray(positions["U"][ci, si]),
            "logsn": jnp.asarray(positions["logsn"][ci, si])}
    lo = np.asarray(data["Y"]).reshape(-1, 2).min(0) - 0.5
    hi = np.asarray(data["Y"]).reshape(-1, 2).max(0) + 0.5
    gx, gy = np.meshgrid(np.linspace(lo[0], hi[0], 15),
                         np.linspace(lo[1], hi[1], 15))
    grid_pts = jnp.asarray(np.stack([gx.ravel(), gy.ravel()], 1))
    field = np.asarray(kr.vector_field(mode, static, 0.0, grid_pts))
    fig, ax = plt.subplots(figsize=(6, 5))
    ax.quiver(gx, gy, field[:, 0].reshape(gx.shape),
              field[:, 1].reshape(gx.shape), alpha=0.6)
    for traj in np.asarray(data["Y"]):
        ax.plot(traj[:, 0], traj[:, 1], ".", ms=2)
    ax.set_title(f"posterior mode field ({config['method']})")
    fig.savefig(os.path.join(out_dir, "phase_mode.pdf"))
    plt.close(fig)

    # posterior predictive bands: re-solve for a subsample of chain draws
    # from fresh random x0 (gp.py:441-501) — vmapped instead of a Python
    # loop over the chain.
    rng = np.random.RandomState(0)
    x0_ = jnp.asarray(2.0 * 1.0 * rng.uniform(size=(3, 2)) - 1.0)
    t_ = jnp.linspace(0.0, 14.0, 80)
    n_draws = min(64, pots.size)
    flat_U = positions["U"].reshape(-1, *positions["U"].shape[2:])
    idx = rng.choice(flat_U.shape[0], n_draws, replace=False)

    def solve_draw(U):
        A = static.KzzinvL @ U
        f = lambda tt, X: kr.vector_field_fast(A, static, tt, X)
        return odeint(f, x0_, t_, method="rk4")           # (T, 3, 2)

    sols = np.asarray(jax.vmap(solve_draw)(jnp.asarray(flat_U[idx])))
    mean, std = sols.mean(0), sols.std(0)
    ode_fn = DYNAMICS[str(data.get("ODE", "vdp")).lower()]
    real = np.asarray(odeint(ode_fn, x0_, t_, method="dopri5"))
    fig, axes = plt.subplots(ncols=3, figsize=(15, 3))
    tn = np.asarray(t_)
    for i in range(3):
        axes[i].plot(tn, real[:, i, 0], "-", color="r", label="Position(real)")
        axes[i].fill_between(tn, mean[:, i, 0] - 5 * std[:, i, 0],
                             mean[:, i, 0] + 5 * std[:, i, 0], alpha=0.3)
        axes[i].plot(tn, mean[:, i, 0], "--", label="Position(mean)")
        axes[i].legend(fontsize=6)
    fig.savefig(os.path.join(out_dir, "predictive_bands.pdf"))
    plt.close(fig)

    # logsn histogram (gp.py:503-507)
    fig, ax = plt.subplots()
    ax.hist(np.asarray(positions["logsn"]).reshape(-1, 2), bins=30,
            label=["logsn_x", "logsn_y"])
    ax.legend()
    fig.savefig(os.path.join(out_dir, "logsn_hist.pdf"))
    plt.close(fig)


def run_optim(config: Dict, data: Dict, output: str,
              make_plots: bool = True) -> Dict[str, Any]:
    """MAP optimization (gp.py:74-287): optimizer zoo via optax + our
    L-BFGS, lr/momentum schedules lr/(1+decay*itr) (gp.py:170-178)."""
    import optax

    out_dir = _out_dir(output, config)
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(config, f, indent=2, default=str)

    static, params0, potential, sq_err = build_model(config, data)
    method = config["method"]
    n_iters = config["num_iters"]

    if "LBFGS" in method:
        x, value, trace, _ = lbfgs_minimize(
            potential, params0, max_iters=n_iters,
            line_search=config.get("line_search", "armijo"),
            history_size=config.get("history_size", 10), lr=config["lr"],
        )
        losses = np.asarray(trace)
    else:
        lr0 = config["lr"]
        decay = config.get("lr_decay", 0.0)
        sched = (lambda step: lr0 / (1 + decay * step)) if decay else lr0
        if method == "Adam":
            tx = optax.adam(sched)
        elif "nag" in method:
            tx = optax.chain(optax.clip_by_global_norm(config.get("clip", 10.0)),
                             optax.sgd(sched, momentum=0.5, nesterov=True))
        elif "SGD" in method:
            tx = optax.chain(optax.clip_by_global_norm(config.get("clip", 10.0)),
                             optax.sgd(sched, momentum=config.get("mom")))
        elif "RMSprop" in method:
            tx = optax.rmsprop(sched, decay=config.get("rmsprop_alpha", 0.99))
        elif "Adadelta" in method:
            tx = optax.adadelta(sched, rho=config.get("adadelta_rho", 0.9))
        else:
            raise ValueError(f"unknown optimizer method {method!r}")

        vg = jax.value_and_grad(potential)

        def step(carry, _):
            params, opt_state = carry
            v, g = vg(params)
            updates, opt_state = tx.update(g, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), v

        (x, _), losses = jax.lax.scan(
            step, (params0, tx.init(params0)), None, length=n_iters
        )
        value = losses[-1]
        losses = np.asarray(losses)

    np.save(os.path.join(out_dir, "total_loss_arr.npy"), losses)
    with RunLogger(os.path.join(out_dir, "run.jsonl")) as logger:
        logger.log({"event": "summary", "method": method,
                    "final_loss": float(value),
                    "best_loss": float(np.min(losses))})
    save_pytree(os.path.join(out_dir, "map_params.npz"),
                jax.tree.map(np.asarray, x))
    if make_plots:
        _plots_optim(out_dir, config, data, static, x, losses)
    return {"final_loss": float(value), "best_loss": float(np.min(losses))}


def _plots_optim(out_dir, config, data, static, params, losses):
    """MAP-run artifacts (gp.py:200-287): loss curves (linear + log),
    phase plot with the learned-field quiver, and fitted-vs-observed
    trajectories."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    for name, yscale in [("post", "linear"), ("post_log", "log")]:
        fig, ax = plt.subplots()
        ax.plot(np.asarray(losses))
        ax.set_xlabel("Iteration")
        ax.set_ylabel("Negative log posterior")
        ax.set_yscale(yscale)
        fig.savefig(os.path.join(out_dir, f"{name}.pdf"))
        plt.close(fig)

    lo = np.asarray(data["Y"]).reshape(-1, 2).min(0) - 0.5
    hi = np.asarray(data["Y"]).reshape(-1, 2).max(0) + 0.5
    gx, gy = np.meshgrid(np.linspace(lo[0], hi[0], 15),
                         np.linspace(lo[1], hi[1], 15))
    grid_pts = jnp.asarray(np.stack([gx.ravel(), gy.ravel()], 1))
    field = np.asarray(kr.vector_field(params, static, 0.0, grid_pts))
    fig, ax = plt.subplots(figsize=(6, 5))
    ax.quiver(gx, gy, field[:, 0].reshape(gx.shape),
              field[:, 1].reshape(gx.shape), alpha=0.6)
    for traj in np.asarray(data["Y"]):
        ax.plot(traj[:, 0], traj[:, 1], ".", ms=2)
    ax.set_title(f"MAP field ({config['method']})")
    fig.savefig(os.path.join(out_dir, "phase_map.pdf"))
    plt.close(fig)

    # fitted trajectories vs observations
    A = kr.precompute_weights(params, static)
    xode = np.asarray(
        odeint(lambda tt, X: kr.vector_field_fast(A, static, tt, X),
               data["x0"], data["t"], method="rk4")
    )
    tn = np.asarray(data["t"])
    fig, axes = plt.subplots(ncols=min(3, xode.shape[1]), figsize=(12, 3))
    axes = np.atleast_1d(axes)
    for i, ax in enumerate(axes):
        ax.plot(tn, np.asarray(data["Y"])[i, :, 0], ".", ms=3,
                label="obs x")
        ax.plot(tn, xode[:, i, 0], "-", label="fit x")
        ax.legend(fontsize=6)
    fig.savefig(os.path.join(out_dir, "trajectories.pdf"))
    plt.close(fig)


def run_vi(config: Dict, data: Dict, output: str,
           make_plots: bool = True) -> Dict[str, Any]:
    """Posterior approximation without MCMC: method "ADVI" (mean-field or
    full-rank Gaussian VI, config "vi_family") or "Laplace" (MAP +
    curvature).  Beyond the reference driver (gp.py routes only optim |
    sampler); artifact layout matches run_sampler so the plotting and
    downstream predictive code work unchanged — `chain.npz` holds
    `num_samples` posterior draws with a singleton sample axis."""
    out_dir = _out_dir(output, config)
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(config, f, indent=2, default=str)

    static, params0, potential, _ = build_model(config, data)
    method = config["method"]
    n_draws = config.get("num_samples", 1000)
    key = jax.random.PRNGKey(config.get("seed", 0))
    # Distinct streams: fit_advi's scan consumes split(key, num_steps),
    # whose element [1] is bit-identical to split(key)[1] — drawing with
    # the latter would replay the step-1 MC ELBO noise (ADVICE r2).
    fit_key, draw_key = jax.random.split(key)

    if method == "ADVI":
        res = samplers.fit_advi(
            fit_key, potential, params0,
            num_steps=config.get("num_iters", 2000),
            sample_size=config.get("elbo_samples", 8),
            family=config.get("vi_family", "meanfield"),
            learning_rate=config.get("lr", 1e-2),
            init_scale=config.get("init_scale", 0.1),
            stl=bool(config.get("stl", False)))
        draws = samplers.sample_advi(res, draw_key, n_draws)
        np.save(os.path.join(out_dir, "elbo_arr.npy"),
                np.asarray(res.elbo_trace))
        save_pytree(os.path.join(out_dir, "variational.npz"),
                    {"mu": np.asarray(res.mu),
                     "scale_tril": np.asarray(res.scale_tril)})
        fit_scalar = {"final_elbo": float(res.final_elbo)}
    elif method == "Laplace":
        res = samplers.laplace_approximation(
            potential, params0, max_iters=config.get("num_iters", 200),
            lr=config.get("lr", 1.0))
        draws = samplers.sample_laplace(res, draw_key, n_draws)
        save_pytree(os.path.join(out_dir, "variational.npz"),
                    {"mu": np.asarray(res.mu),
                     "prec_chol": np.asarray(res.prec_chol)})
        fit_scalar = {"log_evidence": float(res.log_evidence),
                      "potential_at_mode": float(res.potential_at_mode),
                      "hessian_pd": bool(res.hessian_pd)}
    else:
        raise ValueError(f"unknown vi method {method!r}; "
                         "expected 'ADVI' or 'Laplace'")

    # draws-as-chains: (n_draws, ...) -> (chains=n_draws, samples=1, ...)
    positions = jax.tree.map(lambda x: np.asarray(x)[:, None], draws)
    pots = np.asarray(jax.vmap(potential)(draws))[:, None]
    with RunLogger(os.path.join(out_dir, "run.jsonl")) as logger:
        summary = {"event": "summary", "method": method,
                   "num_draws": n_draws,
                   "min_potential": float(pots.min()),
                   "median_potential": float(np.median(pots)),
                   **fit_scalar}
        logger.log(summary)
    save_pytree(os.path.join(out_dir, "chain.npz"), positions)
    np.save(os.path.join(out_dir, "total_loss_arr.npy"), pots)
    if make_plots:
        if static is None:
            _plots_sampler_nn(out_dir, config, data, positions, pots)
        else:
            _plots_sampler(out_dir, config, data, static, positions, pots)
    return summary


def run_evidence(config: Dict, data: Dict, output: str,
                 make_plots: bool = True) -> Dict[str, Any]:
    """Bayesian model comparison on the GP-ODE posterior: marginal
    likelihood by THREE independent estimators + predictive scores.

    This is the principled replacement for the reference's M-grid sweep
    (gen_configs.py:65-70 fans M in {4,5,6} over an 81-config SLURM array
    and gp.py:529-564 leaves the comparison to eyeballing run dirs): one
    `inf_type: "evidence"` config per M returns absolute log Z numbers
    that rank the grids directly.

    Estimators (all on the SAME normalized log-lik/log-prior split,
    models/kernel_regression.make_log_density_parts):
      - TI + stepping-stone over a power-posterior ladder
        (samplers.log_evidence; per-rung MALA, warmup step adaptation)
        with per-chain-spread standard errors;
      - adaptive tempered SMC (samplers.smc) — independent machinery,
        independent failure modes; `smc_repeats` replicates give its SE;
      - Laplace (samplers.laplace_approximation) — deterministic,
        Gaussian-approximation bias, the cheap cross-check.
    Predictive: WAIC + PSIS-LOO (samplers.waic / psis_loo) from the SMC
    posterior particles' pointwise log-liks (N*T deletion points).

    Artifacts: evidence.json (all estimates + SEs + diagnostics),
    config.json, run.jsonl summary — standard {output}/{method}/{id}
    layout.
    """
    out_dir = _out_dir(output, config)
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(config, f, indent=2, default=str)

    solve, _ = _make_solve(config)
    # evidence estimation consumes ABSOLUTE log-densities (log Z, Hessian
    # log-dets, pointwise log-liks) — TPU's default bf16 matmul passes
    # put O(10)-nat noise on a ~1000-nat GP-ODE potential and make the
    # Laplace Hessian read non-PD at the true mode (observed 2026-08-21,
    # v5e), so the evidence path always runs HIGHEST-precision RHS
    # matmuls, fixed-grid solvers included (SG-MCMC keeps the fast
    # default: its step noise dwarfs bf16 noise)
    prec = jax.lax.Precision.HIGHEST
    Z = kr.make_inducing_grid(data["Y"], M=config["M"])
    static = kr.make_static(Z, sf=config["sf"], ell=config["ell"])
    noise0 = float(config.get("noise", data["noise"]))
    params0 = kr.init_params(data["Y"], data["t"], static, noise=noise0)
    parts = kr.make_log_density_parts(
        static, data["x0"], data["t"], data["Y"], solve, precision=prec,
        logsn_mu=config.get("logsn_mu"),
        logsn_sd=config.get("logsn_sd", 1.0), noise=noise0)

    log_lik_b = jax.vmap(parts.log_lik)
    log_prior_b = jax.vmap(parts.log_prior)

    seed = config.get("seed", 0)
    key = jax.random.PRNGKey(seed)
    k_init, k_ladder, k_smc, k_draws = jax.random.split(key, 4)

    # --- TI + stepping stone over the power ladder ---
    C = config.get("num_chains", 32)
    jitter = config.get("jitter", 0.05)
    pos0 = jax.tree.map(
        lambda x: jnp.asarray(x)[None] + jitter * jax.random.normal(
            k_init, (C,) + jnp.shape(x), jnp.asarray(x).dtype), params0)
    res = samplers.log_evidence(
        k_ladder, log_lik_b, log_prior_b, pos0,
        num_rungs=config.get("num_rungs", 16),
        step_size=config.get("lr", 1e-3),
        num_warmup=config.get("burn_in", 500),
        num_samples=config.get("num_samples", 1000),
        thin=config.get("thinning", 1),
        adapt_step=True)
    res = jax.block_until_ready(res)

    # --- adaptive tempered SMC (independent estimator + posterior draws)
    n_particles = config.get("smc_particles", 1024)
    n_repeats = config.get("smc_repeats", 2)
    smc_logz, smc_res = [], None
    for r in range(n_repeats):
        particles0 = parts.sample_prior(jax.random.fold_in(k_draws, r),
                                        n_particles)
        smc_res = jax.block_until_ready(samplers.smc(
            jax.random.fold_in(k_smc, r), log_lik_b, log_prior_b,
            particles0,
            num_moves=config.get("smc_moves", 5),
            target_ess=config.get("smc_target_ess", 0.5),
            max_stages=config.get("smc_max_stages", 100)))
        smc_logz.append(float(smc_res.log_z))
    smc_mean = float(np.mean(smc_logz))
    smc_se = (float(np.std(smc_logz, ddof=1) / np.sqrt(n_repeats))
              if n_repeats > 1 else float("nan"))

    # --- generalized stepping stone (Fan et al. 2011): bridge from a
    # Gaussian reference FITTED TO THE SMC PARTICLES instead of the
    # prior — every rung then lives in the data-fit regime, avoiding the
    # prior-bridged ladder's hot-rung equilibration bias (its estimate
    # moved +292 nats from a quick to a full budget on this posterior,
    # 2026-08-21), and the reference is normalized so log Z is absolute
    gss = jax.block_until_ready(samplers.log_evidence_gss(
        jax.random.fold_in(k_ladder, 99), log_lik_b, log_prior_b,
        smc_res.particles, num_chains=C,
        num_rungs=config.get("num_rungs", 16),
        step_size=config.get("lr", 1e-3),
        num_warmup=config.get("burn_in", 500),
        num_samples=config.get("num_samples", 1000),
        thin=config.get("thinning", 1), adapt_step=True))

    # --- Laplace (deterministic cross-check) — on CPU in float64: the
    # Hessian log-det consumes eigenvalues far below f32 resolution of a
    # ~1000-nat GP-ODE potential (the chip reads the true mode's Hessian
    # as non-PD even with HIGHEST-precision matmuls, 2026-08-21), and
    # the estimator is a few hundred solves, so f64 CPU is cheap
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu), jax.enable_x64(True):
        d64 = {k: (np.asarray(v, np.float64)
                   if hasattr(v, "dtype") or isinstance(v, (list, tuple))
                   else v)
               for k, v in data.items()}
        Z64 = kr.make_inducing_grid(d64["Y"], M=config["M"])
        static64 = kr.make_static(Z64, sf=config["sf"], ell=config["ell"])
        parts64 = kr.make_log_density_parts(
            static64, d64["x0"], d64["t"], d64["Y"], solve,
            precision=prec, logsn_mu=config.get("logsn_mu"),
            logsn_sd=config.get("logsn_sd", 1.0), noise=noise0)
        # MAP warm start = the best SMC particle: the gradient-matching
        # init sits behind exploding-trajectory cliffs on some datasets
        # (L-BFGS stalls there even with non-finite-step rejection,
        # 2026-08-21), while a posterior-typical particle starts in the
        # same basin SMC integrates over — which is also the mode the
        # Laplace cross-check SHOULD expand around
        best = int(jnp.argmax(
            smc_res.log_lik + jax.vmap(parts.log_prior)(smc_res.particles)))
        init64 = jax.tree.map(
            lambda l: np.asarray(l[best], np.float64), smc_res.particles)
        lap = samplers.laplace_approximation(
            parts64.potential, init64,
            max_iters=config.get("laplace_iters", 200),
            lr=config.get("laplace_lr", 1.0))
        lap = jax.tree.map(np.asarray, jax.device_get(lap))

    # --- predictive scores from the last SMC run's posterior particles
    ll_matrix = jax.vmap(parts.pointwise_log_lik)(smc_res.particles)
    w = samplers.waic(ll_matrix)
    loo = samplers.psis_loo(ll_matrix)

    summary = {
        "event": "summary", "method": config["method"], "M": config["M"],
        "log_z_ti": float(res.log_z_ti), "ti_se": float(res.ti_se),
        "log_z_ss": float(res.log_z_ss), "ss_se": float(res.ss_se),
        "log_z_gss": float(gss.log_z_ss), "gss_se": float(gss.ss_se),
        "log_z_smc": smc_mean, "smc_se": smc_se,
        "log_z_laplace": float(lap.log_evidence),
        "laplace_hessian_pd": bool(lap.hessian_pd),
        "waic_elpd": float(w.elpd), "waic_se": float(w.se),
        "waic_p_eff": float(w.p_eff),
        "loo_elpd": float(loo.elpd), "loo_se": float(loo.se),
        "loo_max_khat": float(jnp.max(loo.pareto_k)),
    }
    # machine-visible per-estimator reliability (VERDICT r4 #6): rank
    # models by summary["rank_by"], never by TI (diagnostic-only on ODE
    # posteriors) or a budget-sensitive SS
    rel = samplers.evidence_reliability(
        log_z_ti=summary["log_z_ti"], log_z_ss=summary["log_z_ss"],
        ss_se=summary["ss_se"], log_z_gss=summary["log_z_gss"],
        gss_se=summary["gss_se"], log_z_smc=smc_mean, smc_se=smc_se,
        log_z_laplace=summary["log_z_laplace"],
        laplace_hessian_pd=bool(lap.hessian_pd),
        waic_elpd=summary["waic_elpd"],
        ladder_nonfinite=int(res.num_nonfinite),
        gss_nonfinite=int(gss.num_nonfinite))
    summary["estimator_reliability"] = rel["estimators"]
    summary["rank_by"] = rel["rank_by"]
    detail = dict(summary)
    detail.update({
        "smc_log_z_repeats": smc_logz,
        "smc_num_stages": int(smc_res.num_stages),
        "ladder_nonfinite_draws": int(res.num_nonfinite),
        "gss_nonfinite_draws": int(gss.num_nonfinite),
        "gss_accept": np.asarray(gss.accept_rate).tolist(),
        "ladder_betas": np.asarray(res.betas).tolist(),
        "ladder_accept": np.asarray(res.accept_rate).tolist(),
        "ladder_steps": np.asarray(res.step_sizes).tolist(),
        "mean_log_lik": np.asarray(res.mean_log_lik).tolist(),
    })
    with open(os.path.join(out_dir, "evidence.json"), "w") as f:
        json.dump(detail, f, indent=2, default=str)
    with RunLogger(os.path.join(out_dir, "run.jsonl")) as logger:
        logger.log(summary)
    save_pytree(os.path.join(out_dir, "chain.npz"),
                jax.tree.map(lambda x: np.asarray(x)[:, None],
                             smc_res.particles))
    return summary


def worker(config: Dict, data: Dict, output: str,
           make_plots: bool = True) -> Dict[str, Any]:
    """Route by inf_type (gp.py:510-527; "vi"/"evidence" are beyond the
    reference)."""
    if config.get("inf_type") == "optim":
        return run_optim(config, data, output, make_plots=make_plots)
    if config.get("inf_type") == "vi":
        return run_vi(config, data, output, make_plots=make_plots)
    if config.get("inf_type") == "evidence":
        return run_evidence(config, data, output, make_plots=make_plots)
    return run_sampler(config, data, output, make_plots=make_plots)
