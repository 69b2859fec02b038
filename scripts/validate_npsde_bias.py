#!/usr/bin/env python
"""Bias-validate the NPSDE bench operating point (VERDICT r3 #3).

The npsde bench phase (bench.py npsde_psgld_effective_samples) runs
constant-lr pSGLD on the EM-transition-likelihood SDE posterior.  The
lr=2e-3 operating point was bias-validated on the *ODE* posterior
(CLAUDE.md round-1 protocol); this script reruns the full protocol on
the SDE posterior itself:

  1. constant-lr pSGLD at a small-step ladder (5e-4, 1e-3, 2e-3, 4e-3):
     stationary logsd moments after a long run — the small steps agree
     on the small-step limit, the ladder shows where drift starts;
  2. EXACT preconditioned MALA (samplers.mala_batched with the frozen
     warmup-pSGLD metric, MH-corrected — zero step-size bias) as the
     ground-truth cross-check of the limit.

Verdict: the bench lr is valid iff its moments sit within ~1 sigma
(sigma = posterior std of the logsd marginal — the same yardstick the
ODE-posterior protocol used) of the exact-MALA limit.

Run on the chip:  PYTHONPATH=/root/repo:$PYTHONPATH python \
    scripts/validate_npsde_bias.py [--steps 12000] [--chains 2048]
Results are recorded in CLAUDE.md / bench.py comments (dated).
"""
from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from bayesian_ode_tpu import samplers, sde
from bayesian_ode_tpu.models import dynamics
from bayesian_ode_tpu.models import kernel_regression as kr
from bayesian_ode_tpu.models import make_dataset
from bayesian_ode_tpu.utils import enable_persistent_cache


def build_sde_posterior(n_chains, sigma=0.1):
    """Exactly the bench npsde phase's posterior + init (bench.py
    npsde_psgld_effective_samples)."""
    f32 = jnp.float32
    data = make_dataset(jax.random.PRNGKey(2), "vdp", N=5, T=60, t_max=6.0,
                        noise=0.05, x0_scale=1.5)
    Z = kr.make_inducing_grid(data["Y"], M=6)
    static = kr.make_static(Z, sf=1.0, ell=0.75)
    params0 = kr.init_params(data["Y"], data["t"], static, noise=0.05)

    ts = np.linspace(0.0, 6.0, 60)
    y0 = 1.5 * jax.random.normal(jax.random.PRNGKey(3), (5, 2))
    ys = sde.sdeint(dynamics.vdp, lambda t, y: jnp.full_like(y, sigma),
                    y0, ts, jax.random.PRNGKey(4), options={"substeps": 10})
    Y = jnp.moveaxis(ys, 0, 1).astype(f32)

    C = ((n_chains + 127) // 128) * 128
    static32 = static._replace(
        Z=static.Z.astype(f32), KzzinvL=static.KzzinvL.astype(f32),
        Kzzinv=static.Kzzinv.astype(f32),
    )
    pot = sde.make_gp_sde_potential_batched(static32, ts.astype(np.float32),
                                            Y)
    pos0 = {
        "U": params0["U"].astype(f32)[None] + 0.005 * jax.random.normal(
            jax.random.PRNGKey(1), (C, 36, 2), f32),
        "logsd": jnp.full((C, 2), np.log(sigma), f32)
        + 0.005 * jax.random.normal(jax.random.PRNGKey(2), (C, 2), f32),
    }
    return pot, pos0, C


def moments(positions):
    """Stationary logsd marginals over (samples, C, 2) kept positions."""
    x = positions["logsd"].reshape(-1, 2)
    return (np.asarray(jnp.mean(x, axis=0)), np.asarray(jnp.std(x, axis=0)),
            np.asarray(jnp.mean(positions["U"] ** 2) ** 0.5))


def run_kernel(kernel, pos0, steps, kept, seed=0, thin=1):
    state = kernel.init(pos0)
    run = jax.jit(lambda s, k: samplers.sample_chain(
        kernel, s, k, num_samples=kept, burn_in=steps - kept * thin,
        thin=thin))
    t0 = time.perf_counter()
    _, positions, infos = jax.block_until_ready(
        run(state, jax.random.PRNGKey(seed)))
    return positions, infos, time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12000)
    ap.add_argument("--chains", type=int, default=2048)
    ap.add_argument("--kept", type=int, default=2000)
    ap.add_argument("--mala-steps", type=int, default=24000)
    ap.add_argument("--mala-lr", type=float, default=3e-4)
    args = ap.parse_args()
    enable_persistent_cache()

    pot, pos0, C = build_sde_posterior(args.chains)
    print(f"# chains {C}, device {jax.devices()[0]}", file=sys.stderr)

    rows = []
    for lr in (5e-4, 1e-3, 2e-3, 4e-3):
        kernel = samplers.psgld_batched(pot, lr)
        positions, _, dt = run_kernel(kernel, pos0, args.steps, args.kept)
        mean, std, urms = moments(positions)
        rows.append(("psgld", lr, mean, std, urms, dt))
        print(f"psgld lr={lr:g}: logsd mean ({mean[0]:+.4f}, {mean[1]:+.4f})"
              f" std ({std[0]:.4f}, {std[1]:.4f}) Urms {urms:.4f}"
              f"  [{dt:.0f}s]")

    # exact cross-check: warmup pSGLD freezes the metric, then
    # MH-corrected preconditioned MALA samples the posterior exactly
    warm_kernel = samplers.psgld_batched(pot, 1e-3)
    warm_state = warm_kernel.init(pos0)
    warm = jax.jit(lambda s, k: samplers.sample_chain(
        warm_kernel, s, k, num_samples=1, burn_in=3999)[0])
    warm_state = jax.block_until_ready(
        warm(warm_state, jax.random.PRNGKey(7)))
    G = samplers.psgld_preconditioner(warm_state)
    kernel = samplers.mala_batched(pot, args.mala_lr, precond=G)
    pos_w = warm_state.position
    positions, infos, dt = run_kernel(kernel, pos_w, args.mala_steps,
                                      args.kept, seed=11, thin=4)
    mean, std, urms = moments(positions)
    acc = float(jnp.mean(infos["accepted"].astype(jnp.float32)))
    print(f"exact mala lr={args.mala_lr:g} (acc {acc:.2f}): logsd mean "
          f"({mean[0]:+.4f}, {mean[1]:+.4f}) std ({std[0]:.4f}, "
          f"{std[1]:.4f}) Urms {urms:.4f}  [{dt:.0f}s]")

    # verdict: bench operating point vs exact limit, in posterior-std units
    bench_lr = 2e-3
    ref_mean, ref_std = mean, std
    for name, lr, m, s, _, _ in rows:
        drift = np.abs(m - ref_mean) / ref_std
        flag = "OK " if np.all(drift < 1.0) else "DRIFT"
        star = " <- bench operating point" if lr == bench_lr else ""
        print(f"{flag} {name} lr={lr:g}: drift ({drift[0]:.2f}, "
              f"{drift[1]:.2f}) sigma{star}")


if __name__ == "__main__":
    main()
