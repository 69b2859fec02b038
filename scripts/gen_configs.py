"""Generate the Van der Pol GP hyperparameter grid (reference
scripts/vanderpol/gen_configs.py): one JSON per combination under
--json-dir, keyed by integer id for launch_grid.sh / --id selection.

  python scripts/gen_configs.py --json-dir cfgs --output runs
"""
from __future__ import annotations

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bayesian_ode_tpu.experiments import expand_grid, write_configs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json-dir", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--ode", default="vdp", choices=["vdp", "fhn", "lv"])
    ap.add_argument(
        "--condor", metavar="FILE", default=None,
        help="also write an HTCondor submit file queueing one job per "
             "config (reference scripts/toy/gen_configs.py "
             "CLUSTER_SCRIPT_TEMPLATE)")
    args = ap.parse_args()

    # The reference's active grids (gen_configs.py:65-70 shapes: M in
    # {4,5,6}, per-method lr sweeps) extended to the full sampler suite.
    configs = []
    configs += expand_grid(
        "SGLD", {"M": [4, 5, 6], "lr0": [1e-5, 5e-5, 1e-4]},
        defaults={"burn_in": 1000, "num_samples": 2000, "thinning": 50},
    )
    configs += expand_grid(
        "MALA", {"M": [5, 6], "lr": [1e-5, 5e-5]},
        defaults={"burn_in": 1000, "num_samples": 2000, "thinning": 50},
    )
    configs += expand_grid(
        "pSGLD", {"M": [6], "lr0": [1e-4, 1e-3], "psgld_alpha": [0.99]},
        defaults={"burn_in": 1000, "num_samples": 2000, "thinning": 50},
    )
    configs += expand_grid(
        "aSGHMC", {"M": [6], "lr": [1e-3, 1e-2]},
        defaults={"burn_in": 1000, "num_samples": 2000, "thinning": 50},
    )
    # fused-engine configs: the bias-validated bench operating points
    # (CLAUDE.md protocol) on the Pallas trajectory kernels
    configs += expand_grid(
        "pSGLD", {"M": [6], "lr0": [2e-3]},
        defaults={"burn_in": 1000, "num_samples": 2000, "thinning": 50,
                  "engine": "fused", "num_chains": 1024, "lr_gamma": 0.0},
    )
    configs += expand_grid(
        "aSGHMC", {"M": [6], "lr": [8e-3]},
        defaults={"burn_in": 1000, "num_samples": 2000, "thinning": 50,
                  "engine": "fused", "num_chains": 1024},
    )
    # the BASELINE north star: pSGLD at dopri5 rtol=1e-7, fused
    # whole-solve fwd+bwd (ops/gp_dopri5_grad.py)
    configs += expand_grid(
        "pSGLD", {"M": [6], "lr0": [2e-3]},
        defaults={"burn_in": 1000, "num_samples": 2000, "thinning": 50,
                  "engine": "fused", "solver": "dopri5", "rtol": 1e-7,
                  "atol": 1e-9, "num_chains": 1024, "lr_gamma": 0.0},
    )
    # NN mean-function baseline at adaptive dopri5 tolerance, fused
    # end to end (ops/mlp_dopri5.py; previously generic-engine only)
    configs += expand_grid(
        "pSGLD", {"lr0": [1e-4]},
        defaults={"burn_in": 1000, "num_samples": 2000, "thinning": 50,
                  "model": "nn", "hidden": 8, "engine": "fused",
                  "solver": "dopri5", "rtol": 1e-7, "atol": 1e-9,
                  "num_chains": 1024, "lr_gamma": 0.0},
    )
    configs += expand_grid(
        "Adadelta", {"M": [6], "lr": [1e-1, 1.0]}, inf_type="optim",
        defaults={"num_iters": 2000},
    )
    configs += expand_grid(
        "LBFGS", {"M": [6], "lr": [1.0], "history_size": [10],
                  "line_search": ["armijo"]}, inf_type="optim",
        defaults={"num_iters": 500},
    )

    n = write_configs(
        configs, args.json_dir, args.output,
        data={"ode": args.ode, "N": 5, "T": 60, "t_max": 6.0, "noise": 0.05,
              "seed": 0},
    )
    print(f"wrote {n} configs to {args.json_dir}")

    if args.condor:
        import os

        os.makedirs(os.path.join(args.json_dir, "condor"), exist_ok=True)
        with open(args.condor, "w") as fh:
            fh.write(_CONDOR_TEMPLATE.format(json_dir=args.json_dir, n=n))
        print(f"wrote condor submit file {args.condor} ({n} jobs)")


# HTCondor submit description, one job per config id (1-based; condor's
# ProcId is 0-based).  Mirrors scripts/launch_grid.sub; the reference's
# analogue is the CLUSTER_SCRIPT_TEMPLATE generator in
# scripts/toy/gen_configs.py:46-55.
_CONDOR_TEMPLATE = """\
universe   = vanilla
executable = /usr/bin/env
arguments  = python -m bayesian_ode_tpu.experiments.run \
--json-dir {json_dir} --id $$([ProcId + 1])
getenv     = true
error      = {json_dir}/condor/$(Cluster).$(Process).err
output     = {json_dir}/condor/$(Cluster).$(Process).out
log        = {json_dir}/condor/$(Cluster).log
request_memory = 4GB
request_cpus   = 1
queue {n}
"""


if __name__ == "__main__":
    main()
